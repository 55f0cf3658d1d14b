"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (TPC-H-Q1-shaped pricing summary) on
  /root/testdata/sf0.001.
- ``queries()`` — every implemented operator/query from SURVEY.md §2 (and the
  beyond-reference LLM-data operators), keyed by name.
- ``oracle_sql()`` — DuckDB-equivalent SQL for each query (same column names;
  aggregates aliased identically on both sides).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pipelinewise_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full training-data curation pipeline (gopher filter →
    PII scrub → exact dedup → token-budget shards) as one declarative plan
    on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["curation_pipeline_documents"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each entry in ``queries()``."""
    return dict(ORACLES)
