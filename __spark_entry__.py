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

from pipelinewise_spark.caching import release_caches  # noqa: E402
from pipelinewise_spark.queries import ORACLES, QUERIES  # noqa: E402


_warned_conf_keys: set[str] = set()


def _warn_conf_skip(key: str, exc: Exception) -> None:
    """Log (once per key) when an optimization setting cannot be applied —
    the queries still run correctly, just without that optimization."""
    if key not in _warned_conf_keys:
        _warned_conf_keys.add(key)
        print(
            f"[__spark_entry__] skipped optional conf {key}: "
            f"{type(exc).__name__}: {exc}",
            file=sys.stderr,
        )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full training-data curation pipeline (gopher filter →
    PII scrub → exact dedup → token-budget shards) as one declarative plan
    on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["curation_pipeline_documents"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable first releases the PREVIOUS query's operator-registered
    caches (see pipelinewise_spark/caching.py): the driver runs many
    queries in one session, and without the sweep persisted intermediates
    (LSH shingle sets etc.) accumulate in executor storage across the run.
    The sweep happens before plan construction, so it never unpersists the
    frames the current query is about to register.
    """

    def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_caches(spark)
            # The driver runs these under a VANILLA session. Spark 4.1's
            # checkpoint-file checksums leak their file-manager threads
            # after every bounded stream run (session.py documents the
            # measurement); disable before any streaming fixture starts
            # so a 50-query sweep doesn't accumulate hundreds of dead
            # threads. Runtime-settable SQL conf; harmless when unused.
            try:
                spark.conf.set(
                    "spark.sql.streaming.checkpoint.fileChecksum.enabled",
                    "false",
                )
            except Exception:
                pass  # older Spark without the conf
            # Same-session equivalents of session.py's write/AQE
            # optimization defaults (r13): size-first AQE coalescing so
            # KB-scale shuffles stop scheduling core-count empty tasks,
            # and the v2 output committer (single rename per task; the
            # engine's snapshot dirs are published atomically by their
            # own pointer/manifest write, so v1's double rename and the
            # _SUCCESS marker buy nothing). All three are runtime- or
            # hadoopConf-settable, value-neutral, and scale-adaptive
            # (advisory size caps partition bytes; production raises it
            # via SPARK_GRAFT_ADVISORY_MB).
            # Each setting gets its own narrow guard so one unsupported
            # key can't silently skip the rest (ADVICE r13); a skipped
            # setting is logged once per process.
            sql_confs = {
                "spark.sql.adaptive.coalescePartitions."
                "parallelismFirst": "false",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": (
                    os.environ.get("SPARK_GRAFT_ADVISORY_MB", "8") + "m"
                ),
            }
            for key, val in sql_confs.items():
                try:
                    spark.conf.set(key, val)
                except Exception as exc:
                    _warn_conf_skip(key, exc)
            try:
                hc = spark.sparkContext._jsc.hadoopConfiguration()
            except Exception as exc:
                _warn_conf_skip("hadoopConfiguration", exc)
            else:
                for key, val in (
                    ("mapreduce.fileoutputcommitter.algorithm.version", "2"),
                    (
                        "mapreduce.fileoutputcommitter.marksuccessfuljobs",
                        "false",
                    ),
                ):
                    try:
                        hc.set(key, val)
                    except Exception as exc:
                        _warn_conf_skip(key, exc)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each entry in ``queries()``."""
    return dict(ORACLES)
