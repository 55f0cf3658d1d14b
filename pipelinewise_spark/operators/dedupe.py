"""In-batch primary-key deduplication (last record per PK wins).

Reference semantics: the target buffers records in a dict keyed by the PK
string, so the *last arriving* record per PK within a batch is loaded
(/root/reference/singer-connectors/target-snowflake/target_snowflake/__init__.py:160-176;
PK string db_sync.py:383-399). Arrival order is only meaningful given a
monotonic sequence; in a distributed shuffle we make it explicit with a
``seq_col`` (source offset / LSN / file row position). Spark shape: one
``row_number()`` window over the PK — a single hash-partition shuffle on the
PK, no driver involvement, scales linearly with data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RN = "__pws_rn"


def last_wins_dedupe(
    df: DataFrame, primary_keys: Sequence[str], seq_col: str
) -> DataFrame:
    """Keep the highest-``seq_col`` row per PK (deterministic last-wins)."""
    if not primary_keys:
        return df
    w = Window.partitionBy(*primary_keys).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )
