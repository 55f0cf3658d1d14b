"""Out-of-range timestamp clamping.

Reference: dates/times beyond the warehouse max are clamped to
``9999-12-31 23:59:59.999999`` (time part: ``23:59:59.999999``) —
target_snowflake/stream_utils.py:16-19, 38-90; CDC path
logical_replication.py:24-25, 221-298. Pure ``when`` expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_TIMESTAMP = "9999-12-31 23:59:59.999999"
MAX_TIME = "23:59:59.999999"


def clamp_timestamp(col: Column, max_value: str = MAX_TIMESTAMP) -> Column:
    mx = F.lit(max_value).cast("timestamp")
    c = col.cast("timestamp")
    return F.when(c > mx, mx).otherwise(c)


def clamp_timestamps(
    df: DataFrame, columns: list[str], max_value: str = MAX_TIMESTAMP
) -> DataFrame:
    for c in columns:
        df = df.withColumn(c, clamp_timestamp(F.col(c), max_value))
    return df
