"""Table profiling — per-column data-quality statistics in one pass.

The pipeline-ops counterpart of the reference's row/size counters
(/root/reference/pipelinewise/utils.py:27-59, used for the autoresync size
guard): null rate, distinct count, min/max per column, computed as a single
aggregation (one scan, partial aggregation map-side) and unpivoted to one
row per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) — values
    stringified so heterogeneous columns stack into one frame."""
    cols = columns or df.columns
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__nn_{c}").cast("bigint").alias("n_nulls"),
                        F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                        F.col(f"__mn_{c}").alias("min_value"),
                        F.col(f"__mx_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")
