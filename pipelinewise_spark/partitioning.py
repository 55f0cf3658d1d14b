"""Partitioning utilities — keep compute-heavy map stages parallel.

Small parquet inputs (one file = one split) would otherwise run an entire
shingle/hash/vector pipeline on a single core before the first shuffle. At
100 TB inputs arrive in thousands of splits and ``spread`` is a no-op; the
conditional matters so we never add a gratuitous shuffle on big inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition up to ``cores × factor`` if the plan has fewer input
    partitions; identity otherwise (results are row-order independent)."""
    sc = df.sparkSession.sparkContext
    target = max(sc.defaultParallelism * factor, 1)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df.repartition(target)
    return df.repartition(target) if current < target else df
