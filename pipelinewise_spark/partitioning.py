"""Partitioning utilities — keep compute-heavy map stages parallel.

Small parquet inputs (one file = one split) would otherwise run an entire
shingle/hash/vector pipeline on a single core before the first shuffle. At
100 TB inputs arrive in thousands of splits and ``spread`` is a no-op; the
conditional matters so we never add a gratuitous shuffle on big inputs.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


def local_frame(
    spark: SparkSession, rows: Iterable, schema
) -> DataFrame:
    """Metadata-scale driver rows → a ONE-partition DataFrame.

    ``spark.createDataFrame(list, schema)`` parallelizes the list into
    ``defaultParallelism`` slices (32 on local[32]; cluster-core-count on
    a real deployment), so every downstream stage over a KB-sized frame
    schedules a full width of near-empty tasks. The list path is
    ``sc.parallelize`` under the hood, so pinning ``numSlices=1`` keeps
    rows, types and nullability verification identical while cutting the
    stage to one task. Use ONLY for answer/metadata-scale rows (bucket
    bounds, centroids, report rows, per-partition offsets) — corpus-scale
    frames must keep their natural parallelism."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(list(rows), 1), schema
    )


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
