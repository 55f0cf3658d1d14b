"""Sketch-based approximate statistics — profiling 100 TB without exact cost.

Exact distinct counts and quantiles need full shuffles of the value space;
at scale the standard answer is mergeable sketches: HyperLogLog++ for
distinct counts and KLL/GK for quantiles, both built into Spark as
``approx_count_distinct`` / ``percentile_approx`` (partial-aggregate,
map-side mergeable, bounded memory). Error is configurable (rsd / accuracy);
tests bound observed error against exact values at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_stats(
    df: DataFrame,
    numeric_cols: list[str],
    distinct_cols: list[str],
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    rsd: float = 0.02,
    accuracy: int = 10_000,
) -> DataFrame:
    """One-pass approximate profile: HLL distinct counts + approximate
    quantiles, single aggregation node."""
    aggs = []
    for c in distinct_cols:
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd=rsd).alias(f"{c}__approx_distinct")
        )
    for c in numeric_cols:
        aggs.append(
            F.percentile_approx(
                F.col(c), list(quantiles), accuracy
            ).alias(f"{c}__quantiles")
        )
    return df.agg(*aggs)
