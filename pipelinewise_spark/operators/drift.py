"""Snapshot drift detection — column-level statistical deltas between two
table versions, the data-quality gate a production pipeline runs after
every load ("did this batch silently shift the distribution?").

One aggregation pass per snapshot (partial-aggregated, no shuffle beyond
the single agg), producing a per-column stats row; the diff is a tiny
driver-side-width join. Sums are decimal-exact so the drift numbers are
engine-portable (the DuckDB oracle reproduces them bit-for-bit after
rounding). Flags are explicit predicates, not heuristics: null-rate delta
and relative mean shift against caller thresholds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-form per-column stats: (column, n_rows, n_nulls, mean, min,
    max). One aggregation; the long form comes from a literal explode of
    the per-column structs, so adding columns never changes the plan
    shape."""
    aggs = []
    for c in cols:
        v = F.col(c).cast("decimal(28,6)")
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                    "n_nulls"
                ),
                F.sum(v).alias("sum"),
                F.min(F.col(c).cast("double")).alias("min"),
                F.max(F.col(c).cast("double")).alias("max"),
            ).alias(c)
        )
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(F.array(*[F.col(c) for c in cols])).alias("s")
    )
    return stacked.select(
        F.col("s.column").alias("column"),
        F.col("s.n_rows").alias("n_rows"),
        F.col("s.n_nulls").alias("n_nulls"),
        (F.col("s.sum") / (F.col("s.n_rows") - F.col("s.n_nulls"))).alias(
            "mean"
        ),
        F.col("s.min").alias("min"),
        F.col("s.max").alias("max"),
    )


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    cols: Sequence[str],
    mean_shift_threshold: float = 0.01,
    null_rate_threshold: float = 0.01,
) -> DataFrame:
    """Per-column drift report between two snapshots: old/new mean, the
    relative mean shift, old/new null rates, and a ``drifted`` flag when
    either the relative mean shift or the null-rate delta exceeds its
    threshold."""
    o = column_stats(old, cols).select(
        "column",
        F.col("mean").alias("old_mean"),
        (F.col("n_nulls") / F.col("n_rows")).alias("old_null_rate"),
    )
    n = column_stats(new, cols).select(
        "column",
        F.col("mean").alias("new_mean"),
        (F.col("n_nulls") / F.col("n_rows")).alias("new_null_rate"),
    )
    j = o.join(n, "column")
    rel_shift = F.abs(F.col("new_mean") - F.col("old_mean")) / F.abs(
        F.col("old_mean")
    )
    null_delta = F.abs(F.col("new_null_rate") - F.col("old_null_rate"))
    return j.select(
        "column",
        F.round(F.col("old_mean"), 6).cast("double").alias("old_mean"),
        F.round(F.col("new_mean"), 6).cast("double").alias("new_mean"),
        F.round(rel_shift, 6).cast("double").alias("mean_shift"),
        F.round(F.col("old_null_rate"), 6).cast("double").alias("old_null_rate"),
        F.round(F.col("new_null_rate"), 6).cast("double").alias("new_null_rate"),
        (
            (rel_shift > mean_shift_threshold)
            | (null_delta > null_rate_threshold)
        ).alias("drifted"),
    )
