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


def frequent_items(
    df: DataFrame,
    col: str,
    min_fraction: float,
) -> DataFrame:
    """EXACT frequent items (value, n) for every value with frequency >=
    ``min_fraction`` of all rows — without ever shuffling the long tail.

    Direct ``groupBy(col)`` shuffles the full value space (at 100 TB, the
    token vocabulary of a web corpus). The distributed heavy-hitter shape
    instead:

    1. LOCAL candidate pass: per input partition, count values in-memory
       (Arrow batch) and emit only those meeting the threshold *locally*.
       Pigeonhole guarantee: a value with global count >= f*N must reach
       count >= f*N_p in at least one partition (if it missed the local bar
       everywhere, its global count would be < f * sum(N_p) = f*N), so the
       candidate set provably contains every true heavy hitter — this pass
       has NO false-negative risk, only false positives.
    2. EXACT verify pass: broadcast the (tiny) candidate set, semi-join it
       against the data, and count candidates exactly — the only groupBy
       keys that shuffle are the candidates themselves.

    Two narrow scans, shuffles proportional to the answer, exact result.
    """
    spark = df.sparkSession

    def _local_candidates(batches):
        import pandas as pd

        counts: dict = {}
        total = 0
        for pdf in batches:
            total += len(pdf)
            for v, c in pdf[col].value_counts(dropna=True).items():
                counts[v] = counts.get(v, 0) + int(c)
        bar = min_fraction * total
        vals = [v for v, c in counts.items() if c >= bar]
        yield pd.DataFrame({col: vals})

    candidates = (
        df.select(col)
        .mapInPandas(_local_candidates, schema=df.select(col).schema)
        .distinct()
    )
    n_total = df.count()
    exact = (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(float(min_fraction)) * F.lit(n_total))
    )
    return exact


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


def hll_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lgk: int = 14,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Build a MERGEABLE distinct-count sketch table: one Apache
    DataSketches HLL sketch (Spark-native ``hll_sketch_agg``, binary
    column) per group. This is the pre-aggregation layer a 100 TB
    warehouse keeps per (day, source, ...) partition: sketches are a few
    KB each, the build is one map-side-combinable groupBy over the raw
    data, and ANY coarser rollup afterwards unions sketches instead of
    rescanning — see :func:`hll_rollup`."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias(sketch_col)
    )


def hll_rollup(
    sketch_table: DataFrame,
    rollup_cols: list[str],
    sketch_col: str = "hll_sketch",
    out_col: str = "distinct_est",
    keep_sketch: bool = False,
) -> DataFrame:
    """Re-aggregate a sketch table to a coarser grain: union the member
    sketches (``hll_union_agg`` — register-wise max, associative and
    commutative, so daily sketches roll into monthly into all-time without
    touching raw data) and estimate. The shuffle moves only KB-sized
    sketches, never rows. Estimates are within the standard HLL error
    envelope (~0.8 % at lgK=14); union-of-parts may differ from a
    direct sketch in the last fraction of a percent (mode promotion),
    which is the documented sketch contract, not nondeterminism."""
    merged = sketch_table.groupBy(*rollup_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )
    out = merged.withColumn(
        out_col, F.hll_sketch_estimate(F.col(sketch_col)).cast("bigint")
    )
    return out if keep_sketch else out.drop(sketch_col)
