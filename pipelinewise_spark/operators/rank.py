"""Exact global ranking without a single-reducer global sort.

A bare ``Window.orderBy(...)`` (no partitionBy) plans as
``Exchange SinglePartition`` — every row funnels through ONE task, the
classic 100-TB scale-killer. The exact same result comes from the
distributed-sort structure instead (the two-phase pattern
``functions/curation.py:shard_by_token_budget`` already uses for prefix
sums):

1. ``repartitionByRange`` on the order key — partitions hold disjoint,
   ordered key ranges (this is how Spark's own sort plans its shuffle);
2. per-partition ``row_number`` windows run in parallel (keys are local);
3. per-partition counts collect to the driver (#partitions rows of
   metadata, never row data) and fold into broadcast offsets;
4. global rank = local row_number + partition offset.

The order key must be unique (add a tie-break column) — otherwise equal
keys may straddle a range boundary and the rank is non-deterministic.
"""

from __future__ import annotations

from pipelinewise_spark.partitioning import local_frame
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_RN = "__rank_rn"
_OFF = "__rank_off"


def _ranked(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """(ranked frame, total row count) — the count is free metadata from
    the per-partition offsets job."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = df.repartitionByRange(n, *cols).withColumn(
        _PID, F.spark_partition_id()
    )
    w_in = Window.partitionBy(_PID).orderBy(*cols)
    # lazy checkpoint: the offsets collect below materializes the local row
    # numbers once; the returned plan reads them back instead of repeating
    # the scan + range shuffle + window
    d = d.withColumn(_RN, F.row_number().over(w_in)).localCheckpoint(
        eager=False
    )
    # per-partition row counts -> cumulative offsets (metadata-scale
    # collect: one row per shuffle partition)
    counts = {
        r[_PID]: r["c"] for r in d.groupBy(_PID).agg(
            F.count("*").alias("c")).collect()
    }
    # offsets applied via a BROADCAST join on pid, not a chained CASE WHEN:
    # a when-chain is an O(P)-deep expression tree evaluated per row —
    # fine at 32 partitions, codegen-hostile at the thousands of range
    # partitions a 100 TB sort uses. The join side is one tiny in-memory
    # frame (P rows of metadata).
    acc = 0
    rows = []
    for pid in sorted(counts):
        rows.append((pid, acc))
        acc += counts[pid]
    off = local_frame(spark, rows or [(0, 0)], f"{_PID} int, {_OFF} long")
    ranked = (
        d.join(F.broadcast(off), _PID)
        .withColumn(out_col, F.col(_RN).cast("long") + F.col(_OFF))
        .drop(_PID, _RN, _OFF)
    )
    return ranked, acc


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = exact 1-based global row number under
    ``ORDER BY order_cols`` with no global-sort exchange. Returns the
    input columns plus ``out_col``."""
    ranked, _ = _ranked(df, order_cols, out_col, num_partitions)
    return ranked


def ntile_exact(
    df: DataFrame,
    order_cols: list[str | Column],
    n_buckets: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order_cols)`` semantics (the first
    ``N mod n`` buckets take ``ceil(N/n)`` rows, the rest ``floor(N/n)``)
    computed from the distributed global rank — bit-identical to the SQL
    window, no ``Exchange SinglePartition`` in the plan."""
    ranked, total = _ranked(
        df, order_cols, "__ntile_rank", num_partitions
    )
    q, rem = divmod(total, n_buckets)
    r = F.col("__ntile_rank")
    big = rem * (q + 1)  # rows living in the ceil-sized leading buckets
    if q == 0:  # fewer rows than buckets: bucket == rank
        bucket = r
    else:
        bucket = F.when(
            r <= F.lit(big), F.floor((r - 1) / F.lit(q + 1)) + 1
        ).otherwise(F.lit(rem) + F.floor((r - F.lit(big) - 1) / F.lit(q)) + 1)
    return ranked.withColumn(out_col, bucket.cast("int")).drop("__ntile_rank")


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    tie_cols: list[str],
    quantiles: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT quantiles of ``value_col`` with no single-reducer sort: the
    value at global rank ``ceil(q·N)`` under ``ORDER BY value, tie_cols``
    (discrete-quantile semantics, deterministic under ties because the tie
    columns make the ordering total).

    percentile_approx is the 100 TB default (see approx_stats); this is the
    exact twin for when the answer must be reproducible to the row — same
    distributed-sort structure as ``distributed_row_number``, plus one
    broadcast join against the (len(quantiles))-row target-rank table.
    Returns (quantile, value) — one row per requested quantile.
    """
    import math

    ranked, n = _ranked(
        df, [value_col, *tie_cols], "__q_rank", num_partitions
    )
    spark = df.sparkSession
    targets = local_frame(spark, 
        [(float(q), max(1, math.ceil(q * n))) for q in quantiles],
        "quantile double, __q_rank long",
    )
    return (
        ranked.join(F.broadcast(targets), "__q_rank")
        .select("quantile", F.col(value_col).alias("value"))
    )


def exact_quantiles_interpolated(
    df: DataFrame,
    value_col: str,
    tie_cols: list[str],
    quantiles: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """``PERCENTILE_CONT`` semantics with no single-reducer sort: the
    continuous rank is ``h = 1 + q·(N-1)``; the answer linearly
    interpolates between the order statistics at ``floor(h)`` and
    ``ceil(h)``. Same distributed-rank structure as
    :func:`exact_quantiles` (the discrete twin) — one extra broadcast-join
    row per quantile fetches the ceil-rank neighbor. NULL values are
    excluded, as SQL's ordered-set aggregate does. Values are rounded to
    6 dp so the interpolation arithmetic is engine-portable (FP summation
    order differs across implementations in the last ulp).

    Returns (quantile, value) — one row per requested quantile."""
    import math

    d = df.filter(F.col(value_col).isNotNull())
    ranked, n = _ranked(d, [value_col, *tie_cols], "__q_rank", num_partitions)
    spark = df.sparkSession
    rows = []
    for q in quantiles:
        h = 1.0 + float(q) * (n - 1)
        lo, hi = int(math.floor(h)), int(math.ceil(h))
        rows.append((float(q), lo, hi, h - math.floor(h)))
    targets = local_frame(spark, 
        [(q, r, frac, kind)
         for q, lo, hi, frac in rows
         for kind, r in (("lo", lo), ("hi", hi))],
        "quantile double, __q_rank long, __frac double, __kind string",
    )
    picked = ranked.join(F.broadcast(targets), "__q_rank").groupBy(
        "quantile", "__frac"
    ).agg(
        F.min(F.when(F.col("__kind") == "lo", F.col(value_col))).alias("__lo"),
        F.min(F.when(F.col("__kind") == "hi", F.col(value_col))).alias("__hi"),
    )
    value = F.round(
        F.col("__lo")
        + (F.col("__hi") - F.col("__lo")) * F.col("__frac"),
        6,
    ).cast("double")
    return picked.select("quantile", value.alias("value"))


def exact_group_quantiles_interpolated(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tie_cols: list[str],
    quantiles: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group ``PERCENTILE_CONT``: the grouped twin of
    :func:`exact_quantiles_interpolated`, built on the SAME one global
    range-partitioned rank as :func:`exact_group_quantiles` (groups
    contiguous in rank space, no per-group sort task). Each group's
    continuous rank ``h = first_rank + q·(n-1)`` resolves to its floor and
    ceil neighbors ENTIRELY as Column arithmetic on the per-group bounds
    frame — no driver loop over groups, so group cardinality only bounds
    the broadcast (groups × quantiles × 2 rows). NULL values excluded as
    SQL does. Returns (*group_cols, quantile, value), value rounded to
    6 dp for engine portability."""
    d = df.filter(F.col(value_col).isNotNull())
    ranked, _ = _ranked(
        d, [*group_cols, value_col, *tie_cols], "__q_rank", num_partitions
    )
    bounds = ranked.groupBy(*group_cols).agg(
        F.min("__q_rank").alias("__lo0"), F.count("*").alias("__n")
    )
    qcol = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("quantile")
    h = F.col("quantile") * (F.col("__n") - 1).cast("double")
    t = (
        bounds.select(*group_cols, "__lo0", "__n", qcol)
        .withColumn("__floor", F.floor(h).cast("long"))
        .withColumn("__frac", h - F.floor(h))
        .withColumn(
            "__ranks",
            F.array(
                F.struct(
                    (F.col("__lo0") + F.col("__floor")).alias("__q_rank"),
                    F.lit("lo").alias("__kind"),
                ),
                F.struct(
                    (F.col("__lo0") + F.ceil(h).cast("long")).alias("__q_rank"),
                    F.lit("hi").alias("__kind"),
                ),
            ),
        )
        .select(
            *group_cols, "quantile", "__frac",
            F.explode("__ranks").alias("__r"),
        )
        .select(
            *group_cols, "quantile", "__frac",
            F.col("__r.__q_rank").alias("__q_rank"),
            F.col("__r.__kind").alias("__kind"),
        )
    )
    picked = (
        ranked.join(F.broadcast(t), [*group_cols, "__q_rank"])
        .groupBy(*group_cols, "quantile", "__frac")
        .agg(
            F.min(
                F.when(F.col("__kind") == "lo", F.col(value_col))
            ).alias("__lo"),
            F.min(
                F.when(F.col("__kind") == "hi", F.col(value_col))
            ).alias("__hi"),
        )
    )
    value = F.round(
        F.col("__lo") + (F.col("__hi") - F.col("__lo")) * F.col("__frac"), 6
    ).cast("double")
    return picked.select(*group_cols, "quantile", value.alias("value"))


def exact_group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    tie_cols: list[str],
    quantiles: list[float],
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group exact quantiles with no per-group sort task: ONE global
    range-partitioned rank over (group, value, ties) — groups are
    contiguous in rank space — then each group's quantile is the row at
    rank ``first_rank + ceil(q·n_group) - 1``, recovered via a broadcast
    join of the (groups × quantiles)-row target table. A bare
    ``PARTITION BY group ORDER BY value`` window would funnel each group
    (terabytes, at corpus scale) through one task; this shape never does,
    and it shares the rank's single materialization across all requested
    quantiles. Assumes group cardinality ≪ corpus (the broadcast side is
    groups × quantiles rows). Returns (*group_cols, quantile, value).
    """
    ranked, _ = _ranked(
        df, [*group_cols, value_col, *tie_cols], "__q_rank", num_partitions
    )
    bounds = ranked.groupBy(*group_cols).agg(
        F.min("__q_rank").alias("__lo"), F.count("*").alias("__n")
    )
    qcol = F.explode(
        F.array(*[F.lit(float(q)) for q in quantiles])
    ).alias("quantile")
    targets = bounds.select(*group_cols, "__lo", "__n", qcol).withColumn(
        "__q_rank",
        F.col("__lo")
        + F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("quantile") * F.col("__n")),
        )
        - F.lit(1),
    )
    return (
        ranked.join(
            F.broadcast(targets.select(*group_cols, "quantile", "__q_rank")),
            [*group_cols, "__q_rank"],
        )
        .select(*group_cols, "quantile", F.col(value_col).alias("value"))
    )


def clip_to_quantiles(
    df: DataFrame,
    value_col: str,
    tie_cols: list[str],
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    out_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Winsorization: clip ``value_col`` into its exact
    [PERCENTILE_CONT(lower_q), PERCENTILE_CONT(upper_q)] interval — the
    standard outlier treatment before scaling/normalizing features. The
    bounds come from ONE distributed-rank materialization
    (:func:`exact_quantiles_interpolated`, no single-reducer sort) and
    apply back as a broadcast 1-row cross join, so the whole operation is
    corpus-linear. NULL values pass through unclipped."""
    out_col = out_col or f"{value_col}_clipped"
    qs = exact_quantiles_interpolated(
        df, value_col, tie_cols, [lower_q, upper_q], num_partitions
    )
    bounds = qs.groupBy().agg(
        F.min(F.when(F.col("quantile") == lower_q, F.col("value"))).alias(
            "__lo_b"
        ),
        F.min(F.when(F.col("quantile") == upper_q, F.col("value"))).alias(
            "__hi_b"
        ),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            out_col,
            F.when(
                F.col(value_col).isNotNull(),
                F.least(
                    F.greatest(F.col(value_col), F.col("__lo_b")),
                    F.col("__hi_b"),
                ),
            ),
        )
        .drop("__lo_b", "__hi_b")
    )
