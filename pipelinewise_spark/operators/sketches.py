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


def _bucket_expr(value_col: str, lo: float, hi: float, num_buckets: int):
    """Clamped equi-width bucket index — the ONE definition both the
    build and the feed fold use; divergence here would break the
    maintained≡rebuild bit-identity."""
    width = (hi - lo) / num_buckets
    return F.least(
        F.lit(num_buckets - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
            .cast("int"),
        ),
    )


def _dense_counts(map_col: str, num_buckets: int):
    """(bucket -> count) map pivoted to a dense array<long>."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_buckets - 1)),
        lambda i: F.coalesce(F.element_at(F.col(map_col), i), F.lit(0)),
    )


def histogram_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    num_buckets: int = 1024,
    sketch_col: str = "hist_sketch",
    count_col: str = "n",
) -> DataFrame:
    """Build a MERGEABLE quantile-histogram sketch table: one fixed-range
    equi-width bucket-count array (``array<long>``, length
    ``num_buckets``) per group — the quantile companion to
    :func:`hll_sketch_table`.

    The sketch is exactly mergeable (element-wise add — associative,
    commutative, no mode promotion), so daily sketches roll into monthly
    into all-time without rescanning raw data; each is
    ``8·num_buckets`` bytes regardless of group size. Build cost: one
    map-side-combinable count per (group, bucket) — at most
    groups×buckets rows shuffle, never data rows — then a dense-array
    pivot per group. Values below ``lo``/above ``hi`` clamp into the
    edge buckets (they still count; their position error is the
    documented range contract — pick bounds from ANALYZE stats).
    Quantile estimates off the sketch (:func:`histogram_quantile`) are
    exact in RANK up to one bucket's occupancy and within one bucket
    width ``(hi-lo)/num_buckets`` in VALUE of some true sample point —
    the fixed-range histogram contract (cf. Postgres/ClickHouse
    histogram stats), deterministic by construction, unlike KLL/GK
    whose compaction paths are seed-dependent."""
    if not hi > lo:
        raise ValueError("need hi > lo")
    b = _bucket_expr(value_col, lo, hi, num_buckets)
    per = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    m = per.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__b"), F.col("__c")))
        ).alias("__m")
    )
    dense = _dense_counts("__m", num_buckets)
    return m.select(
        *group_cols,
        dense.alias(sketch_col),
        F.aggregate(
            dense, F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias(count_col),
    )


def histogram_rollup(
    sketch_table: DataFrame,
    rollup_cols: list[str],
    sketch_col: str = "hist_sketch",
    count_col: str = "n",
) -> DataFrame:
    """Re-aggregate a histogram sketch table to a coarser grain:
    element-wise array addition (``zip_with`` fold over
    ``collect_list``) — the shuffle carries KB-sized arrays, never rows,
    and the merged sketch is bit-identical to one built directly from
    the union of the raw data (exactly mergeable, unlike HLL's
    last-fraction-of-a-percent mode promotion)."""
    merged = sketch_table.groupBy(*rollup_cols).agg(
        F.aggregate(
            F.collect_list(F.col(sketch_col)),
            F.lit(None).cast("array<bigint>"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                F.zip_with(acc, x, lambda a, b2: a + b2)
            ),
        ).alias(sketch_col),
        F.sum(F.col(count_col)).alias(count_col),
    )
    return merged


def histogram_quantile(
    sketch_table: DataFrame,
    q: float,
    lo: float,
    hi: float,
    sketch_col: str = "hist_sketch",
    count_col: str = "n",
    out_col: str = "quantile_est",
) -> DataFrame:
    """Estimate the q-quantile from each row's sketch: find the first
    bucket where the cumulative count reaches ``ceil(q·n)`` and report
    its UPPER edge — guaranteed >= the true q-quantile and < true + one
    bucket width (clamped range aside). Pure Column work: one
    ``aggregate`` scan over the array per row, no data touched."""
    target = F.ceil(F.lit(q) * F.col(count_col)).cast("bigint")
    # fold: (cum, found_bucket); pick first bucket reaching the target
    found = F.aggregate(
        F.zip_with(
            F.col(sketch_col),
            F.sequence(F.lit(0), F.size(F.col(sketch_col)) - 1),
            lambda c, i: F.struct(c.alias("c"), i.alias("i")),
        ),
        F.struct(
            F.lit(0).cast("bigint").alias("cum"),
            F.lit(-1).alias("idx"),
        ),
        lambda acc, x: F.struct(
            (acc["cum"] + x["c"]).alias("cum"),
            F.when(
                (acc["idx"] < 0) & (acc["cum"] + x["c"] >= target),
                x["i"],
            ).otherwise(acc["idx"]).alias("idx"),
        ),
    )["idx"]
    est = F.lit(lo) + (
        (found.cast("double") + F.lit(1.0))
        * (F.lit(hi - lo) / F.size(F.col(sketch_col)))
    )
    return sketch_table.withColumn(out_col, est)


def histogram_apply_feed(
    sketch_table: DataFrame,
    feed: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    num_buckets: int = 1024,
    sketch_col: str = "hist_sketch",
    count_col: str = "n",
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Maintain a histogram sketch table from a CHANGE FEED instead of
    rebuilding: inserts add +1 to their value's bucket, deletes add −1 —
    the fixed-range histogram is INVERTIBLE (integer bucket counts),
    which HLL/KLL are not, so the maintained sketch is BIT-IDENTICAL to
    a fresh build over the new state (asserted in tests, not just
    bounded). Feed shape: rows carrying ``group_cols``, ``value_col``
    and ``change_type_col`` in {'insert','delete'} — exactly what
    ``ManifestTable.changes_between`` emits. Cost: one groups×buckets
    aggregation over the BATCH plus a sketch-table outer merge of
    KB-sized arrays — a 100 TB table's column distribution stays
    current for O(changes) per poll, the quantile companion to
    CDF-driven MV maintenance. Groups whose maintained count reaches
    zero disappear, matching a rebuild."""
    if not hi > lo:
        raise ValueError("need hi > lo")
    b = _bucket_expr(value_col, lo, hi, num_buckets)
    sign = F.when(
        F.col(change_type_col) == "delete", F.lit(-1)
    ).otherwise(F.lit(1)).cast("bigint")
    per = (
        feed.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, b.alias("__b"))
        .agg(F.sum(sign).alias("__c"))
    )
    m = per.groupBy(*group_cols).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__b"), F.col("__c")))
        ).alias("__m")
    )
    dense = _dense_counts("__m", num_buckets)
    delta = m.select(
        *group_cols,
        dense.alias("__dsk"),
        F.aggregate(
            dense, F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("__dn"),
    )
    on = [sketch_table[k].eqNullSafe(delta[k]) for k in group_cols]
    j = sketch_table.alias("s").join(delta.alias("d"), on, "full_outer")
    zero = F.array_repeat(F.lit(0).cast("bigint"), num_buckets)
    merged = j.select(
        *[
            F.coalesce(F.col(f"s.{k}"), F.col(f"d.{k}")).alias(k)
            for k in group_cols
        ],
        F.zip_with(
            F.coalesce(F.col(f"s.{sketch_col}"), zero),
            F.coalesce(F.col("d.__dsk"), zero),
            lambda a, x: a + x,
        ).alias(sketch_col),
        (
            F.coalesce(F.col(f"s.{count_col}"), F.lit(0))
            + F.coalesce(F.col("d.__dn"), F.lit(0))
        ).alias(count_col),
    )
    return merged.filter(F.col(count_col) > 0)


# --- Count-Min Sketch (frequency) — completes the sketch triad beside the
# HLL (distinct) and quantile-histogram (distribution) tables above.


def cms_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    depth: int = 5,
    width: int = 4096,
) -> DataFrame:
    """Mergeable Count-Min frequency sketch in LONG FORM: one row per
    (group, hash-row i, counter col) touched cell with its count —
    at most depth×width rows per group regardless of key cardinality.

    Long form instead of a binary blob because it makes the sketch a
    plain DataFrame: merging coarser grains is a groupBy-SUM (exactly
    mergeable — integer counts, so union-of-parts is BIT-IDENTICAL to a
    direct build, unlike HLL's mode promotion), and point queries are
    an answer-sized equi-join.  Hash row i uses ``xxhash64(key, i)`` —
    deterministic across engines, partitionings, and sessions.

    The build is one explode(depth) + one map-side-combinable groupBy:
    raw data is scanned once; everything downstream shuffles KB-scale
    cells, never rows."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width))
                .cast("int")
                .alias("col"),
            )
            for i in range(depth)
        ]
    )
    return (
        df.select(*group_cols, F.explode(cells).alias("__cell"))
        .groupBy(*group_cols, F.col("__cell.i").alias("i"), F.col("__cell.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_rollup(
    sketch_table: DataFrame, rollup_cols: list[str]
) -> DataFrame:
    """Re-aggregate CMS cells to a coarser grain: counter-wise SUM —
    associative, commutative, and exact, so daily sketches roll into
    monthly into all-time bit-identically to a direct build."""
    return sketch_table.groupBy(*rollup_cols, "i", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch_table: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 4096,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the estimate is
    min over hash rows of the key's counter (the CMS guarantee:
    estimate >= true count always; <= true + e/width × N with high
    probability).  One explode(depth) on the (answer-sized) key set +
    one equi-join against the cells + one min-groupBy."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.pmod(
                            F.xxhash64(F.col(key_col), F.lit(i)),
                            F.lit(width),
                        )
                        .cast("int")
                        .alias("col"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__cell"),
    ).select(key_col, F.col("__cell.i").alias("i"), F.col("__cell.col").alias("col"))
    return (
        probes.join(sketch_table, ["i", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("freq_est"))
    )


def cms_apply_feed(
    sketch_table: DataFrame,
    feed: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 4096,
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Maintain a CMS from a CHANGE FEED instead of rebuilding: inserts
    add +1 to the key's cells, deletes add −1 — integer counters make
    the sketch exactly INVERTIBLE (like the fixed-range histogram,
    unlike HLL), so the maintained sketch is BIT-IDENTICAL to a fresh
    build over the new state.  An update arriving as delete(old) +
    insert(new) with the same key cancels cell-exactly.  Long form
    makes the fold a union + groupBy-SUM (no join); cells that sum to
    zero drop, matching a rebuild.  Cost: O(batch × depth) cells, never
    the table."""
    sign = (
        F.when(F.col(change_type_col) == "delete", F.lit(-1))
        .otherwise(F.lit(1))
        .cast("long")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width))
                .cast("int")
                .alias("col"),
            )
            for i in range(depth)
        ]
    )
    delta = (
        feed.select(sign.alias("__sign"), F.explode(cells).alias("__cell"))
        .groupBy(F.col("__cell.i").alias("i"), F.col("__cell.col").alias("col"))
        .agg(F.sum("__sign").alias("cnt"))
    )
    return (
        sketch_table.unionByName(delta)
        .groupBy("i", "col")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )
