"""Markov transition matrix over per-entity event sequences.

The reference replicates event streams row-by-row and leaves sequence
analytics to the warehouse; this verb is the engine-native "what happens
next" report a product/ops team runs on the replicated `events` table
(reference data model: tap-kafka / tap-postgres event rows with a user
key, a timestamp, and a categorical type).

Shape: one window exchange hash-partitioned by the entity key computes
``lead(state)`` per row (O(1) state per row, no sessionization buffer),
then ONE map-side-combinable (prev, next) aggregate; per-prev totals are
derived from the matrix itself (states² rows — metadata-scale), so the
probability join is broadcast-sized. Probabilities are integer ppm
(``floor(1e6·n/total)``): both engines evaluate the same exact-integer
double division (n ≤ 2^53/1e6), so the report is bit-identical and
hash-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    df: DataFrame,
    entity_col: str,
    state_col: str,
    order_cols: list[str | Column],
    min_count: int = 1,
) -> DataFrame:
    """First-order Markov transition matrix: for each observed
    ``(prev_state, next_state)`` pair across consecutive events of the
    same entity (ordered by ``order_cols``), the transition count ``n``
    and ``p_ppm`` = integer ppm share of the prev-state's outgoing
    transitions. Pairs rarer than ``min_count`` are dropped AFTER the
    totals are taken, so surviving rows keep their true denominators.

    At 100 TB: the window shuffles once on the entity key (same key a
    sessionize pass would use — co-partitionable); everything after is
    matrix-sized. Entity-key skew is bounded by per-user event counts;
    a hot entity degrades one task, never the aggregate (lead() is a
    streaming window — no buffering of the partition).
    """
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    pairs = (
        df.select(
            F.col(state_col).alias("prev_state"),
            F.lead(state_col).over(w).alias("next_state"),
        )
        .filter(F.col("next_state").isNotNull())
    )
    counts = pairs.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = counts.groupBy("prev_state").agg(
        F.sum("n").cast("long").alias("__total")
    )
    return (
        counts.join(F.broadcast(totals), "prev_state")
        .filter(F.col("n") >= F.lit(int(min_count)))
        .select(
            "prev_state",
            "next_state",
            "n",
            F.floor(F.lit(1000000) * F.col("n") / F.col("__total"))
            .cast("long")
            .alias("p_ppm"),
        )
    )


def frequent_paths(
    df: DataFrame,
    entity_col: str,
    state_col: str,
    order_cols: list[str | Column],
    n: int = 3,
    topk: int = 20,
    sep: str = ">",
) -> DataFrame:
    """Top-``topk`` length-``n`` state paths across consecutive events of
    the same entity — the n-gram generalization of
    :func:`transition_matrix` (n=2 pairs → n-step journeys). Returns
    ``(path, n_occurrences, rank)`` with the path rendered
    ``s1>s2>…>sn`` and rank tie-broken on the path string.

    Shape: the SAME single entity-keyed window exchange as the matrix
    (n-1 ``lead()`` columns ride one window — Catalyst collapses them
    into one Window node), one map-side-combinable path aggregate, then
    a rank window over the aggregated paths — states^n rows, i.e.
    answer-sized, so its single partition is metadata-scale by
    construction (like rrf_fuse's candidate window), never row-scale.
    """
    if n < 2:
        raise ValueError("paths need n >= 2 states")
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    steps = df.select(
        F.col(state_col).alias("__s0"),
        *[
            F.lead(state_col, i).over(w).alias(f"__s{i}")
            for i in range(1, n)
        ],
    )
    # a window qualifies only when EVERY step is a real state: lead(n-1)
    # null means the path runs off the entity's last events, and a NULL
    # state ANYWHERE in the window is not a state — concat_ws silently
    # skips nulls, so an unfiltered null middle would render a string
    # indistinguishable from a genuine (n-1)-state path (and diverge from
    # the SQL '||' oracle, which null-propagates the whole path)
    keep = F.lit(True)
    for i in range(n):
        keep = keep & F.col(f"__s{i}").isNotNull()
    paths = steps.where(keep).select(
        F.concat_ws(sep, *[F.col(f"__s{i}") for i in range(n)]).alias(
            "path"
        )
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    rw = Window.orderBy(F.col("n_occurrences").desc(), F.col("path"))
    return (
        counts.withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= topk)
    )
