"""Market-basket co-occurrence — frequent item pairs with lift.

The pair-generation self-join is the classic blow-up: a basket of b items
emits b*(b-1)/2 pairs, so one mega-basket (a crawler session with 10k
events, a power-user order) can dominate the whole shuffle.  Apriori's
first pruning level fixes it: an item pair can only be frequent if BOTH
items are frequent, so items below ``min_item_support`` are dropped BEFORE
pairs form.  The frequent-item set is Zipf-small, so the prune is a
broadcast semi-join against the basket rows — the full basket table is
scanned once and never shuffled for the prune.

Pipeline: distinct (basket, item) → item supports (one shuffle on item) →
broadcast-prune → pair self-join on the basket key (one shuffle on basket)
→ pair counts (one shuffle on the pair).  Lift arrives via two broadcast
joins against the item-support table and a broadcast single-row basket
total — nothing driver-side.

Scale: with support pruning the per-basket fan-out is bounded by the
number of FREQUENT items in the basket; ``max_basket_items`` guards the
residual skew case (a basket of thousands of distinct frequent items) by
dropping oversized baskets explicitly rather than letting one key stall
the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int = 2,
    min_pair_support: int = 2,
    max_basket_items: int | None = None,
) -> DataFrame:
    """(item_a, item_b, pair_baskets, baskets_a, baskets_b, lift) for every
    unordered pair of frequent items co-occurring in at least
    ``min_pair_support`` baskets.  ``lift`` is rounded to 6 decimals so the
    result is hash-stable across evaluation orders."""
    baskets = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    supports = (
        baskets.groupBy("i")
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") >= min_item_support)
    )
    # Zipf-small frequent-item set: broadcast the prune, basket rows never
    # shuffle for it
    pruned = baskets.join(F.broadcast(supports.select("i")), "i")
    if max_basket_items is not None:
        # basket sizes are basket-cardinality (NOT broadcastable at scale);
        # the semi-join keys on b, the same key the pair self-join below
        # shuffles on, so the guard's partitioning is reused — one extra
        # answer-keyed join, no extra repartition of the big side
        sized = pruned.groupBy("b").agg(F.count("*").alias("sz"))
        pruned = pruned.join(
            sized.filter(F.col("sz") <= max_basket_items), "b", "left_semi"
        )
    left = pruned.select("b", F.col("i").alias("item_a"))
    right = pruned.select("b", F.col("i").alias("item_b"))
    pairs = (
        left.join(right, "b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("pair_baskets"))
        .filter(F.col("pair_baskets") >= min_pair_support)
    )
    total = baskets.agg(F.count_distinct("b").alias("n_baskets"))
    sup_a = supports.select(
        F.col("i").alias("item_a"), F.col("nb").alias("baskets_a")
    )
    sup_b = supports.select(
        F.col("i").alias("item_b"), F.col("nb").alias("baskets_b")
    )
    return (
        pairs.join(F.broadcast(sup_a), "item_a")
        .join(F.broadcast(sup_b), "item_b")
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "pair_baskets",
            "baskets_a",
            "baskets_b",
            "n_baskets",
            F.round(
                F.col("pair_baskets").cast("double")
                * F.col("n_baskets")
                / (F.col("baskets_a") * F.col("baskets_b")),
                6,
            ).alias("lift"),
        )
    )
