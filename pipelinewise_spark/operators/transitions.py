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
