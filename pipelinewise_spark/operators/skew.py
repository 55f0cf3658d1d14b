"""Skew-resistant aggregation (two-stage salted combine).

A groupBy on a skewed key sends one key's entire volume to one reducer. The
classic fix: salt the key into S shards, pre-aggregate per (key, salt), then
combine the partials — turning one hot reducer into S. AQE handles skewed
*joins*; skewed *aggregations* still need this pattern when partial
aggregation alone can't keep up (high-cardinality payloads, e.g. collect-style
aggs). For algebraic aggregates (sum/count/min/max) the two-stage result is
exactly the one-stage result.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__pws_salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: ``aggs`` maps output column → (input_col, fn)
    with fn in {sum, count, min, max}. Result is identical to a direct
    groupBy; the plan shards hot keys across ``salt_buckets`` reducers."""
    first: list[Column] = []
    second: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            first.append(F.count(col).alias(out))
            second.append(F.sum(out).alias(out))
        elif fn == "sum":
            first.append(F.sum(col).alias(out))
            second.append(F.sum(out).alias(out))
        elif fn == "min":
            first.append(F.min(col).alias(out))
            second.append(F.min(out).alias(out))
        elif fn == "max":
            first.append(F.max(col).alias(out))
            second.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = df.withColumn(
        _SALT, F.pmod(F.hash(*[F.col(k) for k in keys], F.spark_partition_id()),
                      F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, _SALT).agg(*first)
    return partial.groupBy(*keys).agg(*second)


def salted_topk(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    tiebreak_col: str,
    k: int,
    descending: bool = True,
    salt_buckets: int = 16,
) -> DataFrame:
    """EXACT per-key top-k that never serializes a hot key onto one
    reducer. A plain ranked window partitions by key — one reducer sorts
    ALL of a hot key's rows. Two salted stages instead:

    1. top-k within each (key, salt) shard — S reducers share the hot
       key's volume, each sorting 1/S of it;
    2. top-k of the ≤ k*S surviving candidates per key — candidate volume
       is k*S rows per key regardless of input size.

    Exactness: any row in the true global top-k is also in the top-k of
    whichever shard holds it (removing other rows can only improve its
    shard rank), so stage 1 never discards a winner. Deterministic via the
    (order_col, tiebreak_col) total order — same contract as the plain
    window it replaces.
    """
    from pyspark.sql import Window

    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    tb = F.col(tiebreak_col).asc()
    salted = df.withColumn(
        _SALT,
        F.pmod(F.hash(F.col(tiebreak_col)), F.lit(salt_buckets)),
    )
    w1 = Window.partitionBy(*keys, _SALT).orderBy(oc, tb)
    stage1 = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", _SALT)
    )
    w2 = Window.partitionBy(*keys).orderBy(oc, tb)
    return (
        stage1.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: the fact side salts each row into one of
    ``salt_buckets`` shards; the dim side is REPLICATED once per shard
    (explode of a literal range — dim rows × S, acceptable when the dim is
    the small side) and the join runs on (keys…, salt). A hot key's volume
    now spreads over S reducers instead of melting one.

    AQE's skew-join split handles moderate skew after the fact; this is the
    explicit pre-plan form for EXTREME single-key skew (the web-corpus
    "one domain is 30 % of the crawl" case) and for engines/settings where
    AQE can't split (e.g. the shuffle feeding a downstream bucketed write).
    Row-identical to the plain join for inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted = facts.withColumn(
        _SALT,
        F.pmod(
            F.hash(*[F.col(k) for k in keys], F.spark_partition_id()),
            F.lit(salt_buckets),
        ),
    )
    replicated = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted.join(replicated, [*keys, _SALT], how).drop(_SALT)
