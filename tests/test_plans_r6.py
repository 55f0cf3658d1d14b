"""Round-6 plan + operator assertions.

1. The distributed rank applies per-partition offsets via a BROADCAST JOIN
   on a (pid, offset) metadata frame, not an O(P)-deep CASE WHEN chain —
   the expression depth must stay constant as num_partitions grows
   (VERDICT r5 'What's wrong #2').
2. Range partitioning under heavy value skew (90% one value) stays exact
   and balanced because the tie-break column participates in the range key
   (VERDICT r5 next-round #6).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipelinewise_spark.operators.rank import (
    distributed_row_number,
    exact_group_quantiles,
    exact_quantiles,
)


def _plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_rank_offsets_are_broadcast_join_not_when_chain(spark):
    df = spark.range(5000).selectExpr("id", "id % 11 AS k")
    ranked = distributed_row_number(df, ["k", "id"], num_partitions=16)
    plan = _plan_of(ranked)
    assert "SinglePartition" not in plan, plan
    # the offsets arrive through a broadcast hash join ...
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    # ... not a chained conditional: expression depth must not scale with P.
    # (one CASE WHEN may appear incidentally; 16 nested ones must not)
    assert plan.count("CASE WHEN") < 4, plan


def test_rank_expression_depth_constant_in_partitions(spark):
    """The final projection is identical in shape at 4 and 64 partitions —
    with the when-chain it grew by ~15 conditionals per extra partition."""
    df = spark.range(2000).selectExpr("id", "id % 5 AS k")
    p4 = _plan_of(distributed_row_number(df, ["k", "id"], num_partitions=4))
    p64 = _plan_of(distributed_row_number(df, ["k", "id"], num_partitions=64))
    assert abs(p64.count("CASE WHEN") - p4.count("CASE WHEN")) <= 1


def test_rank_exact_under_heavy_skew(spark):
    """90 % of rows share one value; the unique tie column keeps the range
    partitioning total, so the hot value spreads across partitions instead
    of funnelling one fat reducer — and the rank stays bit-exact."""
    rows = [(i, 1.0 if i % 10 else float(2 + i % 7)) for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = distributed_row_number(df, ["v", "id"], out_col="rank",
                                 num_partitions=16)
    want = df.withColumn(
        "rank",
        F.row_number().over(Window.orderBy("v", "id")).cast("long"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # balance: no partition of the range shuffle holds more than half the
    # rows (the hot value alone is 90 %, so this proves it was split)
    sizes = (
        df.repartitionByRange(16, F.col("v"), F.col("id"))
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    assert max(r["count"] for r in sizes) < 20000 * 0.5, sorted(
        (r["__pid"], r["count"]) for r in sizes
    )


def test_quantiles_exact_under_heavy_skew(spark):
    rows = [(i, 5.0 if i % 20 else float(i % 9)) for i in range(10000)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles(
            df, "v", ["id"], [0.1, 0.5, 0.9], num_partitions=16
        ).collect()
    }
    import math

    vals = sorted((r["v"], r["id"]) for r in df.collect())
    for q in (0.1, 0.5, 0.9):
        assert got[q] == vals[max(1, math.ceil(q * len(vals))) - 1][0]


def test_group_quantiles_exact_under_group_skew(spark):
    """One group holds 95 % of rows: per-group quantiles stay exact with no
    per-group sort (the global range rank spreads the hot group)."""
    rows = [
        ("hot" if i % 20 else f"g{i % 5}", i, float((i * 13) % 101))
        for i in range(8000)
    ]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {
        (r["g"], r["quantile"]): r["value"]
        for r in exact_group_quantiles(
            df, ["g"], "v", ["id"], [0.5], num_partitions=16
        ).collect()
    }
    import math

    by_g: dict[str, list[tuple[float, int]]] = {}
    for g, i, v in rows:
        by_g.setdefault(g, []).append((v, i))
    for g, vals in by_g.items():
        vals.sort()
        want = vals[max(1, math.ceil(0.5 * len(vals))) - 1][0]
        assert got[(g, 0.5)] == want, g
