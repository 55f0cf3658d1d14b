"""Plan-shape pins for the r9 operators.

- ks_drift_by_segment: the per-segment running counts come from the
  segment-grouped two-phase prefix sum — NO `Exchange SinglePartition`
  anywhere in the plan (a naive `SUM() OVER (PARTITION BY segment ORDER
  BY v)` would be fine, but the global-ordering variants that funnel one
  task are the regression this guards against), and no cartesian.
- reconcile_repair: the surviving-target-rows path is a key ANTI join
  and the fix-copy path a key SEMI join — the repair must never plan a
  full rewrite join (inner/outer on the data columns) or a cartesian.
- kmeans assignment: the argmin kernel is an Arrow-batched pandas_udf
  (`ArrowEvalPython`), never row-at-a-time Python (`BatchEvalPython`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipelinewise_spark.sources.files import read_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_ks_drift_plan_no_single_partition_no_cartesian(spark):
    from pipelinewise_spark.operators.drift import ks_drift_by_segment

    o = read_table(spark, SF, "orders")
    cut = F.lit("1998-01-01").cast("date")
    out = ks_drift_by_segment(
        o.filter(F.col("o_orderdate") < cut),
        o.filter(F.col("o_orderdate") >= cut),
        "o_totalprice",
        "o_orderpriority",
    )
    plan = _plan(out)
    assert "SinglePartition" not in plan, plan
    assert "Cartesian" not in plan, plan


def test_reconcile_repair_plan_semi_anti_only(spark):
    from pipelinewise_spark.operators.reconcile import reconcile_repair

    src = spark.range(1000).selectExpr("id AS pk", "concat('v', id) AS val")
    tgt = src.filter(F.col("pk") % 7 != 3)
    repaired = reconcile_repair(
        src, tgt, "pk", [F.col("pk").cast("string"), F.col("val")]
    )
    plan = _plan(repaired)
    assert "LeftAnti" in plan, plan
    assert "LeftSemi" in plan, plan
    assert "Cartesian" not in plan, plan


def test_kmeans_assignment_is_arrow_batched(spark):
    from pipelinewise_spark.functions.kmeans import _argmin_udf, _quantize

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0 - (i % 5) / 5]) for i in range(50)],
        "id long, vec array<double>",
    )
    cents = [(1, [0, 0], 1), (2, [1_000_000, 500_000], 1)]
    out = df.select(
        "id",
        _argmin_udf(cents)(_quantize("vec")).alias("c"),
    )
    plan = _plan(out)
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_mw_drift_plan_no_single_partition(spark):
    from pipelinewise_spark.operators.drift import mw_drift_by_segment

    o = read_table(spark, SF, "orders")
    cut = F.lit("1998-01-01").cast("date")
    out = mw_drift_by_segment(
        o.filter(F.col("o_orderdate") < cut),
        o.filter(F.col("o_orderdate") >= cut),
        "o_totalprice",
        "o_orderpriority",
    )
    plan = _plan(out)
    assert "SinglePartition" not in plan, plan
    assert "Cartesian" not in plan, plan
