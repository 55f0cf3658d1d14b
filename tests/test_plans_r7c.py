"""Plan-shape pins for the r7 continuation operators.

- Runtime bloom-filter join (Spark's semi-join reduction): at 100 TB the
  default thresholds (creation side selective + application side >= 10 GB
  scan) fire on exactly the TPC-H join shapes below without tuning; at
  test scale the application-side threshold must drop to 0 to observe the
  injection.  Values are identical either way — the pin is the plan.
- OHLC: one partial-aggregable exchange, no SinglePartition, partial
  min_by/max_by present (no window-sort formulation).
- Window breadth: all same-spec functions collapse into shared Window
  nodes (two specs -> exactly two Window operators, one exchange).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipelinewise_spark.queries import QUERIES
from pipelinewise_spark.sources.files import read_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_runtime_bloom_filter_join_fires(spark):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # simulate the >=10GB application-side scan of the real cluster
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force a shuffle join: broadcast joins don't need the reduction
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = read_table(spark, SF, "lineitem")
        o = read_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = _plan(j)
        assert "might_contain" in plan  # bloom probe pushed into the scan side
        # and the filtered build side feeds the aggregate that builds it
        assert "bloom_filter_agg" in plan or "BloomFilterAggregate" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ohlc_plan_single_partial_aggregable_exchange(spark):
    plan = _plan(QUERIES["ohlc_daily_events"](spark, SF))
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan
    assert "partial_min_by" in plan and "partial_max_by" in plan
    assert "Window" not in plan  # no row_number formulation


def test_window_breadth_collapses_to_one_window_node(spark):
    plan = _plan(QUERIES["window_functions_orders"](spark, SF))
    # seven window functions, same partition+order -> ONE Window node
    # (Catalyst collapses across frame variants), one sort, one exchange
    n_window = sum(
        1
        for line in plan.splitlines()
        if line.lstrip("+- :*").startswith("Window")
    )
    assert n_window == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") == 1


def test_pagerank_no_single_partition_in_iteration(spark):
    plan = _plan(QUERIES["pagerank_copurchase_parts"](spark, SF))
    assert "SinglePartition" not in plan
