"""Bucketed co-located MERGE: the PK join between co-bucketed tables must
plan without a shuffle Exchange — the 100 TB layout-reuse contract."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from pipelinewise_spark.operators.bucketed import bucketed_merge, write_bucketed
from pipelinewise_spark.sources.files import read_table


def test_bucketed_merge_no_shuffle(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    batch = orders.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1.0
    )
    write_bucketed(orders, "t_orders_bucketed", ["o_orderkey"], num_buckets=8)
    write_bucketed(batch, "b_orders_bucketed", ["o_orderkey"], num_buckets=8)
    try:
        merged = bucketed_merge(
            spark, "t_orders_bucketed", "b_orders_bucketed", ["o_orderkey"]
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            merged.explain("formatted")
        plan = buf.getvalue()
        joins = plan.split("SortMergeJoin")
        assert len(joins) >= 2, "expected a sort-merge join over buckets"
        # no shuffle exchange feeding the join (bucketed scan on both sides)
        assert "Exchange hashpartitioning" not in plan, plan[:2000]

        assert merged.count() == orders.count()
        updated = merged.filter(F.col("o_orderkey") % 5 == 0).agg(
            F.min(F.col("o_totalprice"))
        ).collect()[0][0]
        original_min = orders.filter(F.col("o_orderkey") % 5 == 0).agg(
            F.min(F.col("o_totalprice"))
        ).collect()[0][0]
        assert abs(updated - (original_min + 1.0)) < 1e-9
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS b_orders_bucketed")


def test_profile_operator(spark, sf_dir):
    from pipelinewise_spark.operators.profile import profile

    orders = read_table(spark, sf_dir, "orders")
    p = {r.column: r for r in profile(
        orders, ["o_orderkey", "o_orderstatus"]
    ).collect()}
    n = orders.count()
    assert p["o_orderkey"].n_rows == n
    assert p["o_orderkey"].n_nulls == 0
    assert p["o_orderkey"].n_distinct == n
    assert p["o_orderstatus"].n_distinct == 3
    assert p["o_orderstatus"].min_value == "F"
