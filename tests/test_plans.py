"""Physical-plan assertions: the plans must stay scale-shaped — pushed
filters at the scan, broadcast joins for dims, no Python UDFs in
Column-expression operators, whole-stage codegen in the hot path."""

from __future__ import annotations

from pipelinewise_spark.queries import QUERIES


def _explain(spark, name, sf_dir, mode: str) -> str:
    import contextlib
    import io

    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _plan(spark, name, sf_dir) -> str:
    return _explain(spark, name, sf_dir, "formatted")


def _final_plan(spark, name, sf_dir) -> str:
    """Simple-mode explain AFTER execution — AQE only reveals the final
    (codegen-annotated) plan once the query has run."""
    import contextlib
    import io

    df = QUERIES[name](spark, sf_dir)
    df.collect()  # count() would execute a different (re-planned) query
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # partial aggregation runs map-side before the exchange
    assert "HashAggregate" in plan and "Exchange" in plan
    # whole-stage codegen shows as *(N) markers in the final adaptive plan
    assert "*(" in _final_plan(spark, "q1_pricing_summary", sf_dir)


def test_q3_q5_broadcast_dimensions(spark, sf_dir):
    for name in ("q3_shipping_priority", "q5_local_supplier_volume"):
        plan = _plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, f"{name}: dims must broadcast"
        # the fact-side join may shuffle; never a cartesian product
        assert "CartesianProduct" not in plan, name


def test_masking_stays_jvm_side(spark, sf_dir):
    plan = _plan(spark, "mask_transforms_customer", sf_dir)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "mask compiler must produce pure Catalyst expressions"
    )
    assert "*(" in _final_plan(spark, "mask_transforms_customer", sf_dir)


def test_json_field_paths_uses_arrow_not_row_python(spark, sf_dir):
    plan = _plan(spark, "mask_json_field_paths_events", sf_dir)
    assert "ArrowEvalPython" in plan, "field_paths rewrite must be Arrow-batched"
    assert "BatchEvalPython" not in plan


def test_ngram_pairs_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "ngram_jaccard_pairs_documents", sf_dir)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # equi-join on the grid/block keys (any hash-based strategy is fine)
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, "pk_dedupe_events", sf_dir)
    # props is not selected; the parquet scan must not read it
    assert "props" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_q4_semi_join_no_lineitem_columns_survive(spark, sf_dir):
    plan = _plan(spark, "q4_order_priority", sf_dir)
    assert "LeftSemi" in plan, "EXISTS must lower to a semi join"
    assert "CartesianProduct" not in plan
    # lineitem contributes only the join keys: the scan reads 2 columns
    read_schemas = [
        seg.split("\n")[0] for seg in plan.split("ReadSchema: ")[1:]
    ]
    li_scans = [s for s in read_schemas if "l_orderkey" in s]
    assert li_scans and all("l_extendedprice" not in s for s in li_scans)


def test_q10_broadcasts_nation_and_pushes_returnflag(spark, sf_dir):
    plan = _plan(spark, "q10_returned_items", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(l_returnflag,R)" in plan, "filter must reach the scan"
    assert "CartesianProduct" not in plan


def test_q18_aggregates_before_join(spark, sf_dir):
    plan = _plan(spark, "q18_large_orders", sf_dir)
    # the quantity rollup must appear below the joins (aggregate-then-join),
    # with a map-side partial aggregate before its exchange
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    assert plan.count("HashAggregate") >= 2, "partial+final aggregate expected"


def test_asof_join_semantics(spark):
    import pyspark.sql.functions as F

    from pipelinewise_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (3, 1, 999.0)],
        "k long, t long, px double",
    )
    out = {
        (r.k, r.t): r.px
        for r in asof_join(left, right, by=["k"], on="t").collect()
    }
    # equal instant matches (<=); earlier rows get NULL; absent key gets NULL
    assert out == {(1, 10): 100.0, (1, 20): 150.0, (1, 5): None, (2, 7): None}

    # colliding value columns must be rejected, not silently renamed
    try:
        asof_join(left, right.withColumnRenamed("px", "tag"), ["k"], "t")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "collide" in str(e)

    # one shuffle + one sort: no join operator at all in the plan
    plan_df = asof_join(left, right, by=["k"], on="t")
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan and "Window" in plan


def test_range_join_bucketed_no_nested_loop(spark, sf_dir):
    plan = _plan(spark, "range_join_attribution", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_range_join_exact_pairs(spark):
    from pipelinewise_spark.operators.rangejoin import range_join

    points = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 150), (2, 100)], "k long, t long"
    )
    iv = spark.createDataFrame(
        [(1, 90, 160, "w1"), (1, 140, 300, "w2"), (2, 0, 50, "w3")],
        "k long, s long, e long, tag string",
    )
    got = {
        (r.k, r.t, r.tag)
        for r in range_join(points, iv, "t", "s", "e", by=["k"],
                            bucket_width=50).collect()
    }
    # boundary-inclusive on both ends; (point, interval) pairs never dupe
    # even when an interval spans several buckets
    assert got == {(1, 100, "w1"), (1, 150, "w1"), (1, 150, "w2")}


def test_curation_pipeline_stays_jvm_side(spark, sf_dir):
    """The whole gopher->scrub->dedup->shard chain is Column expressions:
    no Python evaluation anywhere in the plan. The shard stage's prefix-sum
    prefix is a lazy localCheckpoint (its scan+window materialize once at
    the offsets collect), so the visible plan is the checkpoint read plus
    pure projections."""
    plan = _plan(spark, "curation_pipeline_documents", sf_dir)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SinglePartition" not in plan
    assert "localCheckpoint" in plan  # prefix-sum materialized, not re-run


def test_q6_all_predicates_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, "q6_forecast_revenue", sf_dir)
    for frag in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_quantity,24.0)",
                 "GreaterThanOrEqual(l_discount,0.05)"):
        assert frag in plan, f"q6: {frag} must reach the parquet scan"
    # single global agg: exactly one tiny shuffle (partial -> final)
    assert plan.count("Exchange") <= 2


def test_q19_single_side_conjuncts_extracted(spark, sf_dir):
    # Catalyst must extract brand/size (part side) and quantity (lineitem
    # side) from the OR-of-ANDs and push them below the join
    plan = _plan(spark, "q19_disjunctive_revenue", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "And(EqualTo(p_brand,Brand#12)" in plan, (
        "part-side disjunct union must be pushed to the part scan"
    )
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan, (
        "lineitem-side quantity range union must be pushed to the scan"
    )


def test_q21_no_lineitem_self_join(spark, sf_dir):
    # the EXISTS/NOT-EXISTS pair is decorrelated into one per-order
    # aggregate: the plan must contain NO semi/anti join of lineitem
    # against itself
    plan = _plan(spark, "q21_waiting_suppliers", sf_dir)
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "CartesianProduct" not in plan


def test_q22_anti_join_and_broadcast_scalar(spark, sf_dir):
    plan = _plan(spark, "q22_global_sales_opportunity", sf_dir)
    assert "LeftAnti" in plan, "NOT EXISTS must compile to an anti join"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q8_q9_dims_broadcast_no_cartesian(spark, sf_dir):
    for name in ("q8_national_market_share", "q9_product_type_profit"):
        plan = _plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_session_window_single_shuffle(spark, sf_dir):
    plan = _plan(spark, "session_window_events", sf_dir)
    # session aggregation: one exchange on the session key group
    assert plan.count("Exchange") <= 2, plan
    assert "UpdatingSessionsIterator" in plan or "SessionWindow" in plan or \
        "session_window" in plan
