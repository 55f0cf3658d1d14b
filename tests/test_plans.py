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
