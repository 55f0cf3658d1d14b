"""Plan-shape pins for the r10 second-wave operators.

- transition_matrix: one entity-keyed window (hash exchange), matrix
  totals joined BROADCAST, no `Exchange SinglePartition` (the lead()
  window partitions by entity; a global-order variant would funnel one
  task), no cartesian.
- k_anonymity_report: one hash aggregate on the quasi tuple — no joins,
  no windows, no SinglePartition.
- data_card: the token-count quantiles ride the distributed rank
  (operators/rank.py) — the only `Exchange SinglePartition` nodes in
  the composed card are the final reduces of map-side-combined SCALAR
  aggregates (child = partial HashAggregate, #partitions rows), never
  a global-sort window.
"""

from __future__ import annotations

from pipelinewise_spark.sources.files import read_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_transition_matrix_plan(spark):
    from pipelinewise_spark.operators.transitions import transition_matrix

    ev = read_table(spark, SF, "events")
    out = transition_matrix(ev, "user_id", "event_type", ["ts", "event_id"])
    plan = _plan(out)
    assert "SinglePartition" not in plan, plan
    assert "Cartesian" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan, plan


def test_k_anonymity_plan_single_aggregate(spark):
    from pipelinewise_spark.operators.compliance import k_anonymity_report

    cust = read_table(spark, SF, "customer")
    out = k_anonymity_report(
        cust, ["c_nationkey", "c_mktsegment"], "c_acctbal", k=10
    )
    plan = _plan(out)
    assert "SinglePartition" not in plan, plan
    assert "Join" not in plan, plan


def test_data_card_plan_single_partition_only_for_scalar_reduces(spark):
    from pipelinewise_spark.operators.datacard import data_card

    d = read_table(spark, SF, "documents")
    out = data_card(d, "doc_id", "text", mix_cols=("lang", "source"))
    plan = _plan(out)
    assert "Cartesian" not in plan, plan
    # The quantile section must ride the distributed rank, never a
    # global-sort window: every SinglePartition exchange in the card is
    # the final reduce of a map-side-combined SCALAR aggregate (its
    # child is a partial HashAggregate carrying #partitions rows).
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert "partial" in child, f"non-aggregate SinglePartition:\n{ln}\n{child}"


def test_frequent_paths_single_window_node(spark):
    from pipelinewise_spark.operators.transitions import frequent_paths

    ev = read_table(spark, SF, "events")
    out = frequent_paths(ev, "user_id", "event_type", ["ts", "event_id"], n=3)
    plan = _plan(out)
    assert "Cartesian" not in plan, plan
    # both lead() columns ride ONE entity-keyed Window node; the only
    # other Window is the answer-sized rank over aggregated paths
    assert plan.count("Window") <= 2, plan


def test_tfidf_keywords_plan_keyed_no_cartesian(spark):
    from pipelinewise_spark.functions.retrieval import tfidf_keywords

    d = read_table(spark, SF, "documents")
    out = tfidf_keywords(d, "doc_id", "text", topk=3)
    plan = _plan(out)
    assert "Cartesian" not in plan, plan
    # the corpus-count scalar broadcasts; the df join is keyed
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_vocab_drift_topk_rides_distributed_rank(spark):
    from pipelinewise_spark.operators.drift import vocab_drift

    d = read_table(spark, SF, "documents")
    out = vocab_drift(
        d.filter("doc_id % 2 = 0"), d.filter("doc_id % 2 = 1"), "text",
        top_k=50,
    )
    plan = _plan(out)
    assert "Cartesian" not in plan, plan
    # every SinglePartition exchange is a scalar reduce (partial agg
    # child) — the vocabulary top-K must never globally sort one task
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        assert "partial" in child, f"non-aggregate SinglePartition:\n{ln}\n{child}"
