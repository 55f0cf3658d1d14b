"""Plan pins for the r11 operators — the shapes the docstrings promise:

- domain_cap_mix: per-domain ranking rides the range-partitioned
  group_prefix_sum (no per-domain Window funnel task on the corpus),
  domain counts and the corpus total join BROADCAST, no cartesian
  product beyond the 1-row total.
- ranking_metrics: pure groupBy/join lattice — no Window at all, no
  SinglePartition exchange (every aggregate is query-keyed).
- bounded_bucket_candidates plan pin lives in tests/test_bounded_pairs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipelinewise_spark.functions.curation import domain_cap_mix
from pipelinewise_spark.functions.retrieval import ranking_metrics


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_domain_cap_plan_broadcasts_and_no_corpus_window(spark):
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", i % 7) for i in range(300)],
        "id long, dom string, q long",
    )
    out = domain_cap_mix(df, "dom", "id", 200_000, quality_col="q")
    out.collect()  # group_prefix_sum materializes its offset table
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    # the only Window in the plan is the per-(pid, domain) running sum
    # inside group_prefix_sum — partitioned, never a bare
    # Window.partitionBy(domain) over the corpus
    assert "Window" not in plan or "__pid" in plan


def test_domain_cap_null_quality_ranks_worst(spark):
    df = spark.createDataFrame(
        [(1, "d", 5), (2, "d", None), (3, "d", 9)],
        "id long, dom string, q int",
    )
    out = domain_cap_mix(
        df, "dom", "id", 670_000, quality_col="q"
    )  # cap: rank*1e6 <= 3*670000 -> rank <= 2
    kept = sorted(r["id"] for r in out.collect())
    # null quality is WORST: docs 3 (q=9) and 1 (q=5) survive, 2 drops
    assert kept == [1, 3]


def test_ranking_metrics_plan_no_window_no_single_partition(spark):
    results = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "query_id string, doc_id int, rank int"
    )
    qrels = spark.createDataFrame(
        [("q", 1, 1.0)], "query_id string, doc_id int, grade double"
    )
    plan = _plan(ranking_metrics(results, qrels, k=2))
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_ranking_metrics_duplicate_qrels_collapse_to_max(spark):
    results = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "query_id string, doc_id int, rank int"
    )
    qrels = spark.createDataFrame(
        [("q", 1, 1.0), ("q", 1, 3.0)],  # duplicate judgment
        "query_id string, doc_id int, grade double",
    )
    row = ranking_metrics(results, qrels, k=2).collect()[0]
    # one hit, one relevant doc (not two), grade 3 wins in the ideal
    assert row["hits_at_k"] == 1 and row["n_relevant"] == 1
    assert row["recall_ppm"] == 1_000_000
    assert row["ndcg"] == 1.0  # dcg = 3/log2(2) = idcg
