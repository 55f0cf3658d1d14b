"""MMR diversified retrieval (functions/similarity.py:mmr_diversify_topk).

Reference behavior from the public MMR formulation (Carbonell & Goldstein,
SIGIR'98); beyond-reference retrieval capability. The full greedy loop is
also value-exactly replayed by the DuckDB recursive-CTE oracle
(queries/llmdata.py:_mmr_oracle) at sf0.001/sf0.01 via tests/test_correctness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.functions import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_first_pick_is_top_relevance(emb):
    """With nothing selected, the diversity term is 0 for every candidate,
    so MMR's first pick must equal exact top-1."""
    queries = emb.filter(F.col("vec_id") < 10)
    mmr = S.mmr_diversify_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in S.cosine_topk(emb, queries, "vec_id", "embedding", k=1).collect()
    }
    first = {r["query_id"]: r["neighbor_id"] for r in mmr if r["mmr_rank"] == 1}
    assert first == top1


def test_rank_shape_and_membership(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    mmr = S.mmr_diversify_topk(
        emb, queries, "vec_id", "embedding", k=5, pool=15
    ).collect()
    pool = S.cosine_topk(emb, queries, "vec_id", "embedding", k=15).collect()
    pool_set = {(r["query_id"], r["neighbor_id"]) for r in pool}
    per_q: dict[int, list[int]] = {}
    for r in mmr:
        assert (r["query_id"], r["neighbor_id"]) in pool_set
        assert r["query_id"] != r["neighbor_id"]
        per_q.setdefault(r["query_id"], []).append(r["mmr_rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_lambda_one_is_plain_topk(emb):
    """lam=1 removes the diversity term entirely: MMR degrades to the exact
    relevance ranking."""
    queries = emb.filter(F.col("vec_id") < 5)
    mmr = S.mmr_diversify_topk(
        emb, queries, "vec_id", "embedding", k=5, pool=15, lam=1.0
    ).collect()
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    assert {(r["query_id"], r["neighbor_id"], r["mmr_rank"]) for r in mmr} == {
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in exact
    }


def test_diversification_changes_order(emb):
    """With a strong diversity weight the greedy must at some point prefer
    a less-relevant-but-less-redundant candidate: the selected SET at
    lam=0.2 differs from plain top-k for at least one query (the synthetic
    embeddings are label-clustered, so top pools contain near-duplicates)."""
    queries = emb.filter(F.col("vec_id") < 10)
    mmr = S.mmr_diversify_topk(
        emb, queries, "vec_id", "embedding", k=5, pool=15, lam=0.2
    ).collect()
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=5).collect()
    m = {(r["query_id"], r["neighbor_id"]) for r in mmr}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    assert m != e
