"""Product-quantization ANN (functions/similarity.py: pq_train_codebooks /
pq_encode / pq_topk).

Reference behavior derived from the public PQ/IVFPQ literature (Jégou et
al., "Product Quantization for Nearest Neighbor Search") — the reference
repo has no ANN surface; this is beyond-reference LLM-data capability.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.functions import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_codebook_shape_and_determinism(emb):
    cb1 = S.pq_train_codebooks(emb, "vec_id", "embedding", 4, 8, iterations=2)
    cb2 = S.pq_train_codebooks(emb, "vec_id", "embedding", 4, 8, iterations=2)
    assert len(cb1) == 4 and all(len(m) == 8 for m in cb1)
    assert all(len(c) == 16 for m in cb1 for c in m)  # 64 / 4 sub-dims
    assert cb1 == cb2  # lowest-id init + deterministic Lloyd: no RNG anywhere


def test_encode_compression_shape(emb):
    cb = S.pq_train_codebooks(emb, "vec_id", "embedding", 8, 16, iterations=1)
    codes = S.pq_encode(emb, "vec_id", "embedding", cb)
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:20]:
        assert len(r["codes"]) == 8
        assert all(1 <= c <= 16 for c in r["codes"])


def test_pq_topk_contract_and_recall(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    pq = S.pq_topk(emb, queries, "vec_id", "embedding", k=3).collect()
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=3).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    # schema/rank contract
    per_q: dict[int, list[int]] = {}
    for r in pq:
        assert r["query_id"] != r["neighbor_id"]
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {r["query_id"] for r in exact}
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())
    # recall: well above the 0.5 driver contract bound (measured ~0.8)
    hits = sum((r["query_id"], r["neighbor_id"]) in ex for r in pq)
    assert hits / len(ex) >= 0.6
    # the re-rank stage emits the EXACT rounded cosine for every hit —
    # identical to the brute-force scorer's value
    exact_cos = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in exact}
    for r in pq:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert r["cos"] == exact_cos[key]


def test_refine_everything_equals_exact(emb):
    """With the shortlist as deep as the corpus, PQ degrades to the exact
    scorer — the ADC stage can only reorder candidates, never drop them."""
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 5)
    pq = S.pq_topk(emb, queries, "vec_id", "embedding", k=3, refine=n).collect()
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=3).collect()
    assert {(r["query_id"], r["neighbor_id"], r["rank"]) for r in pq} == {
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in exact
    }


def test_pq_index_lifecycle(spark, emb, tmp_path):
    """Build on 2/3, extend with 1/3: the code table covers the full corpus,
    codebooks are unchanged by extension, and the probe against the index
    equals the in-plan pq_topk with the same codebook training set."""
    import json

    from pipelinewise_spark.operators.fsio import MetaFS

    path = str(tmp_path / "pqidx")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    rest = emb.filter(F.col("vec_id") % 3 == 0)
    S.build_pq_index(base, path, "vec_id", "embedding")
    meta_before = json.loads(MetaFS(path).read_text("_pq_index.json"))
    S.extend_pq_index(rest, path, "embedding")
    meta_after = json.loads(MetaFS(path).read_text("_pq_index.json"))
    assert meta_before["codebooks"] == meta_after["codebooks"]
    codes = spark.read.parquet(MetaFS(path).uri("codes-0000"))
    assert codes.count() == emb.count()
    assert codes.select("vec_id").distinct().count() == emb.count()
    queries = emb.filter(F.col("vec_id") < 5)
    out = S.pq_topk_against_index(
        spark, path, emb, queries, "embedding", k=3, refine=64
    ).collect()
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=3).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    hits = sum((r["query_id"], r["neighbor_id"]) in ex for r in out)
    assert hits / len(ex) >= 0.5


def test_probe_set_guard_raises_on_corpus_sized_queries(spark):
    """r12: the ADC query-vector collect is bounded — a corpus-sized
    probe set raises with guidance instead of materializing on the
    driver."""
    import pytest

    from pipelinewise_spark.functions.similarity import pq_topk

    n, dim = 60, 8
    vecs = spark.range(n).select(
        F.col("id"),
        F.array(*[
            (F.col("id") % (i + 3)).cast("double") + F.lit(0.1)
            for i in range(dim)
        ]).alias("emb"),
    )
    with pytest.raises(ValueError, match="max_queries"):
        pq_topk(
            vecs, vecs, "id", "emb", k=2, num_subspaces=2,
            codes_per_subspace=4, dim=dim, max_queries=10,
        )
