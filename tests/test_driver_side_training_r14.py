"""Round-14 optimization equivalence tests: the guarded driver-side
fast paths (BPE merge loop, PQ codebook training, IVF k-means) must
produce the same results as the distributed loops they shortcut, and
the distributed fallbacks must still engage above the bound."""

from __future__ import annotations

import pytest

from pipelinewise_spark.sources.files import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_bpe_driver_path_equals_distributed(spark, monkeypatch):
    from pipelinewise_spark.functions.bpe import bpe_train

    d = read_table(spark, SF_DIR, "documents").limit(60)
    monkeypatch.setenv("PWS_BPE_MAX_DRIVER_VOCAB", "0")  # force distributed
    dist = bpe_train(d, "text", num_merges=6)
    monkeypatch.setenv("PWS_BPE_MAX_DRIVER_VOCAB", "65536")  # driver path
    loc = bpe_train(d, "text", num_merges=6)
    assert loc == dist and len(loc) == 6


def test_bpe_encode_driver_path_equals_distributed(spark, monkeypatch):
    from pipelinewise_spark.functions.bpe import bpe_encode_counts, bpe_train

    d = read_table(spark, SF_DIR, "documents").limit(40)
    merges = bpe_train(d, "text", num_merges=5)

    def rows(df):
        return sorted(
            (r["doc_id"], r["n_words"], r["n_subwords"])
            for r in df.collect()
        )

    monkeypatch.setenv("PWS_BPE_MAX_DRIVER_VOCAB", "0")
    dist = rows(bpe_encode_counts(d, "doc_id", "text", merges))
    monkeypatch.setenv("PWS_BPE_MAX_DRIVER_VOCAB", "65536")
    loc = rows(bpe_encode_counts(d, "doc_id", "text", merges))
    assert loc == dist


def test_bpe_fallback_engages_above_bound(spark, monkeypatch):
    """A vocabulary larger than the bound must take the distributed loop
    (take() returns bound+1 rows) — same merges either way."""
    from pipelinewise_spark.functions.bpe import bpe_train

    d = read_table(spark, SF_DIR, "documents").limit(30)
    monkeypatch.setenv("PWS_BPE_MAX_DRIVER_VOCAB", "3")  # tiny bound
    small_bound = bpe_train(d, "text", num_merges=4)
    monkeypatch.setenv("PWS_BPE_MAX_DRIVER_VOCAB", "65536")
    driver = bpe_train(d, "text", num_merges=4)
    assert small_bound == driver


def test_pq_codebooks_driver_close_to_distributed(spark, monkeypatch):
    """Codebook training: driver numpy means may differ from Spark's
    partial aggregation only in float summation order — assert elementwise
    closeness, and that assignments under both codebooks agree."""
    from pipelinewise_spark.functions.similarity import pq_train_codebooks

    emb = read_table(spark, SF_DIR, "embeddings")
    monkeypatch.setenv("PWS_ANN_MAX_DRIVER_TRAIN", "0")
    dist = pq_train_codebooks(emb, "vec_id", "embedding", 8, 16)
    monkeypatch.setenv("PWS_ANN_MAX_DRIVER_TRAIN", "65536")
    loc = pq_train_codebooks(emb, "vec_id", "embedding", 8, 16)
    assert len(loc) == len(dist) == 8
    for m in range(8):
        assert len(loc[m]) == len(dist[m]) == 16
        for c in range(16):
            for a, b in zip(loc[m][c], dist[m][c]):
                assert a == pytest.approx(b, abs=1e-9)


def test_ivf_centroids_driver_close_to_distributed(spark, monkeypatch):
    from pipelinewise_spark.functions.similarity import ivf_assign

    emb = read_table(spark, SF_DIR, "embeddings")
    monkeypatch.setenv("PWS_ANN_MAX_DRIVER_TRAIN", "0")
    _, cent_d = ivf_assign(emb, "vec_id", "embedding", num_centroids=8)
    monkeypatch.setenv("PWS_ANN_MAX_DRIVER_TRAIN", "65536")
    assign_l, cent_l = ivf_assign(emb, "vec_id", "embedding", num_centroids=8)
    d = {r["centroid_id"]: list(r["centroid"]) for r in cent_d.collect()}
    l = {r["centroid_id"]: list(r["centroid"]) for r in cent_l.collect()}
    assert set(d) == set(l)
    for cid in d:
        for a, b in zip(l[cid], d[cid]):
            assert a == pytest.approx(b, abs=1e-9)
    # every corpus vector still gets exactly one assignment
    n = emb.count()
    assert assign_l.count() == n
