"""Pins for the bounded-emit near-dup pair guard
(functions/dedup.py:bounded_bucket_candidates): per-bucket emission is
linear on dense buckets, C(n,2) fidelity on sparse ones, and connected
components over the guarded pairs equal the unguarded components on a
replica corpus — the contract the cluster consumers (dedup_clusters,
resolve_duplicates, cluster_aware_split) rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipelinewise_spark.functions.clusters import dedup_clusters
from pipelinewise_spark.functions.dedup import (
    bounded_bucket_candidates,
    minhash_lsh_pairs,
)
from pipelinewise_spark.functions.similarity import signlsh_near_dup_pairs


def _replica_corpus(spark):
    """10 exact replicas of one text + 6 distinct texts, with two of the
    distinct ones near-dup of each other."""
    rep = "the quick brown fox jumps over the lazy dog again and again"
    near_a = "completely different words live in this document body here"
    near_b = "completely different words live in this document body there"
    rows = [(i, rep) for i in range(10)]
    rows += [(100, near_a), (101, near_b)]
    rows += [
        (200 + i, f"unique text number {i} with nothing shared at all "
                  f"token{i} filler{i} pad{i} extra{i}")
        for i in range(4)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bounded_emission_is_linear_on_dense_buckets(spark):
    df = _replica_corpus(spark)
    full = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.3)
    capped = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.3, max_pairs_per_bucket=5
    )
    n_full = full.count()
    n_capped = capped.count()
    # 10 replicas: full mode emits all C(10,2)=45 replica pairs (+ the
    # near-dup pair); spanning mode emits the 9 consecutive pairs
    assert n_full >= 45
    assert n_capped < n_full
    rep_pairs = capped.filter(F.col("id_b") < 100).collect()
    assert len(rep_pairs) == 9
    assert sorted((r["id_a"], r["id_b"]) for r in rep_pairs) == [
        (i, i + 1) for i in range(9)
    ]
    # every emitted spanning pair of exact replicas verifies at 1.0
    assert all(r["jaccard"] == 1.0 for r in rep_pairs)


def test_bounded_pairs_preserve_clusters(spark):
    df = _replica_corpus(spark)
    full = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.3)
    capped = minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.3, max_pairs_per_bucket=5
    )
    cc_full = {
        (r["node"], r["component"])
        for r in dedup_clusters(full).collect()
    }
    cc_capped = {
        (r["node"], r["component"])
        for r in dedup_clusters(capped).collect()
    }
    assert cc_full == cc_capped
    # the replica component survives whole: 0..9 all labelled 0
    assert {(i, 0) for i in range(10)} <= cc_capped
    # and the sparse-bucket near-dup pair is untouched by the guard
    assert (101, 100) in cc_capped


def test_bounded_candidates_sparse_buckets_keep_full_pairs(spark):
    bands = spark.createDataFrame(
        [(1, "k1"), (2, "k1"), (3, "k1"),          # C(3,2)=3 <= cap
         (10, "k2"), (11, "k2"), (12, "k2"), (13, "k2")],  # C(4,2)=6 > cap
        "id long, band_key string",
    )
    out = sorted(
        (r["id_a"], r["id_b"])
        for r in bounded_bucket_candidates(bands, "id", 3).collect()
    )
    assert out == [
        (1, 2), (1, 3), (2, 3),            # full fidelity in k1
        (10, 11), (11, 12), (12, 13),      # spanning path in k2
    ]


def test_signlsh_bounded_guard_preserves_replica_clusters(spark):
    base = [0.5, -0.25, 1.0, 0.125] + [0.0] * 60
    other = [-1.0, 0.5, -0.25, 2.0] + [0.0] * 60
    rows = [(i, base) for i in range(8)] + [(50, other), (51, other)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    full = signlsh_near_dup_pairs(df, "id", "vec", threshold=0.9)
    capped = signlsh_near_dup_pairs(
        df, "id", "vec", threshold=0.9, max_pairs_per_bucket=3
    )
    assert full.count() > capped.count()
    cc_full = {
        (r["node"], r["component"])
        for r in dedup_clusters(full, "a_id", "b_id").collect()
    }
    cc_capped = {
        (r["node"], r["component"])
        for r in dedup_clusters(capped, "a_id", "b_id").collect()
    }
    assert cc_full == cc_capped
    assert {(i, 0) for i in range(8)} <= cc_capped


def test_bounded_pairs_plan_single_bucket_exchange(spark):
    """The guard's count + lead windows and the sparse self-join all ride
    the band-key partitioning — no cartesian product anywhere."""
    bands = spark.createDataFrame(
        [(1, "k"), (2, "k")], "id long, band_key string"
    )
    plan = bounded_bucket_candidates(bands, "id", 10)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
