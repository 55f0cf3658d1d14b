"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — broadcast the (small) query set
  against the (huge) corpus; one scan, one per-query top-k window. The
  baseline and the verifier for approximate methods.
- ``lsh_buckets``: random-hyperplane (sign) LSH — deterministic ±1
  hyperplanes derived from sha256 so results are reproducible and
  oracle-checkable. The 100 TB path: bucket once (narrow projection), then
  search within buckets (candidates ≪ corpus).

All math is double-precision fold-left dot products via built-in higher-order
functions (zip_with/aggregate) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipelinewise_spark.partitioning import spread

DIM = 64
NUM_PLANES = 8


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential fold-left dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query vector (query_id, neighbor_id, cos, rank).

    The query side broadcasts; the corpus is scanned once. Cos is rounded to
    ``round_to`` decimals and ranking ties break on neighbor id, so results
    are engine-independent despite FP summation-order differences.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("__qv"), F.col("__cv")), round_to))
        .drop("__qv", "__cv")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplanes(num_planes: int = NUM_PLANES, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix from sha256 bits (pure function)."""
    planes = []
    for p in range(num_planes):
        row: list[int] = []
        counter = 0
        while len(row) < dim:
            digest = hashlib.sha256(f"plane:{p}:{counter}".encode()).digest()
            for byte in digest:
                for bit in range(8):
                    if len(row) >= dim:
                        break
                    row.append(1 if (byte >> bit) & 1 else -1)
            counter += 1
        planes.append(row)
    return planes


def with_lsh_bucket(
    df: DataFrame,
    vec_col: str,
    num_planes: int = NUM_PLANES,
    dim: int = DIM,
    out_col: str = "bucket",
) -> DataFrame:
    """Append the sign-LSH bucket (Σ_j [v·plane_j > 0]·2^j) as a column —
    narrow projection, no shuffle, keeps every input column so callers
    don't need a join-back to recover the vector."""
    planes = hyperplanes(num_planes, dim)
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(v, p) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return df.withColumn(out_col, bucket.cast("bigint"))


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_planes: int = NUM_PLANES,
    dim: int = DIM,
) -> DataFrame:
    """(id, bucket) — bucket = Σ_j [v·plane_j > 0]·2^j. Narrow projection,
    no shuffle; bucketing 100 TB of embeddings is a single map stage."""
    return with_lsh_bucket(
        spread(df), vec_col, num_planes=num_planes, dim=dim
    ).select(F.col(id_col), "bucket")


def signlsh_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    bands: int = 4,
    planes_per_band: int = 4,
    dim: int = DIM,
    round_to: int = 6,
    max_pairs_per_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded sign-LSH — the
    embedding analog of MinHash banding (functions/dedup.py): a pair is a
    candidate iff it agrees on *every* hyperplane sign in at least one band;
    candidates (≪ corpus²) are then verified with the exact cosine and kept
    at ``cos >= threshold``. Returns (a_id, b_id, cos), a_id < b_id.

    Scale: candidate generation is a self-equi-join on (band, key) — one
    shuffle, never all-pairs. ``planes_per_band`` tunes the precision/recall
    knee exactly like MinHash band width: real near-dup corpora
    (cos >= ~0.9) want 16+ planes per band, which keeps every bucket tiny at
    100 TB; the small default (4) suits weakly-similar corpora like the
    synthetic test vectors. Hot buckets (degenerate embeddings, e.g.
    all-zero vectors from failed encodes) take the same salted-grid
    treatment as ngram_jaccard's blocked join (functions/dedup.py:226-309).

    ``max_pairs_per_bucket`` is the replica-corpus emission guard shared
    with the MinHash path (functions/dedup.py:bounded_bucket_candidates):
    buckets past the cap emit a spanning path (n−1 consecutive-id pairs)
    instead of C(n,2) — exact-replica components survive intact (every
    consecutive pair verifies at cos 1.0), so cluster consumers are
    unaffected while the answer stops being output-quadratic.
    """
    planes = hyperplanes(bands * planes_per_band, dim)
    df = spread(df)
    v = _as_double(F.col(vec_col))
    band_keys = []
    for b in range(bands):
        key = F.lit(0)
        for j in range(planes_per_band):
            plane = planes[b * planes_per_band + j]
            p = F.array(*[F.lit(float(x)) for x in plane])
            key = key + F.when(dot(v, p) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        band_keys.append(
            F.struct(F.lit(b).alias("band"), key.cast("int").alias("key"))
        )
    # candidate generation and dedupe carry ONLY id pairs — at 100 TB the
    # multi-band dedupe shuffle moves (long, long) rows, not embedding
    # payloads; vectors are joined back just for the verify stage
    tagged = df.select(
        F.col(id_col), F.explode(F.array(*band_keys)).alias("bk")
    )
    if max_pairs_per_bucket is not None:
        from pipelinewise_spark.functions.dedup import (
            bounded_bucket_candidates,
        )

        cand = bounded_bucket_candidates(
            tagged, id_col, max_pairs_per_bucket, bucket_col="bk"
        ).withColumnsRenamed({"id_a": "a_id", "id_b": "b_id"})
    else:
        left = tagged.select(F.col(id_col).alias("a_id"), "bk")
        right = tagged.select(
            F.col(id_col).alias("b_id"), F.col("bk").alias("__bk2")
        )
        cand = (
            left.join(
                right,
                (F.col("bk") == F.col("__bk2"))
                & (F.col("a_id") < F.col("b_id")),
            )
            # a pair matching in several bands is one candidate — dedupe
            # BEFORE the (expensive) exact-cosine verify
            .select("a_id", "b_id")
            .dropDuplicates(["a_id", "b_id"])
        )
    # pair rows are tiny in bytes but each costs a 64-dim fold in the verify
    # stage — AQE's byte-based coalesce would starve the CPU here (observed:
    # 3 post-coalesce partitions on 32 cores). Re-spread the narrow frame.
    cand = cand.repartition(df.sparkSession.sparkContext.defaultParallelism)
    # norms are per-vector, not per-pair: precompute once in the side frames
    # (bit-identical to inline cosine() — same sqrt(dot(v,v)) expression,
    # just evaluated |V| times instead of |candidates| times)
    dv = _as_double(F.col(vec_col))
    va = df.select(
        F.col(id_col).alias("a_id"),
        dv.alias("__av"),
        F.sqrt(dot(dv, dv)).alias("__an"),
    )
    vb = df.select(
        F.col(id_col).alias("b_id"),
        dv.alias("__bv"),
        F.sqrt(dot(dv, dv)).alias("__bn"),
    )
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .withColumn(
            "cos",
            F.round(
                dot(F.col("__av"), F.col("__bv"))
                / (F.col("__an") * F.col("__bn")),
                round_to,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )


def signlsh_near_dup_pairs_against(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    bands: int = 4,
    planes_per_band: int = 4,
    dim: int = DIM,
    round_to: int = 6,
) -> DataFrame:
    """Incremental embedding near-dup: pairs (a_id ∈ corpus, b_id ∈ batch,
    cos >= threshold) — check a NEW ingest batch against the standing
    corpus without re-pairing the corpus against itself (the embedding
    twin of ``dedup.minhash_lsh_pairs_against``).

    Scale shape: the corpus side's band keys ARE the materialized sign-LSH
    index (at 100 TB: built once per corpus, re-derived here in-plan); the
    per-batch cost is bucketing the batch (one map stage), a band-key
    equi-join — the batch side broadcasts when small — and exact-cosine
    verification on candidates only. Corpus self-pairs never form, so
    ingest-dedup cost is O(batch × collision rate), not O(corpus²).
    Returns (a_id, b_id, cos).
    """
    planes = hyperplanes(bands * planes_per_band, dim)

    def band_tagged(df: DataFrame, alias: str) -> DataFrame:
        v = _as_double(F.col(vec_col))
        keys = []
        for b in range(bands):
            key = F.lit(0)
            for j in range(planes_per_band):
                plane = planes[b * planes_per_band + j]
                p = F.array(*[F.lit(float(x)) for x in plane])
                key = key + F.when(dot(v, p) > 0, F.lit(1 << j)).otherwise(
                    F.lit(0)
                )
            keys.append(
                F.struct(F.lit(b).alias("band"), key.cast("int").alias("key"))
            )
        return df.select(
            F.col(id_col).alias(alias), F.explode(F.array(*keys)).alias("bk")
        )

    cand = (
        band_tagged(spread(corpus), "a_id")
        .join(band_tagged(batch, "b_id"), "bk")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    cand = cand.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    )
    dv = _as_double(F.col(vec_col))
    va = corpus.select(
        F.col(id_col).alias("a_id"),
        dv.alias("__av"),
        F.sqrt(dot(dv, dv)).alias("__an"),
    )
    vb = batch.select(
        F.col(id_col).alias("b_id"),
        dv.alias("__bv"),
        F.sqrt(dot(dv, dv)).alias("__bn"),
    )
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .withColumn(
            "cos",
            F.round(
                dot(F.col("__av"), F.col("__bv"))
                / (F.col("__an") * F.col("__bn")),
                round_to,
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", "cos")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    num_planes: int = NUM_PLANES,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): partition
    the embedding space into buckets (here the deterministic sign-LSH
    coarse clustering; the paper uses k-means), then flag a vector as a
    semantic duplicate iff some SMALLER-id vector in the same bucket has
    cosine ≥ ``threshold`` — keep-first greedy, so exactly one survivor
    per duplicate group ordered by id, with no iterative connected
    components. Returns (id, bucket, is_semantic_dup).

    Scale shape: candidate pairs form ONLY within a bucket (the whole
    point of SemDeDup — the clustering bounds the quadratic term to
    Σ|bucket|², never corpus²); the pair join shuffles on the bucket key
    and the flag folds back as one aggregated semi-join. Cosine is 6-dp
    rounded so the ≥ comparison cannot flip between engines.
    """
    e = with_lsh_bucket(spread(df), vec_col, num_planes=num_planes)
    a = e.select(
        F.col(id_col), F.col(vec_col).alias("__av"), "bucket"
    )
    b = e.select(
        F.col(id_col).alias("__bid"),
        F.col(vec_col).alias("__bv"),
        F.col("bucket").alias("__b2"),
    )
    dup_ids = (
        a.join(
            b,
            (F.col("bucket") == F.col("__b2"))
            & (F.col("__bid") < F.col(id_col)),
        )
        .filter(
            F.round(cosine(F.col("__av"), F.col("__bv")), 6)
            >= F.lit(float(threshold))
        )
        .select(F.col(id_col))
        .distinct()
        .withColumn("__isdup", F.lit(True))
    )
    return (
        e.select(id_col, "bucket")
        .join(dup_ids, id_col, "left")
        .select(
            id_col,
            "bucket",
            F.coalesce(F.col("__isdup"), F.lit(False)).alias(
                "is_semantic_dup"
            ),
        )
    )


def semantic_decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.4,
    num_planes: int = NUM_PLANES,
) -> DataFrame:
    """Cross-corpus SEMANTIC decontamination: flag a training vector iff
    some EVAL vector in the same sign-LSH bucket has cosine ≥
    ``threshold`` — the embedding-space analogue of the n-gram
    decontaminate operator (paraphrased benchmark leakage that exact
    n-grams can't catch). Returns (id, bucket, is_contaminated) over the
    training side.

    Scale shape: the eval side is benchmark-sized (thousands of rows
    against a 100 TB corpus) — its bucketed form BROADCASTS, so the
    check is a map-side join over the training corpus: one scan, no
    corpus shuffle, candidates bounded per bucket. Cosine is 6-dp
    rounded so the ≥ comparison cannot flip between engines."""
    t = with_lsh_bucket(spread(train), vec_col, num_planes=num_planes)
    ev = with_lsh_bucket(evalset, vec_col, num_planes=num_planes).select(
        F.col(vec_col).alias("__ev"), F.col("bucket").alias("__eb")
    )
    hits = (
        t.join(F.broadcast(ev), F.col("bucket") == F.col("__eb"))
        .filter(
            F.round(cosine(F.col(vec_col), F.col("__ev")), 6)
            >= F.lit(float(threshold))
        )
        .select(F.col(id_col))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    return (
        t.select(id_col, "bucket")
        .join(hits, id_col, "left")
        .select(
            id_col,
            "bucket",
            F.coalesce(F.col("__hit"), F.lit(False)).alias(
                "is_contaminated"
            ),
        )
    )


def _ann_driver_train_bound() -> int:
    """Corpus size below which ANN coarse training (IVF k-means / PQ
    codebooks) runs driver-side on the collected vectors.

    Training state is centroids/codebooks — metadata-scale — but the
    distributed Lloyd loop pays per-iteration job+shuffle fixed costs
    that dwarf the arithmetic on small corpora. Below the bound the
    SAME numpy kernels run once on the driver (assignment math is the
    identical einsum/argmin; mean updates may differ from Spark's
    partial-aggregation only in float summation order, which the ANN
    contract tolerates by design — its output is the exact twin's
    values plus recall>=bound booleans with wide margins, measured
    ~0.8 vs bound 0.5). Above the bound (any real deployment at scale)
    the distributed loop runs unchanged. ``take(bound+1)`` keeps driver
    memory bounded either way. 0 disables the driver path."""
    import os

    try:
        return int(os.environ.get("PWS_ANN_MAX_DRIVER_TRAIN", "65536"))
    except ValueError:
        return 65536


def _ivf_train_local(
    rows, num_centroids: int, iterations: int
) -> list[tuple[int, list[float]]]:
    """Driver-side twin of ivf_assign's Lloyd loop over collected
    (id, vec) rows: init = the ``num_centroids`` lowest-id vectors
    (centroid_id 1..k in id order), per iteration assign-to-nearest
    (squared L2, ties to the lowest centroid_id — numpy argmin's
    first-match over cid-ascending columns) then element-wise member
    mean; clusters that lose all members drop out, exactly like the
    distributed groupBy."""
    rows = sorted(rows, key=lambda r: r["__id"])
    x = np.asarray([list(r["__v"]) for r in rows], dtype=np.float64)
    cids = list(range(1, min(num_centroids, len(rows)) + 1))
    cents = x[: len(cids)].copy()
    for _ in range(iterations):
        d = ((x[:, None, :] - cents[None]) ** 2).sum(axis=-1)  # (N, K)
        assign = d.argmin(axis=-1)
        new_cids: list[int] = []
        new_cents: list[np.ndarray] = []
        for j, cid in enumerate(cids):
            members = x[assign == j]
            if len(members):
                new_cids.append(cid)
                new_cents.append(members.mean(axis=0))
        cids = new_cids
        cents = np.asarray(new_cents)
    return [
        (cid, [float(v) for v in cents[j]]) for j, cid in enumerate(cids)
    ]


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_centroids: int = 16,
    iterations: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """IVF (inverted-file) coarse quantizer: deterministic k-means.

    Centroids init from the ``num_centroids`` lowest-id vectors (reproducible
    — no RNG), refined with a few Lloyd iterations executed as DataFrame
    joins/aggregations (each iteration: one broadcast join + one groupBy).
    Returns (assignments(id, centroid_id), centroids(centroid_id, centroid)).

    At 100 TB the assignment pass is a single map stage against broadcast
    centroids; search probes only the closest lists (see ``ivf_topk``).
    """
    v = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    bound = _ann_driver_train_bound()
    if bound > 0:
        sample = v.select(
            F.col(id_col).alias("__id"), F.col("__v")
        ).take(bound + 1)
        if len(sample) <= bound and len(sample) > 0:
            trained = _ivf_train_local(sample, num_centroids, iterations)
            spark = df.sparkSession
            centroids = spark.createDataFrame(
                trained, "centroid_id int, centroid array<double>"
            )
            return _assign_to_centroids(v, centroids), centroids
    centroids = (
        v.orderBy(id_col).limit(num_centroids)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("centroid_id"),
            F.col("__v").alias("centroid"),
        )
    )
    for _ in range(iterations):
        assigned = _assign_to_centroids(v, centroids)
        # new centroid = element-wise mean of member vectors
        centroids = (
            assigned.join(v, id_col)
            .groupBy("centroid_id")
            .agg(
                F.array(
                    *[
                        F.avg(F.element_at(F.col("__v"), i + 1)).alias(f"c{i}")
                        for i in range(DIM)
                    ]
                ).alias("centroid")
            )
        )
    # materialize the trained centroids once: they are num_centroids rows
    # of driver-scale metadata, but their LAZY plan nests every Lloyd
    # iteration — left unmaterialized, each consumer (assignment pass,
    # query-probe ranking) re-executes the whole k-means
    rows = centroids.collect()
    centroids = df.sparkSession.createDataFrame(rows, centroids.schema)
    return _assign_to_centroids(v, centroids), centroids


def _assign_to_centroids(v: DataFrame, centroids: DataFrame) -> DataFrame:
    scored = v.crossJoin(F.broadcast(centroids)).withColumn(
        "__d",
        F.aggregate(
            F.zip_with(F.col("__v"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    # nearest centroid via min(struct(d, id)) — lexicographic struct order
    # gives the same (distance asc, centroid_id asc) tie-break as a ranked
    # window, but as a partial-aggregatable groupBy: the per-vector
    # candidate set collapses map-side instead of sort-shuffling
    # num_centroids rows per vector every Lloyd iteration
    return (
        scored.groupBy(v.columns[0])
        .agg(
            F.min(
                F.struct(F.col("__d"), F.col("centroid_id"))
            ).alias("__best")
        )
        .select(v.columns[0], F.col("__best.centroid_id").alias("centroid_id"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    num_centroids: int = 16,
    n_probe: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """IVF ANN search: assign the corpus to inverted lists once, then probe
    only each query's ``n_probe`` closest lists with exact cosine."""
    assignments, centroids = ivf_assign(corpus, id_col, vec_col, num_centroids)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    )
    # query → its n_probe nearest centroid lists
    qc = q.crossJoin(F.broadcast(centroids)).withColumn(
        "__d",
        F.aggregate(
            F.zip_with(F.col("__qv"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__d").asc(), F.col("centroid_id"))
    probes = (
        qc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "centroid_id")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).join(
        assignments.select(
            F.col(id_col).alias("neighbor_id"), "centroid_id"
        ),
        "neighbor_id",
    )
    scored = (
        probes.join(c, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("__qv"), F.col("__cv")), round_to))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, exact cosine within.

    At scale this turns the O(|Q|·|C|) scan into O(candidates); recall is
    tunable via multiple tables/plane counts (multi-probe left to config).
    """
    cb = lsh_buckets(corpus, id_col, vec_col).alias("cb")
    qb = lsh_buckets(queries, id_col, vec_col).alias("qb")
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    cand = (
        qb.join(cb, F.col(f"qb.bucket") == F.col(f"cb.bucket"))
        .select(
            F.col(f"qb.{id_col}").alias("query_id"),
            F.col(f"cb.{id_col}").alias("neighbor_id"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("cos", F.round(cosine(F.col("__qv"), F.col("__cv")), round_to))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------- int8
def quantize_embeddings(
    df: DataFrame, vec_col: str, q_col: str = "q", scale_col: str = "q_scale"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v| / 127,
    q[i] = round(v[i] / scale) clamped to [-127, 127]. Cuts ANN working-set
    memory 4x (float32 -> int8) — at 100 TB of embeddings the difference
    between spilling and staying resident. Pure higher-order Column
    expressions; the zero vector quantizes to zeros with scale 0."""
    v = _as_double(F.col(vec_col))
    absmax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = absmax / F.lit(127.0)
    q = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0).cast("int"))).otherwise(
        F.transform(
            v,
            lambda x: F.least(
                F.greatest(F.round(x / scale, 0), F.lit(-127.0)),
                F.lit(127.0),
            ).cast("int"),
        )
    )
    return df.withColumn(q_col, q).withColumn(scale_col, scale)


def cosine_quantized(
    qa: Column, sa: Column, qb: Column, sb: Column
) -> Column:
    """Cosine from two int8-quantized vectors (+ their scales): integer
    dot products scaled back — the scales cancel in the ratio, so this is
    exactly the cosine of the DEQUANTIZED vectors."""
    a = F.transform(qa, lambda x: x.cast("double"))
    b = F.transform(qb, lambda x: x.cast("double"))
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def quantized_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
) -> DataFrame:
    """Brute-force top-k over int8-quantized embeddings — same plan shape
    as cosine_topk (broadcast queries, one corpus scan) on 1/4 the bytes.
    Recall vs the exact float path is error-bounded in
    tests/test_quantized.py."""
    qc = quantize_embeddings(corpus, vec_col)
    qq = quantize_embeddings(queries, vec_col)
    q = qq.select(
        F.col(id_col).alias("query_id"),
        F.col("q").alias("__qv"),
        F.col("q_scale").alias("__qs"),
    )
    c = qc.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("q").alias("__cv"),
        F.col("q_scale").alias("__cs"),
    )
    joined = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine_quantized(
                F.col("__qv"), F.col("__qs"), F.col("__cv"), F.col("__cs")
            ),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def mean_pool_vectors(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    out_col: str = "pooled",
) -> DataFrame:
    """Position-wise mean of vectors per group — pooling chunk/passage
    embeddings into document embeddings (or centroid computation for any
    grouping). posexplode -> (group, pos) partial-aggregated sums ->
    re-assembled array: shuffle cardinality is #groups x dim, never row
    count, and no vector list ever materializes in one task. Sums are
    decimal-exact before the final double division (deterministic given
    identical inputs)."""
    ex = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("__pos", "__x"),
    )
    s = F.sum(F.col("__x").cast("decimal(28,6)"))
    agg = ex.groupBy(group_col, "__pos").agg(
        (s.cast("double") / F.count(F.lit(1))).alias("__m")
    )
    return (
        agg.groupBy(group_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__m"))
            ).alias("__pairs")
        )
        .select(
            group_col,
            F.transform(F.col("__pairs"), lambda s: s["__m"]).alias(out_col),
        )
    )


# ------------------------------------------------------ persisted IVF index
def build_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    num_centroids: int = 16,
    iterations: int = 3,
) -> None:
    """Persist the IVF index as a serving artifact: the centroid table as
    a small parquet sidecar plus the corpus written PARTITIONED BY
    ``centroid_id`` — each hive partition dir IS an inverted list, so a
    probe reads only its ``n_probe`` lists via ordinary partition pruning.
    At 100 TB this is the ANN serving story: the index builds once as one
    assignment pass against broadcast centroids, and each query batch
    touches `n_probe/num_centroids` of the data. Metadata goes through
    the MetaFS seam (s3://-capable), mirroring build_lsh_index."""
    from pipelinewise_spark.functions.indexlife import IndexLifecycle

    life = IndexLifecycle.create(
        path, "_ivf_index.json", ("lists", "centroids"),
        {"id_col": id_col, "num_centroids": num_centroids},
    )
    assignments, centroids = ivf_assign(
        corpus, id_col, vec_col, num_centroids, iterations
    )
    lists = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("vec")
    ).join(assignments, id_col)
    lists.write.mode("overwrite").partitionBy("centroid_id").parquet(
        life.uri("lists")
    )
    centroids.write.mode("overwrite").parquet(life.uri("centroids"))
    life.save()


def _ivf_life(path: str):
    from pipelinewise_spark.functions.indexlife import IndexLifecycle

    return IndexLifecycle.load(
        path, "_ivf_index.json", ("lists", "centroids")
    )


def extend_ivf_index(batch: DataFrame, path: str, vec_col: str) -> None:
    """Admit new vectors into the persisted index: assign each to its
    nearest EXISTING centroid (broadcast) and append to that inverted
    list — batch-sized work, centroids unchanged (the standard serving
    policy; rebuild when the corpus distribution drifts)."""
    life = _ivf_life(path)
    id_col = life.meta["id_col"]
    spark = batch.sparkSession
    centroids = spark.read.parquet(life.uri("centroids"))
    v = batch.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    assigned = _assign_to_centroids(v, centroids)
    lists = v.select(F.col(id_col), F.col("__v").alias("vec")).join(
        assigned, id_col
    )
    lists.write.mode("append").partitionBy("centroid_id").parquet(
        life.uri("lists")
    )
    life.record_extension()


def compact_ivf_index(spark, path: str) -> dict:
    """Consolidate inverted-list fragments (shared IndexLifecycle.compact):
    every extend appends one file per touched list, so a long-running
    ingest accumulates fragments that tax probe-time listing. The rewrite
    keeps the centroid_id hive partitioning (probes still prune to their
    n_probe lists); the build-once centroid sidecar is untouched."""
    return _ivf_life(path).compact({
        "lists": lambda cur, new: (
            spark.read.parquet(cur)
            .repartition(F.col("centroid_id"))
            .write.mode("overwrite").partitionBy("centroid_id").parquet(new)
        ),
    })


def vacuum_ivf_index(path: str) -> list[str]:
    """Delete list dirs no longer referenced by the meta pointer."""
    return _ivf_life(path).vacuum()


def ivf_index_status(path: str) -> dict:
    """Maintenance surface: shared lifecycle counters + live list-fragment
    file count."""
    return _ivf_life(path).status(fragment_role="lists")


def ivf_topk_against_index(
    spark,
    path: str,
    queries: DataFrame,
    vec_col: str,
    k: int = 3,
    n_probe: int = 4,
    round_to: int = 6,
) -> DataFrame:
    """Probe the persisted IVF index: rank centroids per query against the
    broadcast sidecar, then scan ONLY the probed inverted-list partitions
    (``centroid_id IN (...)`` prunes at the parquet partition-dir level —
    the probe-id set is at most ``num_centroids`` driver-side ints) and
    exact-cosine within. Same (query_id, neighbor_id, cos, rank) contract
    as :func:`ivf_topk`."""
    life = _ivf_life(path)
    id_col = life.meta["id_col"]
    centroids = spark.read.parquet(life.uri("centroids"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("__qv"),
    )
    qc = q.crossJoin(F.broadcast(centroids)).withColumn(
        "__d",
        F.aggregate(
            F.zip_with(
                F.col("__qv"), F.col("centroid"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__d").asc(), F.col("centroid_id")
    )
    probes = (
        qc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "centroid_id")
    )
    # the union of probed lists is metadata-scale (<= num_centroids ids):
    # collecting it lets the scan prune whole partition dirs
    probe_ids = sorted(
        r["centroid_id"]
        for r in probes.select("centroid_id").distinct().collect()
    )
    lists = (
        spark.read.parquet(life.uri("lists"))
        .filter(F.col("centroid_id").isin(probe_ids))
        .select(
            F.col(id_col).alias("neighbor_id"), "vec", "centroid_id"
        )
    )
    scored = (
        probes.join(lists, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos", F.round(cosine(F.col("__qv"), F.col("vec")), round_to)
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )



# ----------------------------------------------------------------------- PQ
def _unit(col: Column) -> Column:
    """L2-normalize so squared-L2 ranking == cosine ranking (2 - 2cos)."""
    v = _as_double(col)
    n = F.sqrt(dot(v, v))
    return F.transform(v, lambda x: x / n)


def _collect_probe_vectors(
    queries: DataFrame, id_col: str, vec_col: str, max_queries: int
) -> list:
    """Collect the PROBE set for ADC-table construction — bounded by
    ``max_queries``: the ADC lookup tables are per-query driver/broadcast
    metadata, so a caller passing a corpus-sized frame as ``queries``
    must be stopped with guidance rather than OOM the driver (same
    invariant as curation.py's group_prefix_sum offset guard). The bound
    is enforced by a single ``take(max_queries + 1)`` — one job instead
    of the former count-then-collect pair, and at most ``max_queries + 1``
    rows ever reach the driver regardless of the probe frame's size."""
    rows = queries.select(
        F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("__qv")
    ).take(max_queries + 1)
    if len(rows) > max_queries:
        raise ValueError(
            f"PQ/ADC probe set exceeds max_queries={max_queries}: ADC "
            f"tables are per-query broadcast metadata, so the probe set "
            f"must be answer-scale — batch the queries, raise "
            f"max_queries explicitly if the driver can hold n_queries x "
            f"num_subspaces x codes_per_subspace doubles, or use "
            f"cosine_topk / signlsh_near_dup_pairs for corpus-vs-corpus "
            f"workloads"
        )
    return rows


def _pq_codes_udf(codebooks: list[list[list[float]]], dim: int):
    """Vectorized PQ assignment kernel: vec column -> array<int> of
    per-subspace nearest-code ids (1-based; ties -> lower code via numpy
    argmin's first-match rule).

    This is the one deliberately-Arrow seam in the ANN family: a PQ scan
    evaluates num_subspaces x codes_per_subspace candidate distances PER
    ROW, and a 128-candidate argmin is exactly the shape where a numpy
    batch kernel ((B, M, C) einsum per Arrow batch) beats interpreted
    Catalyst lambda folds by ~100x (measured: 130ms/row interpreted vs
    ~1us/row here). Codebooks ship inside the UDF closure — metadata-scale
    broadcast, same contract as ivf_assign's materialized centroids."""
    from pyspark.sql.pandas.functions import pandas_udf

    M = len(codebooks)
    sub_dim = dim // M
    cb = np.asarray(codebooks, dtype=np.float64)  # (M, C, sub_dim)

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            # zero-row Arrow batch: tolist() yields a 1-D (0,) array and
            # the reshape below would raise instead of no-op'ing
            return pd.Series([], dtype=object)
        x = np.asarray(vecs.tolist(), dtype=np.float64)  # (B, dim)
        norms = np.sqrt((x * x).sum(axis=1, keepdims=True))
        np.divide(x, norms, out=x, where=norms > 0)
        sv = x.reshape(len(x), M, 1, sub_dim)  # (B, M, 1, sub_dim)
        d = ((sv - cb[None]) ** 2).sum(axis=-1)  # (B, M, C)
        codes = d.argmin(axis=-1).astype(np.int32) + 1  # (B, M)
        return pd.Series(list(codes))

    return assign


def _pq_train_local(
    rows,
    num_subspaces: int,
    codes_per_subspace: int,
    sub_dim: int,
    dim: int,
    iterations: int,
) -> list[list[list[float]]]:
    """Driver-side twin of the distributed PQ Lloyd loop over collected
    (unit-normalized vec, id) rows: seed = the ``codes_per_subspace``
    lowest-id vectors' slices, assignment = the SAME numpy kernel as
    ``_pq_codes_udf`` (einsum distances, argmin first-match ties),
    update = per-(subspace, code) member mean with empty codes keeping
    their previous centroid."""
    rows = sorted(rows, key=lambda r: r["__id"])
    x = np.asarray([list(r["__v"]) for r in rows], dtype=np.float64)
    cb = np.asarray(
        [
            [
                x[i, m * sub_dim : (m + 1) * sub_dim]
                for i in range(codes_per_subspace)
            ]
            for m in range(num_subspaces)
        ],
        dtype=np.float64,
    )  # (M, C, sub_dim)
    # the assignment kernel re-normalizes exactly like _pq_codes_udf
    xx = x.copy()
    norms = np.sqrt((xx * xx).sum(axis=1, keepdims=True))
    np.divide(xx, norms, out=xx, where=norms > 0)
    sv_all = x.reshape(len(x), num_subspaces, sub_dim)  # update side
    sv_norm = xx.reshape(len(xx), num_subspaces, 1, sub_dim)
    for _ in range(iterations):
        d = ((sv_norm - cb[None]) ** 2).sum(axis=-1)  # (B, M, C)
        codes = d.argmin(axis=-1)  # (B, M), 0-based
        for m in range(num_subspaces):
            for c in range(codes_per_subspace):
                members = sv_all[codes[:, m] == c, m, :]
                if len(members):
                    cb[m, c] = members.mean(axis=0)
    return [
        [[float(v) for v in cb[m, c]] for c in range(codes_per_subspace)]
        for m in range(num_subspaces)
    ]


def pq_train_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    iterations: int = 3,
    dim: int = DIM,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: cb[m][c] = sub-centroid (list of
    ``dim / num_subspaces`` doubles) — metadata-scale driver state, like
    ivf_assign's materialized centroids.

    Vectors unit-normalize, split into contiguous sub-vectors, and every
    subspace trains its own deterministic Lloyd codebook (init = the
    ``codes_per_subspace`` lowest-id vectors' slices — the ivf_assign
    convention, no RNG). ALL subspaces train in the SAME pass per
    iteration: assignment is the vectorized Arrow kernel (zero joins), so
    one Lloyd step = one job shuffling n x num_subspaces skinny rows
    (m, code, sub_vector) into a (num_subspaces x codes_per_subspace)-row
    mean aggregate. Empty codes keep their previous centroid."""
    from pipelinewise_spark.caching import register_cache

    sub_dim = dim // num_subspaces
    if dim % num_subspaces != 0:
        raise ValueError(
            f"dim ({dim}) must divide evenly into num_subspaces "
            f"({num_subspaces})"
        )
    bound = _ann_driver_train_bound()
    if bound > 0:
        sample = df.select(
            _unit(F.col(vec_col)).alias("__v"), F.col(id_col).alias("__id")
        ).take(bound + 1)
        if len(sample) <= bound and len(sample) >= codes_per_subspace:
            return _pq_train_local(
                sample, num_subspaces, codes_per_subspace, sub_dim, dim,
                iterations,
            )
    v = register_cache(
        df.select(
            _unit(F.col(vec_col)).alias("__v"), F.col(id_col).alias("__id")
        ).persist()
    )
    seed = [
        [float(x) for x in r["__v"]]
        for r in v.orderBy("__id").limit(codes_per_subspace).collect()
    ]
    if len(seed) < codes_per_subspace:
        raise ValueError(
            f"PQ needs >= codes_per_subspace ({codes_per_subspace}) vectors "
            f"to seed the codebooks; corpus has {len(seed)}"
        )
    if dim % num_subspaces != 0:
        raise ValueError(
            f"dim ({dim}) must divide evenly into num_subspaces "
            f"({num_subspaces})"
        )
    codebooks = [
        [vec[m * sub_dim : (m + 1) * sub_dim] for vec in seed]
        for m in range(num_subspaces)
    ]
    for _ in range(iterations):
        assign = _pq_codes_udf(codebooks, dim)
        ex = v.select(
            F.posexplode(assign(F.col("__v"))).alias("m", "code"), "__v"
        ).select(
            "m",
            "code",
            F.slice("__v", F.col("m") * sub_dim + 1, sub_dim).alias("sv"),
        )
        got = {
            (r["m"], r["code"]): [r[f"c{i}"] for i in range(sub_dim)]
            for r in ex.groupBy("m", "code")
            .agg(
                *[
                    F.avg(F.element_at("sv", i + 1)).alias(f"c{i}")
                    for i in range(sub_dim)
                ]
            )
            .collect()
        }
        codebooks = [
            [got.get((m, c + 1), cent) for c, cent in enumerate(cb_m)]
            for m, cb_m in enumerate(codebooks)
        ]
    return codebooks


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    dim: int = DIM,
) -> DataFrame:
    """Corpus -> (id, codes array<int>): num_subspaces small ints per
    vector instead of ``dim`` floats — the 16-64x working-set compression
    that keeps a 100 TB ANN scan RAM-resident. One Arrow-batched map
    stage, no shuffle."""
    assign = _pq_codes_udf(codebooks, dim)
    return df.select(F.col(id_col), assign(F.col(vec_col)).alias("codes"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    refine: int = 64,
    round_to: int = 6,
    dim: int = DIM,
    max_queries: int = 10_000,
) -> DataFrame:
    """PQ ANN search (the FAISS IVFPQ recipe, minus the coarse stage):

    1. train codebooks + encode the corpus (offline at 100 TB; the code
       table — persisted here — is what the search scans);
    2. ADC: per query, a (num_subspaces x codes_per_subspace) distance
       lookup table — metadata-scale, broadcast — so scoring a corpus
       vector is ``num_subspaces`` array lookups + adds against the CODE
       table (pure JVM zip_with fold), never touching the float vectors;
    3. exact cosine re-rank of the ``refine``-deep ADC shortlist only
       (joins vectors back for <= refine x |queries| rows).

    Returns (query_id, neighbor_id, cos, rank) — the cosine_topk contract.
    The final answer is deterministic: the shortlist is a pure function of
    codes + literal tables, and the re-rank is the exact rounded cosine
    with lower-neighbor_id tie-breaks."""
    from pipelinewise_spark.caching import register_cache

    sub_dim = dim // num_subspaces
    codebooks = pq_train_codebooks(
        corpus, id_col, vec_col, num_subspaces, codes_per_subspace, dim=dim
    )
    codes = register_cache(
        pq_encode(corpus, id_col, vec_col, codebooks, dim=dim).persist()
    )

    # ADC tables: driver-side pure-double arithmetic over metadata-scale
    # inputs (|queries| x num_subspaces x codes_per_subspace distances);
    # they only pick the shortlist — the exact re-rank fixes the answer.
    # The probe set is size-guarded BEFORE collecting.
    qrows = _collect_probe_vectors(queries, id_col, vec_col, max_queries)
    spark = corpus.sparkSession
    adc_rows = []
    for r in qrows:
        qv = [float(x) for x in r["__qv"]]
        table = [
            [
                sum(
                    (qv[m * sub_dim + i] - cent[i]) ** 2
                    for i in range(sub_dim)
                )
                for cent in cb_m
            ]
            for m, cb_m in enumerate(codebooks)
        ]
        adc_rows.append((r["query_id"], table))
    adc = spark.createDataFrame(
        adc_rows, "query_id bigint, adc array<array<double>>"
    )

    scored = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .crossJoin(F.broadcast(adc))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "adc_d",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("adc"),
                    lambda code, row: F.element_at(row, code),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= refine)
        .select("query_id", "neighbor_id")
    )
    q = spark.createDataFrame(
        [(r["query_id"], [float(x) for x in r["__qv"]]) for r in qrows],
        "query_id bigint, __qv array<double>",
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    rescored = (
        shortlist.join(cv, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cos", F.round(cosine(F.col("__qv"), F.col("__cv")), round_to))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ---------------------------------------------------------------------- MMR
def mmr_diversify_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    pool: int = 15,
    lam: float = 0.7,
    round_to: int = 6,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein):
    per query, greedily pick k results maximizing
    ``lam * rel(c) - (1 - lam) * max_{s in selected} sim(c, s)`` from an
    exact-cosine ``pool``-deep candidate shortlist. The standard re-rank for
    RAG retrieval where the plain top-k collapses onto near-duplicates.

    Scale shape: the pool bound makes the greedy state per-query-finite BY
    CONSTRUCTION — relevance is one broadcast cosine_topk scan, pairwise
    sims are pool^2-per-query rows (a pool-vs-pool self-join, never
    corpus^2), and the sequential greedy runs inside applyInPandas per
    query group over <= pool^2 rows. Determinism: every rel/sim the greedy
    consumes is the JVM fold cosine rounded to ``round_to`` (the exact
    value a SQL twin reproduces); scoring is two IEEE multiplies + a
    subtract on those rounded doubles; ties break to the lower neighbor
    id. Returns (query_id, neighbor_id, mmr_rank).
    """
    from pipelinewise_spark.caching import register_cache

    # rel feeds THREE branches of the final plan (scored pairs, pool
    # membership, carrier rows) — pin it or the corpus-dominant
    # cosine_topk scan re-executes per branch
    rel = register_cache(
        cosine_topk(corpus, queries, id_col, vec_col, k=pool,
                    round_to=round_to).persist()
    )
    cva = corpus.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("__av"))
    cvb = corpus.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("__bv"))
    pa = rel.select(
        "query_id", F.col("neighbor_id").alias("a_id"), F.col("cos").alias("rel_a")
    )
    pb = rel.select("query_id", F.col("neighbor_id").alias("b_id"))
    pairs = (
        pa.join(pb, "query_id")
        .filter(F.col("a_id") != F.col("b_id"))
        .join(cva, "a_id")
        .join(cvb, "b_id")
        .select(
            "query_id",
            "a_id",
            "rel_a",
            "b_id",
            F.round(cosine(F.col("__av"), F.col("__bv")), round_to).alias("sim"),
        )
    )
    # carrier rows (b_id NULL) keep pool-of-one queries representable
    feed = pairs.unionByName(
        pa.select(
            "query_id",
            "a_id",
            "rel_a",
            F.lit(None).cast("long").alias("b_id"),
            F.lit(None).cast("double").alias("sim"),
        )
    )

    one_minus = 1.0 - lam

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf["query_id"].iloc[0]
        rels: dict[int, float] = {}
        sims: dict[tuple[int, int], float] = {}
        for r in pdf.itertuples(index=False):
            rels[int(r.a_id)] = float(r.rel_a)
            if r.b_id is not None and not pd.isna(r.b_id):
                sims[(int(r.a_id), int(r.b_id))] = float(r.sim)
        selected: list[int] = []
        remaining = set(rels)
        while remaining and len(selected) < k:
            best_id, best_score = None, None
            for c in sorted(remaining):
                # true max over selected (can be negative); 0 only when
                # nothing is selected yet — mirrors the SQL twin's
                # COALESCE(list_max(...), 0)
                div = max(
                    (sims.get((c, s), 0.0) for s in selected), default=0.0
                )
                score = lam * rels[c] - one_minus * div
                # strictly-greater keeps the earlier (lower-id) candidate
                # on ties — the same rule the SQL twin's fold runs
                if best_score is None or score > best_score:
                    best_id, best_score = c, score
            selected.append(best_id)
            remaining.discard(best_id)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(selected),
                "neighbor_id": selected,
                "mmr_rank": range(1, len(selected) + 1),
            }
        )

    return feed.groupBy("query_id").applyInPandas(
        greedy, schema="query_id long, neighbor_id long, mmr_rank int"
    )


def build_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    dim: int = DIM,
) -> None:
    """Persist the PQ index as a serving artifact: the trained codebooks
    as a JSON sidecar (metadata-scale) plus the CODE TABLE — ``id`` +
    num_subspaces small ints per vector, the 16-64x-compressed scan set.
    Unlike the IVF index (which carries the float vectors inside its
    inverted lists), the PQ artifact deliberately does NOT copy vectors:
    the ADC scan touches only codes, and the exact re-rank fetches the
    shortlist's vectors from the source lake — that asymmetry IS the PQ
    memory story at 100 TB. Metadata goes through MetaFS (s3://-capable),
    mirroring build_ivf_index / build_lsh_index; versioned-dir
    maintenance is the shared IndexLifecycle contract."""
    from pipelinewise_spark.functions.indexlife import IndexLifecycle

    codebooks = pq_train_codebooks(
        corpus, id_col, vec_col, num_subspaces, codes_per_subspace, dim=dim
    )
    life = IndexLifecycle.create(
        path, "_pq_index.json", ("codes",),
        {
            "id_col": id_col,
            "num_subspaces": num_subspaces,
            "codes_per_subspace": codes_per_subspace,
            "dim": dim,
            "codebooks": codebooks,
        },
    )
    pq_encode(corpus, id_col, vec_col, codebooks, dim=dim).write.mode(
        "overwrite"
    ).parquet(life.uri("codes"))
    life.save()


def _pq_life(path: str):
    from pipelinewise_spark.functions.indexlife import IndexLifecycle

    return IndexLifecycle.load(path, "_pq_index.json", ("codes",))


def extend_pq_index(batch: DataFrame, path: str, vec_col: str) -> None:
    """Admit new vectors: encode against the EXISTING codebooks (one
    Arrow-kernel map pass, batch-sized) and append to the code table —
    codebooks unchanged (the standard serving policy; rebuild when the
    corpus distribution drifts)."""
    life = _pq_life(path)
    meta = life.meta
    pq_encode(
        batch, meta["id_col"], vec_col, meta["codebooks"], dim=meta["dim"]
    ).write.mode("append").parquet(life.uri("codes"))
    life.record_extension()


def compact_pq_index(spark, path: str) -> dict:
    """Consolidate code-table fragments (shared IndexLifecycle.compact):
    the code table is 8 small ints per row, so fragments are cheap to
    rewrite; the ADC scan's cost is dominated by file count, not bytes."""
    par = spark.sparkContext.defaultParallelism
    return _pq_life(path).compact({
        "codes": lambda cur, new: (
            spark.read.parquet(cur).repartition(par)
            .write.mode("overwrite").parquet(new)
        ),
    })


def vacuum_pq_index(path: str) -> list[str]:
    """Delete code dirs no longer referenced by the meta pointer."""
    return _pq_life(path).vacuum()


def pq_index_status(path: str) -> dict:
    """Maintenance surface: shared lifecycle counters + live code-table
    fragment count."""
    return _pq_life(path).status(fragment_role="codes")


def pq_topk_against_index(
    spark,
    path: str,
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    k: int = 3,
    refine: int = 64,
    round_to: int = 6,
    max_queries: int = 10_000,
) -> DataFrame:
    """Probe the persisted PQ index: ADC-score the CODE TABLE (the only
    full scan — 8 ints per row), shortlist ``refine`` deep, exact-cosine
    re-rank against vectors fetched from ``corpus`` (the source lake).
    Same output contract as pq_topk / cosine_topk."""
    life = _pq_life(path)
    meta = life.meta
    codebooks = meta["codebooks"]
    id_col = meta["id_col"]
    num_subspaces = meta["num_subspaces"]
    sub_dim = meta["dim"] // num_subspaces
    codes = spark.read.parquet(life.uri("codes"))

    qrows = _collect_probe_vectors(queries, id_col, vec_col, max_queries)
    adc_rows = []
    for r in qrows:
        qv = [float(x) for x in r["__qv"]]
        table = [
            [
                sum(
                    (qv[m * sub_dim + i] - cent[i]) ** 2
                    for i in range(sub_dim)
                )
                for cent in cb_m
            ]
            for m, cb_m in enumerate(codebooks)
        ]
        adc_rows.append((r["query_id"], table))
    adc = spark.createDataFrame(
        adc_rows, "query_id bigint, adc array<array<double>>"
    )
    scored = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .crossJoin(F.broadcast(adc))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "adc_d",
            F.aggregate(
                F.zip_with(
                    F.col("codes"),
                    F.col("adc"),
                    lambda code, row: F.element_at(row, code),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= refine)
        .select("query_id", "neighbor_id")
    )
    q = spark.createDataFrame(
        [(r["query_id"], [float(x) for x in r["__qv"]]) for r in qrows],
        "query_id bigint, __qv array<double>",
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    rescored = (
        shortlist.join(cv, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cos", F.round(cosine(F.col("__qv"), F.col("__cv")), round_to))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
