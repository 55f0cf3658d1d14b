"""Value-exact distributed k-means (Lloyd) over embedding columns.

The engine-portable sibling of ``similarity.py:ivf_assign`` (which runs
Lloyd in doubles and is verified through ANN *contract bounds*): here every
arithmetic step is integer-exact, so per-vector cluster assignments are
bit-identical across engines and the DuckDB oracle can replay the whole
iteration loop (a recursive CTE, like the BPE merge loop) and hash-compare
the full assignment table.

How exactness is achieved:

- vectors quantize once to integer micro-units ``q = round(x * 1e6)``
  (float32 -> double multiply -> half-away-from-zero round, identical in
  Spark and DuckDB);
- a centroid is held as the pair (S, c) = (element-wise member SUM, member
  count) — never the mean, so no division ever happens;
- "nearest centroid" compares squared distances as exact rationals by
  cross-multiplication: d_j < d_b  <=>  ||c_j q - S_j||^2 * c_b^2 <
  ||c_b q - S_b||^2 * c_j^2, evaluated in DECIMAL(38,0) (HUGEINT on the
  DuckDB side). Ties break to the LOWER centroid id via a strictly-less
  fold in centroid order — the same fold both engines run.

Magnitude budget (dim 64, |x| <= 1, n members <= ~1e6): |q| <= 1e6,
|c*q - S| <= 2n*1e6, squared <= 4e24... the DECIMAL(38,0) headroom bounds
n at ~3e5 members per cluster for the cross-multiplied compare. The
registered query runs on the embeddings table (thousands of rows); for
100 TB corpora this operator is the REFINEMENT stage over a bounded
sample/reservoir while the full-corpus assignment pass uses the trained
centroids (one broadcast map stage, like ivf_assign's search path).

Scale shape per iteration: ONE job — a map stage evaluating the argmin
fold against k*dim literal centroid values (no join, no shuffle of the
corpus) into a k-row aggregate (64 SUM columns + count); the k-row result
collects to the driver (metadata-scale, same contract as ivf_assign's
materialized centroids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pipelinewise_spark.partitioning import local_frame
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
_DEC = "decimal(38,0)"
# DECIMAL(38,0) ceiling for the cross-multiplied compare N_j * c_b^2 (the
# DuckDB HUGEINT twin tops out slightly higher at ~1.7e38; the stricter
# bound governs)
_COMPARE_LIMIT = 10**38


def _quantize(vec_col: str) -> Column:
    return F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * MICRO, 0).cast("long"),
    )


def _argmin_cluster(cents: list[tuple[int, list[int], int]]) -> Column:
    """argmin over literal centroids of the rational squared distance
    N_j / c_j^2 with N_j = ||c_j*q - S_j||^2 in DECIMAL(38,0). The fold
    runs as F.aggregate over an array of k candidate structs — a real
    lambda (one acc variable), never a nested when-chain, which would
    re-inline the accumulated expression at every step and blow the tree
    up exponentially. Strictly-less keeps the earlier (lower-j) centroid
    on ties — the deterministic contract both engines share."""

    # centroids enter as ONE literal array of structs and every arithmetic
    # step is a higher-order array function — the expression tree stays
    # O(k + dim) nodes. The first draft inlined k x dim DECIMAL terms as
    # separate literal expressions; Catalyst's analysis of that ~10k-node
    # tree cost ~10s PER ITERATION on a 2000-row input. Lambda evaluation
    # is interpreted (outside whole-stage codegen), which at this
    # node-count is orders of magnitude cheaper than compiling the
    # unrolled tree — and the work per row (k*dim integer ops) is the
    # same either way.
    cents_lit = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.array(*[F.lit(x) for x in s_vec]).alias("s"),
                F.lit(c).alias("c"),
            )
            for j, s_vec, c in cents
        ]
    )

    def cand(ce: Column) -> Column:
        n = F.aggregate(
            F.zip_with(
                F.col("__q"),
                ce.getField("s"),
                lambda a, b: (ce.getField("c") * a - b).cast(_DEC),
            ),
            F.lit(0).cast(_DEC),
            lambda acc, x: acc + x * x,
        )
        c2 = (ce.getField("c") * ce.getField("c")).cast(_DEC)
        return F.struct(
            n.alias("N"), c2.alias("c2"), ce.getField("j").alias("j")
        )

    arr = F.transform(cents_lit, cand)
    best = F.aggregate(
        F.slice(arr, 2, len(cents) - 1),
        F.element_at(arr, 1),
        lambda acc, x: F.when(
            x.getField("N") * acc.getField("c2")
            < acc.getField("N") * x.getField("c2"),
            x,
        ).otherwise(acc),
    )
    return best.getField("j")


def _argmin_udf(cents: list[tuple[int, list[int], int]]):
    """Arrow-kernel twin of :func:`_argmin_cluster` — bit-identical
    assignments, ~2 orders of magnitude faster per row (the PQ ADC lesson,
    similarity.py:_pq_codes_udf: a k x dim candidate argmin per row is
    numpy-batch territory, not interpreted-Catalyst-lambda territory).

    Exactness without arbitrary precision on the hot path: every input to
    the distance (c_j * q_d - S_jd) is an integer below 2^53, so float64
    represents it EXACTLY; squaring + the dim-wide sum then carry only
    ~dim*eps relative error. A row's float64 verdict is trusted only when
    the runner-up score exceeds the winner by a margin far above that
    error bound; ambiguous rows (exact ties, near-ties) re-run the exact
    Python-int cross-multiplied fold — the same strictly-less,
    ties-to-lower-j contract as the Catalyst fold and the DuckDB oracle.
    In practice the fallback fires on a handful of rows (duplicate
    vectors), so the kernel stays vectorized."""
    from pyspark.sql.pandas.functions import pandas_udf

    ids = np.asarray([j for j, _, _ in cents], dtype=np.int64)  # (k,)
    S = np.asarray([s for _, s, _ in cents], dtype=np.float64)  # (k, dim)
    c = np.asarray([n for _, _, n in cents], dtype=np.float64)  # (k,)
    c2 = c * c
    cents_py = [(j, [int(x) for x in s], int(n)) for j, s, n in cents]
    dim = S.shape[1]
    # relative error of score = (sum of dim exact-product squares) / c^2:
    # <= (dim + 3) * eps per term; 64x headroom on top
    tol = 64.0 * (dim + 3) * np.finfo(np.float64).eps

    def exact_row(q: list[int]) -> int:
        best_j, best_n, best_c2 = None, None, None
        for j, s, n in cents_py:
            N = sum((n * int(a) - b) ** 2 for a, b in zip(q, s))
            C2 = n * n
            if best_j is None or N * best_c2 < best_n * C2:
                best_j, best_n, best_c2 = j, N, C2
        return best_j

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            # a zero-row Arrow batch tolist()s to a 1-D (0,) array and the
            # broadcast indexing below would raise instead of no-op'ing
            return pd.Series([], dtype=np.int32)
        x = np.asarray(vecs.tolist(), dtype=np.float64)  # (B, dim)
        # (B, k, dim): c_j * q - S_j, every entry an exactly-represented
        # integer; scores (B, k)
        diff = c[None, :, None] * x[:, None, :] - S[None, :, :]
        scores = (diff * diff).sum(axis=-1) / c2[None, :]
        order = np.argmin(scores, axis=1)  # first minimal index
        best = np.take_along_axis(
            scores, order[:, None], axis=1
        ).ravel()
        # ambiguous iff ANY other candidate is within tolerance of the
        # winner (includes exact ties, where the fold's lower-j rule and
        # argmin's first-match rule must be re-derived exactly)
        near = (
            (np.abs(scores - best[:, None]) <= tol * np.maximum(
                scores, best[:, None]
            )).sum(axis=1)
        ) > 1
        out = ids[order]
        if near.any():
            rows = vecs.iloc[np.flatnonzero(near)]
            out[np.flatnonzero(near)] = [
                exact_row([int(v) for v in q]) for q in rows
            ]
        return pd.Series(out.astype(np.int32))

    return assign


def _prepare(df: DataFrame, id_col: str, vec_col: str) -> tuple:
    from pipelinewise_spark.caching import register_cache

    first = df.select(F.size(vec_col)).first()
    if first is None:
        raise ValueError("kmeans: input has no rows")
    dim = first[0]
    # pinned for the iteration loop; release_caches() (the per-query sweep
    # every driver-facing query runs first) reclaims it afterwards
    v = register_cache(
        df.select(F.col(id_col).alias("__id"), _quantize(vec_col).alias("__q"))
        .persist()
    )
    return v, dim


def _budget(dim: int, qmax: int) -> int:
    """Max safe cluster-member count for the exact-compare arithmetic:
    both the DECIMAL(38,0)/HUGEINT cross-multiply ceiling and the float64
    2^53 exact-integer bound must hold."""
    if qmax <= 0:
        return 1 << 40
    return min(
        int((_COMPARE_LIMIT / (4.0 * dim * qmax * qmax)) ** 0.25),
        (1 << 53) // (2 * qmax),
    )


def _train_on(v, dim: int, k: int, iterations: int) -> list:
    init = v.orderBy("__id").limit(k).collect()
    if len(init) < k:
        raise ValueError(
            f"kmeans: k={k} but input has only {len(init)} vectors"
        )
    # Magnitude budget, enforced (not just documented): the
    # cross-multiplied compare N_j * c_b^2 <= 4*dim*qmax^2 * n^4 must stay
    # below DECIMAL(38,0)/HUGEINT, and the float64 fast path needs every
    # intermediate integer (<= 2*n*qmax) under 2^53. Exceeding either
    # bound must fail LOUDLY here — Spark's non-ANSI decimal overflow
    # returns NULL (silent misassignment) and only DuckDB's HUGEINT
    # errors, so without this guard the two engines diverge silently.
    qmax_row = v.select(
        F.max(F.aggregate(
            F.col("__q"), F.lit(0).cast("long"),
            lambda acc, x: F.greatest(acc, F.abs(x)),
        ))
    ).first()
    qmax = int(qmax_row[0] or 0)
    n_budget = _budget(dim, qmax)
    cents = [
        (i + 1, [int(x) for x in r["__q"]], 1)
        for i, r in enumerate(sorted(init, key=lambda r: r["__id"]))
    ]
    for _ in range(iterations):
        agg = (
            v.withColumn("__c", _argmin_udf(cents)(F.col("__q")))
            .groupBy("__c")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.element_at("__q", d + 1)).alias(f"s{d}")
                    for d in range(dim)
                ],
            )
        )
        got = {int(r["__c"]): r for r in agg.collect()}
        worst = max((int(r["n"]) for r in got.values()), default=0)
        if worst > n_budget:
            raise ValueError(
                f"kmeans: cluster with {worst} members exceeds the "
                f"exact-arithmetic budget of {n_budget} for max|q|={qmax} "
                f"(dim={dim}); shrink the corpus (sample/reservoir) or "
                f"coarsen MICRO"
            )
        cents = [
            (
                j,
                [int(got[j][f"s{d}"]) for d in range(dim)]
                if j in got
                else s_vec,
                int(got[j]["n"]) if j in got else c,
            )
            for j, s_vec, c in cents
        ]
    return cents


def kmeans_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 3,
) -> list[tuple[int, list[int], int]]:
    """Train and return the exact centroid states [(j, S, c), ...] —
    metadata-scale driver state (the ivf_assign contract), consumable by
    :func:`kmeans_assign` for held-out/new data. Init: the k lowest-id
    vectors; empty clusters keep their previous (S, c)."""
    v, dim = _prepare(df, id_col, vec_col)
    return _train_on(v, dim, k, iterations)


def kmeans_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list[tuple[int, list[int], int]],
    check_budget: bool = True,
) -> DataFrame:
    """(id, cluster_id): assign ANY vector frame to trained centroids —
    the full-corpus/serving pass (one broadcast map stage, zero shuffle;
    the same shape as ivf_assign's search path). Bit-identical to the
    in-training assignment: the same Arrow kernel with the same exact
    fallback. ``check_budget`` re-verifies the exact-arithmetic bound
    against THIS frame's max|q| (one agg pass) — new data with larger
    magnitudes than the training corpus must fail loudly, not silently
    overflow; disable only when the caller proved the bound already."""
    q = _quantize(vec_col)
    if check_budget:
        qmax_row = df.select(
            F.max(F.aggregate(
                q, F.lit(0).cast("long"),
                lambda acc, x: F.greatest(acc, F.abs(x)),
            ))
        ).first()
        qmax = int(qmax_row[0] or 0) if qmax_row is not None else 0
        dim = len(cents[0][1])
        worst = max(c for _, _, c in cents)
        if worst > _budget(dim, qmax):
            raise ValueError(
                f"kmeans_assign: centroid with {worst} members exceeds "
                f"the exact-arithmetic budget for this frame's "
                f"max|q|={qmax} (dim={dim})"
            )
    return df.select(
        F.col(id_col),
        _argmin_udf(cents)(q).cast("long").alias("cluster_id"),
    )


# ------------------------------------------------- persisted model store
# The kmeans_train/kmeans_assign split returns driver-side centroid state;
# like every other serving artifact (LSH/IVF/PQ/text indexes) that state
# must survive session death, so it routes through the SAME
# IndexLifecycle contract (functions/indexlife.py): one versioned
# ``centroids`` role (a k-row parquet of (j, s, c) exact integer state),
# retrain = a NEW versioned dir + atomic sidecar repoint (the compact
# verb — in-flight readers of the old model are never disturbed), vacuum
# reclaims superseded versions, status reports the counters.

_MODEL_META = "_kmeans_model.json"
_MODEL_ROLES = ("centroids",)


def _model_life(path: str):
    from pipelinewise_spark.functions.indexlife import IndexLifecycle

    return IndexLifecycle.load(path, _MODEL_META, _MODEL_ROLES)


def _write_centroids(spark, cents: list, uri: str) -> None:
    local_frame(spark, 
        [(j, [int(x) for x in s], int(c)) for j, s, c in cents],
        "j int, s array<long>, c long",
    ).coalesce(1).write.mode("overwrite").parquet(uri)


def save_kmeans_model(
    spark, path: str, cents: list[tuple[int, list[int], int]]
) -> None:
    """Persist trained centroid state as a versioned serving artifact
    (IndexLifecycle.create): a k-row parquet under the ``centroids``
    role pointer plus the shared sidecar. Metadata-scale IO — the model
    IS k·(dim+2) integers."""
    from pipelinewise_spark.functions.indexlife import IndexLifecycle

    if not cents:
        raise ValueError("save_kmeans_model: empty centroid state")
    life = IndexLifecycle.create(
        path, _MODEL_META, _MODEL_ROLES,
        {"k": len(cents), "dim": len(cents[0][1]), "micro": MICRO},
    )
    _write_centroids(spark, cents, life.uri("centroids"))
    life.save()


def load_kmeans_model(
    spark, path: str
) -> list[tuple[int, list[int], int]]:
    """Open the CURRENT model version and return the exact centroid
    state, bit-identical to what was saved — assignments from a loaded
    model equal assignments from the in-session one by construction
    (the state is integers; no serialization rounding exists)."""
    life = _model_life(path)
    rows = spark.read.parquet(life.uri("centroids")).collect()
    return sorted(
        (int(r["j"]), [int(x) for x in r["s"]], int(r["c"])) for r in rows
    )


def retrain_kmeans_model(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    iterations: int = 3,
) -> list[tuple[int, list[int], int]]:
    """Refresh the persisted model on (re)current data: train with the
    model's own k, write a NEW versioned centroids dir, and atomically
    repoint the sidecar (the shared compact verb — the swap pattern every
    index family uses, so serving readers mid-scan of the old version
    are never disturbed; vacuum reclaims it later). Returns the new
    centroid state."""
    life = _model_life(path)
    cents = kmeans_train(
        df, id_col, vec_col, k=int(life.meta["k"]), iterations=iterations
    )
    life.compact({
        "centroids": lambda cur, new: _write_centroids(
            df.sparkSession, cents, new
        ),
    })
    return cents


def vacuum_kmeans_model(path: str) -> list[str]:
    """Delete centroid dirs no longer referenced by the role pointer."""
    return _model_life(path).vacuum()


def kmeans_model_status(path: str) -> dict:
    """Shared lifecycle counters + the live model-file count."""
    return _model_life(path).status(fragment_role="centroids")


def kmeans_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 3,
) -> DataFrame:
    """(id, cluster_id) after ``iterations`` exact Lloyd steps.

    Init: the k lowest-id vectors, as (S=q, c=1) — reproducible, no RNG.
    Empty clusters keep their previous (S, c). Returns one row per input
    vector; cluster_id in 1..k."""
    v, dim = _prepare(df, id_col, vec_col)
    cents = _train_on(v, dim, k, iterations)
    return v.select(
        F.col("__id").alias(id_col),
        _argmin_udf(cents)(F.col("__q")).cast("long").alias("cluster_id"),
    )
