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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
_DEC = "decimal(38,0)"


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
    from pipelinewise_spark.caching import register_cache

    first = df.select(F.size(vec_col)).first()
    if first is None:
        raise ValueError("kmeans_exact: input has no rows")
    dim = first[0]
    # pinned for the iteration loop; release_caches() (the per-query sweep
    # every driver-facing query runs first) reclaims it afterwards
    v = register_cache(
        df.select(F.col(id_col).alias("__id"), _quantize(vec_col).alias("__q"))
        .persist()
    )
    init = v.orderBy("__id").limit(k).collect()
    if len(init) < k:
        raise ValueError(
            f"kmeans_exact: k={k} but input has only {len(init)} vectors"
        )
    cents = [
        (i + 1, [int(x) for x in r["__q"]], 1)
        for i, r in enumerate(sorted(init, key=lambda r: r["__id"]))
    ]
    for _ in range(iterations):
        agg = (
            v.withColumn("__c", _argmin_cluster(cents))
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
    return v.select(
        F.col("__id").alias(id_col),
        _argmin_cluster(cents).cast("long").alias("cluster_id"),
    )
