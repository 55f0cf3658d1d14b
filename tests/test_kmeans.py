"""Value-exact k-means (functions/kmeans.py) vs a pure-Python reference
implementing the identical integer contract (micro-unit quantization,
sum/count centroids, cross-multiplied rational distance compares,
lower-id tie-break, empty clusters keep state)."""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F

from pipelinewise_spark.functions.kmeans import MICRO, kmeans_exact
from pipelinewise_spark.sources.files import read_table


def _py_kmeans(vecs: dict[int, list[float]], k: int, iterations: int):
    q = {
        i: [int(round(x * MICRO)) for x in v] for i, v in vecs.items()
    }
    ids = sorted(q)
    cents = [(j + 1, list(q[ids[j]]), 1) for j in range(k)]

    def assign(qv):
        best = None
        for j, s, c in cents:
            n = sum((c * a - b) ** 2 for a, b in zip(qv, s))
            d = Fraction(n, c * c)
            if best is None or d < best[0]:
                best = (d, j)
        return best[1]

    for _ in range(iterations):
        groups: dict[int, list[list[int]]] = {}
        for i in ids:
            groups.setdefault(assign(q[i]), []).append(q[i])
        cents = [
            (
                j,
                [sum(col) for col in zip(*groups[j])] if j in groups else s,
                len(groups[j]) if j in groups else c,
            )
            for j, s, c in cents
        ]
    return {i: assign(q[i]) for i in ids}


def test_kmeans_exact_matches_python_reference(spark):
    import random

    rnd = random.Random(11)
    vecs = {
        i: [rnd.uniform(-1, 1) for _ in range(8)] for i in range(60)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    # float32 storage truncates; quantize the reference from the SAME
    # float32 values Spark reads back
    stored = {
        r["vec_id"]: list(r["embedding"]) for r in df.collect()
    }
    expect = _py_kmeans(stored, k=4, iterations=3)
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_exact(df, "vec_id", "embedding", k=4, iterations=3).collect()
    }
    assert got == expect


def test_kmeans_deterministic_and_total(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    a = kmeans_exact(emb, "vec_id", "embedding", k=8, iterations=2)
    rows = a.collect()
    assert len(rows) == emb.count()  # every vector assigned exactly once
    cl = {r["cluster_id"] for r in rows}
    assert cl <= set(range(1, 9)) and len(cl) >= 2
    # rerun is bit-identical (no RNG anywhere)
    b = kmeans_exact(
        emb.repartition(7), "vec_id", "embedding", k=8, iterations=2
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b.collect()))


def test_kmeans_duplicate_points_tiebreak_lower_id(spark):
    # two identical centroids (duplicate init vectors): every point is
    # equidistant to both; the strictly-less fold must keep cluster 1
    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(6)], "vec_id long, embedding array<float>"
    )
    out = kmeans_exact(df, "vec_id", "embedding", k=2, iterations=2)
    assert {r["cluster_id"] for r in out.collect()} == {1}
