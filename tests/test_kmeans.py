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


def test_train_assign_split_matches_exact(spark):
    """kmeans_train + kmeans_assign over the SAME corpus must reproduce
    kmeans_exact's assignments exactly (the serving path is the same
    kernel), and assigning a held-out frame works against the trained
    centroids."""
    import random

    from pyspark.sql import functions as F

    from pipelinewise_spark.functions.kmeans import (
        kmeans_assign,
        kmeans_exact,
        kmeans_train,
    )

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(90)
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    exact = {
        r["id"]: r["cluster_id"]
        for r in kmeans_exact(df, "id", "vec", k=4, iterations=2).collect()
    }
    cents = kmeans_train(df, "id", "vec", k=4, iterations=2)
    split = {
        r["id"]: r["cluster_id"]
        for r in kmeans_assign(df, "id", "vec", cents).collect()
    }
    assert split == exact
    held = df.filter(F.col("id") % 2 == 0)
    sub = {
        r["id"]: r["cluster_id"]
        for r in kmeans_assign(held, "id", "vec", cents).collect()
    }
    assert sub == {i: c for i, c in exact.items() if i % 2 == 0}


def test_kmeans_assign_budget_guard_on_new_frame(spark):
    """New data with larger magnitudes than the training corpus must
    fail loudly in kmeans_assign, not silently overflow."""
    import pytest

    from pipelinewise_spark.functions.kmeans import (
        kmeans_assign,
        kmeans_train,
    )

    train = spark.createDataFrame(
        [(i, [float(i % 5) / 5, 0.0]) for i in range(400)],
        "id long, vec array<double>",
    )
    cents = kmeans_train(train, "id", "vec", k=2, iterations=1)
    huge = spark.createDataFrame(
        [(1, [3.0e7, 0.0])], "id long, vec array<double>"
    )
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_assign(huge, "id", "vec", cents)


def test_kmeans_model_lifecycle_roundtrip(spark):
    """save -> load is bit-identical; retrain versions via the shared
    compact verb (atomic repoint, superseded dir survives until vacuum);
    status carries the lifecycle counters."""
    import tempfile

    from pipelinewise_spark.functions.kmeans import (
        kmeans_assign,
        kmeans_model_status,
        kmeans_train,
        load_kmeans_model,
        retrain_kmeans_model,
        save_kmeans_model,
        vacuum_kmeans_model,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = tempfile.mkdtemp(prefix="pws_kmlife_") + "/model"
    cents0 = kmeans_train(emb, "vec_id", "embedding", k=4, iterations=1)
    save_kmeans_model(spark, path, cents0)
    loaded0 = load_kmeans_model(spark, path)
    assert loaded0 == sorted(cents0)
    # assignments from the loaded state are bit-identical to in-session
    a = kmeans_assign(emb, "vec_id", "embedding", cents0).collect()
    b = kmeans_assign(emb, "vec_id", "embedding", loaded0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    st0 = kmeans_model_status(path)
    assert st0["compactions"] == 0 and st0["centroids_dir"] == "centroids-0000"
    cents1 = retrain_kmeans_model(emb, "vec_id", "embedding", path,
                                  iterations=2)
    st1 = kmeans_model_status(path)
    assert st1["compactions"] == 1
    assert st1["centroids_dir"] == "centroids-0001"
    # old version still on disk for in-flight readers, then vacuumed
    import os

    assert os.path.isdir(os.path.join(path, "centroids-0000"))
    assert vacuum_kmeans_model(path) == ["centroids-0000"]
    assert not os.path.isdir(os.path.join(path, "centroids-0000"))
    assert load_kmeans_model(spark, path) == sorted(cents1)
