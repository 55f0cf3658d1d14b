"""Shared persisted-index lifecycle (functions/indexlife.py) — the one
maintenance contract behind the LSH / IVF / PQ / text index families
(r8 VERDICT task 5). Covers the module directly plus the two families
that GAINED maintenance verbs in the unification (IVF, PQ): compaction
is result-preserving and reduces fragments, vacuum removes exactly the
superseded dirs, status reports the counters a maintenance daemon
thresholds on, and pre-lifecycle sidecars (no dir pointers) still load.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from pipelinewise_spark.functions.indexlife import IndexLifecycle


def _frag_count(path, sub):
    d = os.path.join(path, sub)
    return sum(
        f.endswith(".parquet") for _, _, fs in os.walk(d) for f in fs
    )


# ------------------------------------------------------------ module unit
def test_lifecycle_create_load_counters_and_vacuum(tmp_path):
    path = str(tmp_path / "ix")
    life = IndexLifecycle.create(
        path, "_x.json", ("seg",), {"param": 7}
    )
    os.makedirs(os.path.join(path, "seg-0000"), exist_ok=True)
    life.save()

    back = IndexLifecycle.load(path, "_x.json", ("seg",))
    assert back.meta["param"] == 7
    assert back.dir("seg") == "seg-0000"
    back.record_extension()
    back.record_extension()
    st = IndexLifecycle.load(path, "_x.json", ("seg",)).status()
    assert st["extensions"] == 2
    assert st["extensions_since_compaction"] == 2
    assert st["compactions"] == 0

    # compact: writer callback gets (current_uri, new_uri)
    seen = {}

    def rw(cur, new):
        seen["cur"], seen["new"] = cur, new
        os.makedirs(new, exist_ok=True)

    meta = IndexLifecycle.load(path, "_x.json", ("seg",)).compact(
        {"seg": rw}
    )
    assert seen["cur"].endswith("seg-0000")
    assert seen["new"].endswith("seg-0001")
    assert meta["seg_dir"] == "seg-0001"
    assert meta["extensions_since_compaction"] == 0
    assert meta["compactions"] == 1

    removed = IndexLifecycle.load(path, "_x.json", ("seg",)).vacuum()
    assert removed == ["seg-0000"]
    assert not os.path.exists(os.path.join(path, "seg-0000"))
    # vacuum never touches non-role dirs or the sidecar
    assert os.path.exists(os.path.join(path, "_x.json"))


def test_lifecycle_legacy_sidecar_defaults_to_unversioned_dirs(tmp_path):
    """A pre-r9 index whose sidecar has no dir pointers/counters loads
    with {role}_dir = {role} and zeroed counters."""
    path = str(tmp_path / "old")
    os.makedirs(path)
    with open(os.path.join(path, "_x.json"), "w") as f:
        json.dump({"id_col": "k"}, f)
    life = IndexLifecycle.load(path, "_x.json", ("shingles", "bands"))
    assert life.dir("shingles") == "shingles"
    assert life.dir("bands") == "bands"
    assert life.status()["extensions"] == 0


def test_lifecycle_vacuum_matches_role_naming_only(tmp_path):
    """Only {role} / {role}-NNNN dirs are vacuum candidates — a user dir
    that merely shares the prefix (e.g. 'seg_backup') survives."""
    path = str(tmp_path / "ix")
    life = IndexLifecycle.create(path, "_x.json", ("seg",), {})
    os.makedirs(os.path.join(path, "seg-0000"))
    os.makedirs(os.path.join(path, "seg"))  # legacy leftover → removable
    os.makedirs(os.path.join(path, "seg_backup"))  # NOT a candidate
    os.makedirs(os.path.join(path, "segments"))  # NOT a candidate
    life.save()
    removed = IndexLifecycle.load(path, "_x.json", ("seg",)).vacuum()
    assert removed == ["seg"]
    assert os.path.exists(os.path.join(path, "seg_backup"))
    assert os.path.exists(os.path.join(path, "segments"))


# --------------------------------------------- IVF gains maintenance verbs
def test_ivf_compact_vacuum_status_preserve_results(spark, tmp_path):
    from pipelinewise_spark.functions import similarity as S

    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    S.build_ivf_index(
        emb.filter(F.col("vec_id") < 40), path, "vec_id", "embedding",
        num_centroids=4,
    )
    for lo, hi in [(40, 50), (50, 60)]:
        S.extend_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
            path, "embedding",
        )
    st = S.ivf_index_status(path)
    assert st["extensions"] == 2 and st["extensions_since_compaction"] == 2

    q = emb.filter(F.col("vec_id") < 5)
    before = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.ivf_topk_against_index(
            spark, path, q, "embedding", k=3, n_probe=4
        ).collect()
    }
    frags_before = _frag_count(path, st["lists_dir"])

    meta = S.compact_ivf_index(spark, path)
    removed = S.vacuum_ivf_index(path)
    assert st["lists_dir"] in removed
    # centroids sidecar untouched by a lists-only compaction
    assert meta["centroids_dir"] == st["centroids_dir"]
    st2 = S.ivf_index_status(path)
    assert st2["extensions_since_compaction"] == 0
    assert st2["compactions"] == 1
    assert st2["fragment_files"] <= frags_before

    after = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.ivf_topk_against_index(
            spark, path, q, "embedding", k=3, n_probe=4
        ).collect()
    }
    assert after == before, "compaction/vacuum changed probe results"


# ---------------------------------------------- PQ gains maintenance verbs
def test_pq_compact_vacuum_status_preserve_results(spark, tmp_path):
    from pipelinewise_spark.functions import similarity as S

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "pq")
    S.build_pq_index(
        emb.filter(F.col("vec_id") < 30), path, "vec_id", "embedding",
        num_subspaces=8, codes_per_subspace=8,
    )
    S.extend_pq_index(
        emb.filter(F.col("vec_id") >= 30), path, "embedding"
    )
    st = S.pq_index_status(path)
    assert st["extensions"] == 1

    q = emb.filter(F.col("vec_id") < 3)
    before = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.pq_topk_against_index(
            spark, path, emb, q, "embedding", k=3, refine=16
        ).collect()
    }
    S.compact_pq_index(spark, path)
    removed = S.vacuum_pq_index(path)
    assert st["codes_dir"] in removed
    after = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.pq_topk_against_index(
            spark, path, emb, q, "embedding", k=3, refine=16
        ).collect()
    }
    assert after == before
    assert S.pq_index_status(path)["extensions_since_compaction"] == 0
