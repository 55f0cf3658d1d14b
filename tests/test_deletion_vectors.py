"""Deletion vectors (ManifestTable.delete_where): row-level DELETE with
ZERO data-file rewrites — position sidecars + read-side anti-join — and
their lifecycle: composition, time travel, merge/compact
materialization, vacuum retention, clone portability."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipelinewise_spark.operators.manifest_table import ManifestTable


def _mk(spark, tmp_path, partitioned=True):
    rows = [(i, i % 4, "s%d" % (i % 3), float(i)) for i in range(400)]
    df = spark.createDataFrame(
        rows, "id long, pt int, status string, value double"
    )
    t = ManifestTable(str(tmp_path / "t"), ["pt"] if partitioned else [])
    t.overwrite(df)
    return t, {r[0]: r for r in rows}


def _paths(t):
    return sorted(e["path"] for e in t._load_manifest()["files"])


def test_delete_where_rewrites_nothing(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    before = _paths(t)
    n = t.delete_where(spark, "status = 's0' AND id % 2 = 0")
    expect_dead = {i for i in rows if i % 3 == 0 and i % 2 == 0}
    assert n == len(expect_dead) > 0
    assert _paths(t) == before  # no data file added, dropped, or rewritten
    got = {r.id for r in t.read(spark).collect()}
    assert got == set(rows) - expect_dead


def test_deletes_compose_without_double_count(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    n1 = t.delete_where(spark, "id < 100")
    # overlapping predicate: rows already dead must not be re-listed
    n2 = t.delete_where(spark, "id < 200")
    assert n1 == 100 and n2 == 100
    assert {r.id for r in t.read(spark).collect()} == set(range(200, 400))
    m = t._load_manifest()
    assert sum(e.get("dv_rows", 0) for e in m["files"]) == 200


def test_time_travel_predates_delete(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    v0 = t.versions()[-1]
    t.delete_where(spark, "id >= 300")
    assert t.read(spark).count() == 300
    assert t.read(spark, version=v0).count() == 400


def test_merge_materializes_touched_partition_dvs(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    t.delete_where(spark, "id % 10 = 0")  # hits every partition
    batch = spark.createDataFrame(
        [(1, 1, "sX", -1.0)], "id long, pt int, status string, value double"
    )
    t.merge(spark, batch, ["id"])
    m = t._load_manifest()
    touched = [e for e in m["files"] if e["partition"].get("pt") == "1"]
    untouched = [e for e in m["files"] if e["partition"].get("pt") != "1"]
    assert touched and all("dv" not in e for e in touched)
    assert any("dv" in e for e in untouched)
    out = {r.id: r for r in t.read(spark).collect()}
    assert set(out) == {i for i in rows if i % 10 != 0} | {1}
    assert out[1].status == "sX"
    # dead rows of the rewritten partition stayed dead through the rewrite
    assert {i for i in out if i % 4 == 1} == {
        i for i in rows if i % 4 == 1 and i % 10 != 0
    } | {1}


def test_compact_materializes_and_read_survives(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    t.delete_where(spark, "id < 40")
    assert t.compact(spark, min_files=1) > 0
    m = t._load_manifest()
    assert all("dv" not in e for e in m["files"])
    assert {r.id for r in t.read(spark).collect()} == set(range(40, 400))


def test_vacuum_keeps_referenced_dv_drops_orphans(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    t.delete_where(spark, "id = 7")
    # an all-miss delete leaves an orphan dv dir and publishes nothing
    assert t.delete_where(spark, "id = -1") == 0
    t.vacuum(keep_manifests=1)
    live_dv = {
        p for e in t._load_manifest()["files"] for p in e.get("dv", [])
    }
    on_disk = {
        p for p in t.mfs.walk_files("dv") if p.endswith(".parquet")
    }
    assert live_dv  # the real delete's vector survived
    assert on_disk == live_dv  # the orphan's files are gone
    assert t.read(spark).count() == 399


def test_clone_carries_deletion_vectors(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    t.delete_where(spark, "id % 7 = 0")
    c = t.clone_to(str(tmp_path / "clone"))
    assert {r.id for r in c.read(spark).collect()} == {
        i for i in rows if i % 7 != 0
    }
    # fully independent: vacuuming the source never breaks the clone
    t.vacuum(keep_manifests=1)
    assert c.read(spark).count() == sum(1 for i in rows if i % 7 != 0)


def test_unpartitioned_table_delete(spark, tmp_path):
    t, rows = _mk(spark, tmp_path, partitioned=False)
    n = t.delete_where(spark, F.col("value") >= 350.0)
    assert n == 50
    assert t.read(spark).count() == 350


# ------------------------------------------------- merge-on-read


def test_merge_on_read_upsert_no_partition_rewrite(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    before = _paths(t)
    batch = spark.createDataFrame(
        [(8, 0, "up", 888.0), (9001, 1, "new", 1.0)],
        "id long, pt int, status string, value double",
    )
    stats = t.merge_on_read(spark, batch, ["id"])
    assert stats["superseded_rows"] == 1  # id=8 existed; 9001 is new
    assert stats["appended_files"] >= 1
    after = _paths(t)
    # every pre-existing data file is still referenced untouched
    assert set(before) <= set(after)
    out = {r.id: r for r in t.read(spark).collect()}
    assert len(out) == 401
    assert out[8].status == "up" and out[8].value == 888.0
    assert out[9001].status == "new"


def test_merge_on_read_with_deletes_and_chaining(spark, tmp_path):
    t, rows = _mk(spark, tmp_path)
    schema = "id long, pt int, status string, value double"
    b1 = spark.createDataFrame([(10, 2, "v1", 0.0)], schema)
    t.merge_on_read(spark, b1, ["id"])
    # second MOR supersedes the FIRST batch's row (DV on a batch file)
    b2 = spark.createDataFrame([(10, 2, "v2", 0.0)], schema)
    dels = spark.createDataFrame([(11, 3, "x", 0.0)], schema)
    stats = t.merge_on_read(spark, b2, ["id"], deletes=dels)
    assert stats["superseded_rows"] == 2  # b1's id=10 + the deleted id=11
    out = {r.id: r for r in t.read(spark).collect()}
    assert out[10].status == "v2"
    assert 11 not in out
    assert len(out) == 399
    # compaction converts read debt back into clean files
    t.compact(spark, min_files=1)
    m = t._load_manifest()
    assert all("dv" not in e for e in m["files"])
    out2 = {r.id: r.status for r in t.read(spark).collect()}
    assert out2[10] == "v2" and 11 not in out2 and len(out2) == 399


def test_merge_on_read_guard_blocks_stale_replay(spark, tmp_path):
    schema = "id long, pt int, v string, _sdc_seq long"
    t = ManifestTable(str(tmp_path / "t"), ["pt"])
    t.overwrite(
        spark.createDataFrame([(1, 0, "orig", 5), (2, 0, "keep", 9)], schema)
    )
    # fresh row wins, stale replay must not roll back or duplicate
    s1 = t.merge_on_read(
        spark,
        spark.createDataFrame([(1, 0, "newer", 7)], schema),
        ["id"], guard_col="_sdc_seq",
    )
    assert s1["superseded_rows"] == 1
    s2 = t.merge_on_read(
        spark,
        spark.createDataFrame([(1, 0, "stale", 6)], schema),
        ["id"], guard_col="_sdc_seq",
    )
    assert s2["superseded_rows"] == 0  # 6 < 7: loses
    out = {r.id: r.v for r in t.read(spark).collect()}
    assert out == {1: "newer", 2: "keep"}
    # equal seq wins (>= rule, same as merge_upsert)
    t.merge_on_read(
        spark,
        spark.createDataFrame([(1, 0, "equal", 7)], schema),
        ["id"], guard_col="_sdc_seq",
    )
    assert {r.v for r in t.read(spark).filter("id=1").collect()} == {"equal"}


def test_merge_on_read_hard_delete_tombstone(spark, tmp_path):
    schema = (
        "id long, pt int, v string, _sdc_seq long, _sdc_deleted_at timestamp"
    )
    t = ManifestTable(str(tmp_path / "t"), ["pt"])
    base = spark.createDataFrame(
        [(1, 0, "a", 1, None), (2, 0, "b", 1, None)], schema
    )
    t.overwrite(base)
    import datetime

    tomb = spark.createDataFrame(
        [(1, 0, "a", 2, datetime.datetime(2026, 1, 1))], schema
    )
    s = t.merge_on_read(
        spark, tomb, ["id"], guard_col="_sdc_seq", hard_delete=True
    )
    assert s["superseded_rows"] == 1
    assert {r.id for r in t.read(spark).collect()} == {2}


def test_compact_dead_ratio_trigger(spark, tmp_path):
    """A single-file partition half-emptied by deletes is read debt: the
    dead-ratio trigger rewrites it with NO data read to decide, while a
    lightly-deleted partition carries over untouched."""
    rows = [(i, i % 2, float(i)) for i in range(200)]
    t = ManifestTable(str(tmp_path / "t"), ["pt"])
    t.overwrite(spark.createDataFrame(rows, "id long, pt int, value double"))
    t.compact(spark, min_files=1)  # one file per partition
    # partition 0: 60% dead; partition 1: 1 row dead
    t.delete_where(spark, "pt = 0 AND id < 120")
    t.delete_where(spark, "id = 1")
    paths_before = {
        e["partition"]["pt"]: e["path"] for e in t._load_manifest()["files"]
    }
    # min_files high enough that ONLY the dead-ratio trigger can fire
    n = t.compact(spark, min_files=99, max_dead_ratio=0.5)
    assert n == 1
    m = t._load_manifest()
    by_pt = {e["partition"]["pt"]: e for e in m["files"]}
    assert by_pt["0"]["path"] != paths_before["0"]  # rewritten
    assert "dv" not in by_pt["0"]
    assert by_pt["1"]["path"] == paths_before["1"]  # carried, dv intact
    assert by_pt["1"].get("dv_rows") == 1
    assert t.read(spark).count() == 200 - 60 - 1


def test_merge_on_read_schema_evolution(spark, tmp_path):
    """A MOR batch carrying a NEW column appends verbatim; reads union
    with allowMissingColumns so pre-existing rows surface NULL — the
    add-column evolution path with zero rewrites."""
    t = ManifestTable(str(tmp_path / "t"), ["pt"])
    t.overwrite(
        spark.createDataFrame([(1, 0, "a"), (2, 0, "b")],
                              "id long, pt int, v string")
    )
    batch = spark.createDataFrame(
        [(2, 0, "b2", "extra")], "id long, pt int, v string, note string"
    )
    t.merge_on_read(spark, batch, ["id"])
    out = {r.id: (r.v, r.note) for r in t.read(spark).collect()}
    assert out == {1: ("a", None), 2: ("b2", "extra")}


def test_snapshot_diff_surfaces_dv_deletes(spark, tmp_path):
    """The CDF pattern (full-outer PK join of two versions) must see
    deletion-vectored rows as deletes — version reads apply vectors, so
    downstream change feeds need no special DV handling."""
    t, rows = _mk(spark, tmp_path)
    v0 = t.versions()[-1]
    t.delete_where(spark, "id IN (5, 6)")
    v1 = t.versions()[-1]
    old = t.read(spark, version=v0).select(F.col("id").alias("k"))
    new = t.read(spark, version=v1).select(F.col("id").alias("k2"))
    j = old.join(new, old.k == new.k2, "full_outer")
    deleted = {
        r.k for r in j.filter(F.col("k2").isNull()).select("k").collect()
    }
    assert deleted == {5, 6}
