"""Hidden-transform partitioning (manifest_table.py:PartitionField):
derived dir values, raw-column pruning, merge/MOR/compact interop."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from pipelinewise_spark.operators.manifest_table import (
    ManifestTable,
    PartitionField,
    parse_partition_spec,
)


def _df(spark, n=200):
    c = F.col("id")
    return spark.range(n).select(
        c.alias("k"),
        F.expr(
            "timestamp_micros(cast(id % 120 as long) * 86400000000 "
            "+ 820454400000000)"  # 1996-01-01 + (id%120) days
        ).alias("ts"),
        (c * 10).alias("v"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = ManifestTable(
        os.path.join(str(tmp_path), "t"),
        ["months(ts)", "bucket(4, k)"],
    )
    fields = parse_partition_spec(t.partition_by)
    t.overwrite(_df(spark).repartition(8, *[f.expr() for f in fields]))
    return t


def test_spec_parsing_and_twins():
    f = PartitionField("days(ts)")
    assert f.hidden and f.key == "__p_days_ts"
    assert f.value_of("1996-03-07 13:00:00") == "1996-03-07"
    assert PartitionField("months(ts)").value_of(
        "1996-03-07 13:00:00"
    ) == "1996-03"
    b = PartitionField("bucket(8, k)")
    import zlib

    assert b.value_of(42) == str(zlib.crc32(b"42") % 8)
    assert PartitionField("truncate(3, s)").value_of("abcdef") == "abc"
    assert not PartitionField("plain_col").hidden
    with pytest.raises(ValueError):
        PartitionField("bucket(k)")
    with pytest.raises(ValueError):
        PartitionField("days(ts); drop table")


def test_dirs_derived_and_read_roundtrip(spark, table):
    m = table._load_manifest()
    keys = {k for e in m["files"] for k in e["partition"]}
    assert keys == {"__p_months_ts", "__p_bucket_k"}
    months = {e["partition"]["__p_months_ts"] for e in m["files"]}
    # 1996-01-01 + 119 days lands on 1996-04-29 (leap year)
    assert months == {"1996-01", "1996-02", "1996-03", "1996-04"}
    out = table.read(spark)
    assert set(out.columns) == {"k", "ts", "v"}  # nothing hidden leaks
    assert out.count() == 200
    # raw column type survives (it lives in the data files, not the dirs)
    assert dict(out.dtypes)["ts"] == "timestamp"


def test_raw_predicate_prunes_transformed_partitions(spark, table):
    m = table._load_manifest()
    total = len(m["files"])
    ent, _ = table.select_entries(
        ranges={"ts": ("1996-02-01 00:00:00", "1996-02-28 23:59:59")}
    )
    assert 0 < len(ent) <= total / 3  # one month of four, both buckets
    assert all(
        e["partition"]["__p_months_ts"] == "1996-02" for e in ent
    )
    ent2, _ = table.select_entries(points={"k": 42})
    b42 = PartitionField("bucket(4, k)").value_of(42)
    assert all(e["partition"]["__p_bucket_k"] == b42 for e in ent2)
    # combined prune + exact read: answer unchanged vs full scan
    got = (
        table.read(
            spark,
            ranges={"ts": ("1996-02-01 00:00:00", "1996-02-28 23:59:59")},
            points={"k": 42},
        )
        .filter(F.col("k") == 42)
        .collect()
    )
    want = table.read(spark).filter(F.col("k") == 42).collect()
    assert len(got) == 1 and got == want  # k=42 -> 1996-02-12: kept


def test_merge_rewrites_only_touched_hidden_partitions(spark, table):
    before = {e["path"] for e in table._load_manifest()["files"]}
    # batch touches only 1996-01 (k%120 < 31 => january)
    batch = _df(spark).filter(F.col("k") < 5).withColumn(
        "v", F.col("v") + 1
    )
    table.merge(spark, batch, ["k"])
    after = table._load_manifest()["files"]
    touched_months = {
        e["partition"]["__p_months_ts"]
        for e in after
        if e["path"] not in before
    }
    assert touched_months == {"1996-01"}
    carried = [e for e in after if e["path"] in before]
    assert all(
        e["partition"]["__p_months_ts"] != "1996-01"
        or e["partition"]["__p_bucket_k"]
        not in {PartitionField("bucket(4, k)").value_of(k) for k in range(5)}
        for e in carried
    )
    got = {r["k"]: r["v"] for r in table.read(spark).collect()}
    assert got[0] == 1 and got[4] == 41 and got[5] == 50


def test_mor_append_clusters_by_derived_value(spark, table):
    batch = (
        _df(spark, 300)
        .filter(F.col("k") >= 200)
        .withColumn("_sdc_seq", F.lit(1).cast("long"))
    )
    table.merge_on_read(spark, batch, ["k"], guard_col="_sdc_seq")
    m = table._load_manifest()
    assert table.read(spark).count() == 300
    # ~1 file per touched (month, bucket) in the appended write
    new_bases = {e["base"] for e in m["files"]}
    assert len(new_bases) == 2  # T0 write + one MOR append
    compacted = table.compact(spark, min_files=1)
    assert compacted >= 1
    assert table.read(spark).count() == 300


def test_expire_snapshots_and_meta_tables(spark, tmp_path):
    t = ManifestTable(os.path.join(str(tmp_path), "exp"), ["p"])
    df = spark.range(20).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("p"),
        F.col("id").alias("v"),
    )
    t.overwrite(df)
    v1_files = {e["path"] for e in t._load_manifest()["files"]}
    t.overwrite(df.withColumn("v", F.col("v") + 1))
    t.merge(spark, df.filter(F.col("k") < 3), ["k"])
    assert len(t.versions()) == 3

    # backdate the first two commits, keep the live one fresh
    for v in t.versions()[:2]:
        import json as J

        name = f"manifest-{v:08d}.json"
        m = J.loads(t.mfs.read_text(name))
        m["committed_at"] = "2000-01-01 00:00:00"
        t.mfs.write_text(J.dumps(m), name)

    expired = t.expire_snapshots("2020-01-01 00:00:00", keep_last=1)
    assert expired == [1, 2]
    assert t.versions() == [3]
    # v1's files were referenced only by expired snapshots: collected
    assert not any(t.mfs.exists(p) for p in v1_files)
    assert t.read(spark).count() == 20  # live snapshot intact

    snaps = t.meta(spark, "snapshots").collect()
    assert [r["version"] for r in snaps] == [3]
    files = t.meta(spark, "files")
    assert files.count() == len(t._load_manifest()["files"])
    parts = {r["partition"]: r["rows"] for r in t.meta(spark, "partitions").collect()}
    assert sum(parts.values()) == 20
    with pytest.raises(ValueError):
        t.meta(spark, "nope")


def test_compact_bin_packs_by_target_bytes(spark, tmp_path):
    t = ManifestTable(os.path.join(str(tmp_path), "bp"), ["p"])
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("p"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    # fragment: 5 MOR appends -> ~6 files per partition (append-only)
    t.overwrite(df.filter(F.col("k") < 100))
    for i in range(1, 6):
        t.merge_on_read(
            spark,
            df.filter((F.col("k") >= i * 100) & (F.col("k") < (i + 1) * 100)),
            ["k"],
        )
    m = t._load_manifest()
    bytes_per_part = {}
    for e in m["files"]:
        assert e.get("bytes", 0) > 0  # byte counts recorded at write
        key = e["partition"]["p"]
        bytes_per_part[key] = bytes_per_part.get(key, 0) + e["bytes"]
    # target ~ 1/3 of a partition's bytes -> ~3 files per partition
    target = max(bytes_per_part.values()) // 3
    n = t.compact(spark, min_files=2, target_bytes=target)
    assert n == 2
    after = {}
    for e in t._load_manifest()["files"]:
        after.setdefault(e["partition"]["p"], []).append(e)
    for p, es in after.items():
        assert 2 <= len(es) <= 5, (p, len(es))
    assert t.read(spark).count() == 600
    # and the slice key never leaked into the data
    assert "__slice" not in t.read(spark).columns


def test_partition_evolution_onto_hidden_spec(spark, tmp_path):
    # start raw-partitioned, evolve to months(ts): old files keep their
    # layout (read conservatively), the first merge migrates touched data
    t = ManifestTable(os.path.join(str(tmp_path), "evo"), ["p"])
    df = _df(spark, 100).withColumn(
        "p", (F.col("k") % 2).cast("string")
    )
    t.overwrite(df)
    t.set_partition_spec(spark, ["months(ts)"])
    assert t.read(spark).count() == 100
    # merge a small batch: its month partitions migrate to the new spec
    batch = df.filter(F.col("k") < 5).withColumn("v", F.col("v") + 1)
    t.merge(spark, batch, ["k"])
    m = t._load_manifest()
    assert m["partition_by"] == ["months(ts)"]
    new_keys = {
        k for e in m["files"] for k in e["partition"]
    }
    assert "__p_months_ts" in new_keys
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert len(got) == 100 and got[0] == 1 and got[4] == 41 and got[99] == 990
    # pruning works through the evolved spec (old-spec files kept
    # conservatively, migrated files pruned)
    ent, _ = t.select_entries(
        ranges={"ts": ("1996-01-01 00:00:00", "1996-01-31 23:59:59")}
    )
    assert all(
        "__p_months_ts" not in e["partition"]
        or e["partition"]["__p_months_ts"] == "1996-01"
        for e in ent
    )


def test_mor_composite_pk_prunes_on_leading_key(spark, tmp_path):
    t = ManifestTable(os.path.join(str(tmp_path), "cpk"))
    df = spark.range(1000).select(
        F.col("id").alias("k1"),
        (F.col("id") % 7).alias("k2"),
        (F.col("id") * 3).alias("v"),
    )
    t.overwrite(df.repartition(4))
    batch = (
        df.filter(F.col("k1") < 10)
        .withColumn("v", F.col("v") + 1)
        .withColumn("_sdc_seq", F.lit(1).cast("long"))
    )
    out = t.merge_on_read(spark, batch, ["k1", "k2"], guard_col="_sdc_seq")
    assert out["superseded_rows"] == 10
    got = {(r["k1"], r["k2"]): r["v"] for r in t.read(spark).collect()}
    assert len(got) == 1000
    assert got[(0, 0)] == 1 and got[(9, 2)] == 28 and got[(10, 3)] == 30


def test_years_transform_and_cdc_stream_into_hidden_table(spark, tmp_path):
    """The full streaming CDC path (run_cdc_stream -> merge) against a
    years(ts)-partitioned ManifestTable: events route through derived
    partitions and the final state matches plain merge semantics."""
    import os

    import pyspark.sql.types as T

    from pipelinewise_spark.plans.spec import StreamSpec
    from pipelinewise_spark.streaming.cdc import run_cdc_stream

    t = ManifestTable(os.path.join(str(tmp_path), "cdc"), ["years(ts)"])
    base = _df(spark, 100)
    t.overwrite(base)
    events_dir = os.path.join(str(tmp_path), "events")
    os.makedirs(events_dir)
    ev = base.filter(F.col("k") < 20).select(
        F.when(F.col("k") % 4 == 0, F.lit("d")).otherwise(F.lit("u"))
        .alias("_op"),
        F.col("k").alias("_seq"),
        F.lit("2026-02-01 00:00:00").alias("_event_ts"),
        "k", "ts", (F.col("v") + 5).alias("v"),
    )
    ev.repartition(4).write.mode("overwrite").json(events_dir)
    spec = StreamSpec(
        tap_stream_id="t", primary_keys=["k"], hard_delete=True
    )
    run_cdc_stream(
        spark, events_dir,
        T._parse_datatype_string("k long, ts timestamp, v long"),
        spec, t,
        checkpoint_dir=os.path.join(str(tmp_path), "_cp"),
        max_files_per_trigger=2,
    )
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert len(got) == 95  # 5 of the first 20 keys deleted (0,4,8,12,16)
    assert got[1] == 15 and got[19] == 195 and got[50] == 500
    assert 0 not in got and 16 not in got
    keys = {k for e in t._load_manifest()["files"] for k in e["partition"]}
    assert keys == {"__p_years_ts"}


def test_retention_policy_rides_publishes_and_purges(spark, tmp_path):
    t = ManifestTable(os.path.join(str(tmp_path), "ttl"), [])
    t.overwrite(_df(spark, 100))
    t.set_retention("ts", keep_days=60)
    # the policy survives later data commits (like constraints do)
    t.merge(spark, _df(spark, 100).filter(F.col("k") < 3), ["k"])
    assert t.retention() == {"column": "ts", "keep_days": 60}
    # horizon 1996-03-31 - 60d = 1996-01-31: January rows (k%120 < 30) go
    n = t.apply_retention(spark, as_of="1996-03-31 00:00:00")
    assert n == 100 - t.read(spark).count() + 0  # deleted == removed
    got = t.read(spark)
    assert got.count() == 100 - n
    assert got.agg(F.min("ts")).first()[0].isoformat(sep=" ") >= "1996-01-31"
    # no policy -> no-op
    t2 = ManifestTable(os.path.join(str(tmp_path), "nopol"), [])
    t2.overwrite(_df(spark, 10))
    assert t2.apply_retention(spark, as_of="2999-01-01 00:00:00") == 0
