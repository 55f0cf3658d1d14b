"""Bloom-filter file index: point lookups prune files where min/max stats
cannot, never drop a file containing the key, and survive a merge (new
files without filters are kept conservatively)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from pipelinewise_spark.operators.manifest_table import ManifestTable
from pipelinewise_spark.sources.files import read_table


def _table(spark, sf_dir, n_files=8):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    t = ManifestTable(tempfile.mkdtemp(prefix="pws_bloomt_") + "/t")
    # layout by customer hash: every file spans the full orderkey range
    t.overwrite(orders.repartition(n_files, "o_custkey"))
    return t, orders


def test_bloom_prunes_and_never_lies(spark, sf_dir):
    t, orders = _table(spark, sf_dir)
    t.add_bloom_filters(spark, ["o_orderkey"], m=8192, k=3)
    # a MID-RANGE key: every file's [min,max] straddles it (stats useless);
    # percentile_approx returns an actual data value, so the key exists
    key = orders.agg(
        F.percentile_approx("o_orderkey", 0.5, 10000)
    ).collect()[0][0]

    all_entries, _ = t.select_entries()
    stat_entries, _ = t.select_entries(ranges={"o_orderkey": (key, key)})
    bloom_entries, _ = t.select_entries(points={"o_orderkey": key})
    # stats can't prune a layout uncorrelated with the key; bloom can
    assert len(stat_entries) == len(all_entries)
    assert len(bloom_entries) < len(all_entries)

    got = (
        t.read(spark, points={"o_orderkey": key})
        .filter(F.col("o_orderkey") == key)
        .collect()
    )
    expect = orders.filter(F.col("o_orderkey") == key).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))


def test_bloom_multi_value_and_string_col(spark, sf_dir):
    t, orders = _table(spark, sf_dir)
    t.add_bloom_filters(spark, ["o_orderkey", "o_custkey"], m=4096, k=3)
    keys = [
        r["o_orderkey"]
        for r in orders.select("o_orderkey").orderBy("o_orderkey").limit(3).collect()
    ]
    entries, _ = t.select_entries(points={"o_orderkey": keys})
    rows = (
        t.read(spark, points={"o_orderkey": keys})
        .filter(F.col("o_orderkey").isin(keys))
        .count()
    )
    assert rows == 3
    # a column with NO filter attached never prunes
    e2, _ = t.select_entries(points={"o_totalprice": 1.0})
    all_entries, _ = t.select_entries()
    assert len(e2) == len(all_entries)


def test_bloom_survives_merge_conservatively(spark, sf_dir):
    t, orders = _table(spark, sf_dir, n_files=4)
    t.add_bloom_filters(spark, ["o_orderkey"], m=4096, k=3)
    key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    batch = spark.createDataFrame(
        [(int(key) + 1, 1, 2.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    t.merge(spark, batch, ["o_orderkey"])
    # the merged write has no bloom -> a lookup must still see its rows
    got = (
        t.read(spark, points={"o_orderkey": int(key) + 1})
        .filter(F.col("o_orderkey") == int(key) + 1)
        .count()
    )
    assert got == 1


def test_bloom_attaches_per_file_when_basenames_collide(spark, tmp_path):
    """One task writing several hive partitions emits the SAME part-NNNNN
    basename in each dir. Filters must key on the base-relative path, so
    every file gets its own filter (basename keying merged them into one
    arbitrary entry and left the rest unindexed)."""
    import os

    from pipelinewise_spark.operators.manifest_table import ManifestTable

    t = ManifestTable(os.path.join(str(tmp_path), "collide"))
    df = spark.createDataFrame(
        [(i, "p%d" % (i % 3), i * 7) for i in range(90)],
        "id long, p string, v long",
    ).coalesce(1)  # single task -> identical basenames across partitions
    t.overwrite(df, partition_by=["p"])
    entries, _ = t.select_entries()
    import posixpath

    names = [posixpath.basename(e["path"]) for e in entries]
    assert len(entries) == 3 and len(set(names)) == 1, (
        "fixture must produce colliding basenames: %s" % names
    )

    t.add_bloom_filters(spark, ["id"])
    entries2, _ = t.select_entries()
    assert all("id" in e.get("bloom", {}) for e in entries2), (
        "every colliding file needs its own filter"
    )
    # filters must be file-accurate: each partition holds ids with
    # id % 3 == k, so a point lookup keeps exactly its own file
    for probe, part in ((0, "p0"), (1, "p1"), (2, "p2")):
        kept, _ = t.select_entries(points={"id": probe})
        assert [e["partition"]["p"] for e in kept] == [part], (probe, kept)
