"""Count-Min Sketch (operators/sketches.py:cms_*): exact mergeability
(union-of-parts is bit-identical to a direct build — integer counters),
the hard overcount guarantee on every key, and exactness when the
counter table is collision-free."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from pipelinewise_spark.operators.sketches import (
    cms_estimate,
    cms_rollup,
    cms_sketch_table,
)


def _df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def test_cms_overcount_guarantee_every_key(spark):
    rng = random.Random(31)
    keys = [rng.randrange(200) for _ in range(3000)]
    truth = Counter(keys)
    df = _df(spark, keys)
    sketch = cms_sketch_table(df, [], "k", depth=4, width=64)  # forced collisions
    est = cms_estimate(
        sketch, df.select("k").distinct(), "k", depth=4, width=64
    )
    got = {r["k"]: r["freq_est"] for r in est.collect()}
    assert set(got) == set(truth)
    for k, t in truth.items():
        assert got[k] >= t, (k, got[k], t)  # CMS never undercounts


def test_cms_exact_when_wide(spark):
    keys = list(range(50)) * 3
    df = _df(spark, keys)
    sketch = cms_sketch_table(df, [], "k", depth=5, width=4096)
    est = cms_estimate(
        sketch, df.select("k").distinct(), "k", depth=5, width=4096
    )
    assert all(r["freq_est"] == 3 for r in est.collect())


def test_cms_merge_is_bit_identical_to_direct(spark):
    rng = random.Random(37)
    keys = [rng.randrange(300) for _ in range(2000)]
    df = _df(spark, keys).withColumn("part", (F.col("k") % 3).cast("int"))
    direct = cms_sketch_table(df, [], "k", depth=4, width=128)
    parts = cms_sketch_table(df, ["part"], "k", depth=4, width=128)
    merged = cms_rollup(parts, [])
    d = {(r["i"], r["col"]): r["cnt"] for r in direct.collect()}
    m = {(r["i"], r["col"]): r["cnt"] for r in merged.collect()}
    assert d == m  # exactly mergeable, no estimation drift


def test_cms_apply_feed_matches_rebuild(spark):
    from pipelinewise_spark.operators.sketches import cms_apply_feed

    rng = random.Random(41)
    base = [rng.randrange(100) for _ in range(800)]
    df = _df(spark, base)
    sketch = cms_sketch_table(df, [], "k", depth=4, width=256)
    # feed: delete 100 keys, update 50 (delete+insert same key — must
    # cancel), insert 120 new observations
    deletes = [("delete", k) for k in base[:100]]
    updates = [("delete", k) for k in base[100:150]] + [
        ("insert", k) for k in base[100:150]
    ]
    inserts = [("insert", rng.randrange(100)) for _ in range(120)]
    feed = spark.createDataFrame(
        deletes + updates + inserts, "_change_type string, k long"
    )
    maintained = cms_apply_feed(sketch, feed, "k", depth=4, width=256)
    final_keys = base[100:] + [k for op, k in inserts]
    rebuilt = cms_sketch_table(_df(spark, final_keys), [], "k", depth=4, width=256)
    m = {(r["i"], r["col"]): r["cnt"] for r in maintained.collect()}
    r = {(r["i"], r["col"]): r["cnt"] for r in rebuilt.collect()}
    assert m == r  # invertible: maintained sketch is bit-identical
