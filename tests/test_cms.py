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
