"""Source/target reconciliation (operators/reconcile.py).

Content-level generalization of the reference's per-batch record-count
checks (pipelinewise/fastsync/commons/utils.py export counts). Value-exact
oracle coverage via reconcile_report_orders / reconcile_diff_orders; these
tests pin the detection semantics on controlled corruptions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.operators.reconcile import (
    reconcile_diff,
    reconcile_report,
)

CANON = lambda: [  # noqa: E731
    F.col("id").cast("string"),
    F.col("v").cast("string"),
]


@pytest.fixture(scope="module")
def src(spark):
    return spark.createDataFrame(
        [(i, f"val{i}") for i in range(100)], "id long, v string"
    )


def test_identical_tables_fully_consistent(src):
    rep = reconcile_report(src, src, "id", CANON(), n_buckets=8).collect()
    assert len(rep) == 8
    assert all(r["consistent"] for r in rep)
    assert reconcile_diff(src, src, "id", CANON()).count() == 0


def test_three_corruption_classes_detected(spark, src):
    tgt = (
        src.filter(F.col("id") != 7)  # missing_in_target
        .withColumn(
            "v", F.when(F.col("id") == 13, F.lit("CORRUPT")).otherwise(F.col("v"))
        )  # modified
        .unionByName(
            spark.createDataFrame([(999, "extra")], "id long, v string")
        )  # missing_in_source
    )
    diff = {
        r["key"]: r["status"]
        for r in reconcile_diff(src, tgt, "id", CANON()).collect()
    }
    assert diff == {
        7: "missing_in_target",
        13: "modified",
        999: "missing_in_source",
    }
    rep = reconcile_report(src, tgt, "id", CANON(), n_buckets=8).collect()
    dirty = {r["bucket"] for r in rep if not r["consistent"]}
    assert dirty == {7 % 8, 13 % 8, 999 % 8}


def test_count_equal_content_drift_caught(spark, src):
    """Same row counts but one value changed: counts agree, checksums must
    not — the case pure count-based verification (the reference's) misses."""
    tgt = src.withColumn(
        "v", F.when(F.col("id") == 42, F.lit("oops")).otherwise(F.col("v"))
    )
    rep = reconcile_report(src, tgt, "id", CANON(), n_buckets=8).collect()
    bad = [r for r in rep if not r["consistent"]]
    assert len(bad) == 1 and bad[0]["bucket"] == 42 % 8
    assert bad[0]["src_cnt"] == bad[0]["tgt_cnt"]
    assert bad[0]["src_sum"] != bad[0]["tgt_sum"]


def test_empty_target_all_buckets_dirty(spark, src):
    rep = reconcile_report(
        src, src.filter("id < 0"), "id", CANON(), n_buckets=8
    ).collect()
    assert len(rep) == 8
    assert all(not r["consistent"] and r["tgt_cnt"] == 0 for r in rep)
    diff = reconcile_diff(src, src.filter("id < 0"), "id", CANON()).collect()
    assert len(diff) == 100
    assert all(r["status"] == "missing_in_target" for r in diff)


def test_null_shift_is_detected(spark):
    """('a', NULL, 'b') vs ('a', 'b', NULL) must NOT collide: concat_ws
    skips nulls, so without explicit sentinels a column-shift corruption
    would hash identically and vanish from the diff."""
    s = spark.createDataFrame([(1, "a", None, "b")], "id long, x string, y string, z string")
    t = spark.createDataFrame([(1, "a", "b", None)], "id long, x string, y string, z string")
    canon = [F.col("x"), F.col("y"), F.col("z")]
    diff = reconcile_diff(s, t, "id", canon).collect()
    assert len(diff) == 1 and diff[0]["status"] == "modified"


def test_reconcile_repair_restores_equality_and_is_idempotent(spark):
    from pyspark.sql import functions as F

    from pipelinewise_spark.operators.reconcile import (
        reconcile_diff,
        reconcile_repair,
    )

    src = spark.createDataFrame(
        [(i, f"v{i}") for i in range(300)], ["pk", "val"]
    )
    tgt = (
        src.filter(F.col("pk") % 37 != 5)  # some missing
        .withColumn(
            "val",
            F.when(F.col("pk") % 41 == 3, F.lit("CORRUPT")).otherwise(
                F.col("val")
            ),
        )
        .unionByName(
            spark.createDataFrame([(9999, "ghost"), (8888, "ghost2")],
                                  ["pk", "val"])
        )
    )
    canon = [F.col("pk").cast("string"), F.col("val")]
    repaired = reconcile_repair(src, tgt, "pk", canon)
    got = sorted((r["pk"], r["val"]) for r in repaired.collect())
    want = sorted((r["pk"], r["val"]) for r in src.collect())
    assert got == want
    # idempotent: a repaired target diffs empty and passes through
    assert reconcile_diff(src, repaired, "pk", canon).count() == 0
    again = reconcile_repair(src, repaired, "pk", canon)
    assert sorted((r["pk"], r["val"]) for r in again.collect()) == want


def test_reconcile_repair_random_corruption_property(spark):
    """Property: for ANY combination of dropped / modified / spurious
    rows, repair(source, corrupt(target)) == source and the post-repair
    diff is empty. Randomized corruption sets (seeded) instead of the
    fixed three-way case above."""
    import random

    from pyspark.sql import functions as F

    from pipelinewise_spark.operators.reconcile import (
        reconcile_diff,
        reconcile_repair,
    )

    base = [(i, f"payload-{i}") for i in range(400)]
    src = spark.createDataFrame(base, ["pk", "val"])
    canon = [F.col("pk").cast("string"), F.col("val")]
    want = sorted(base)

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        drop = set(rng.sample(range(400), rng.randint(0, 40)))
        modify = set(rng.sample(range(400), rng.randint(0, 40))) - drop
        ghosts = [(10_000 + seed * 100 + g, "ghost")
                  for g in range(rng.randint(0, 10))]
        rows = [
            (k, f"XX-{k}" if k in modify else v)
            for k, v in base
            if k not in drop
        ] + ghosts
        tgt = spark.createDataFrame(rows, ["pk", "val"])
        repaired = reconcile_repair(src, tgt, "pk", canon)
        got = sorted((r["pk"], r["val"]) for r in repaired.collect())
        assert got == want, f"seed {seed}"
        assert reconcile_diff(src, repaired, "pk", canon).count() == 0
