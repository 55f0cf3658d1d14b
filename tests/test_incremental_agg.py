"""Incremental aggregate maintenance == full recompute, under inserts,
deletes, in-group updates, and group-MOVING updates (the delete+insert
decomposition), including groups that empty out and brand-new groups."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from pipelinewise_spark.operators.incremental_agg import (
    apply_change_feed,
    build_aggregate,
    rescope_groups,
)


def _rows(df):
    return sorted(
        tuple(float(v) if isinstance(v, Decimal) else v for v in r)
        for r in df.collect()
    )


def test_apply_change_feed_matches_recompute(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 5.0)],
        "id long, grp string, val double",
    )
    mv = build_aggregate(base, ["grp"], {"total": "val"})
    # i: new row in new group d; u in-group; u moving b->a; d: empty out c
    changes = spark.createDataFrame(
        [
            ("i", None, None, "d", 7.0),
            ("u", "a", 10.0, "a", 11.0),
            ("u", "b", 30.0, "a", 30.0),
            ("d", "c", 5.0, None, None),
        ],
        "op string, old_grp string, old_val double, "
        "new_grp string, new_val double",
    )
    out = apply_change_feed(mv, changes, ["grp"], {"total": "val"})

    final = spark.createDataFrame(
        [(1, "a", 11.0), (2, "a", 20.0), (3, "a", 30.0), (5, "d", 7.0)],
        "id long, grp string, val double",
    )
    expect = build_aggregate(final, ["grp"], {"total": "val"})
    assert _rows(out) == _rows(expect)
    # group c emptied out and is gone (count reached zero)
    assert not [r for r in out.collect() if r["grp"] == "c"]


def test_apply_change_feed_null_group_key(spark):
    base = spark.createDataFrame(
        [(1, None, 10.0), (2, "a", 1.0)], "id long, grp string, val double"
    )
    mv = build_aggregate(base, ["grp"], {"total": "val"})
    changes = spark.createDataFrame(
        [("u", None, 10.0, None, 12.0)],
        "op string, old_grp string, old_val double, "
        "new_grp string, new_val double",
    )
    out = apply_change_feed(mv, changes, ["grp"], {"total": "val"})
    got = {r["grp"]: float(r["total"]) for r in out.collect()}
    assert got == {None: 12.0, "a": 1.0}


def test_rescope_groups_min_max(spark):
    base0 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, grp string, val double",
    )
    mv = base0.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("val").alias("lo"),
        F.max("val").alias("hi"),
    )
    # delete id=2 (group a's max must drop from 20 to 10 — not additive)
    base1 = base0.filter(F.col("id") != 2)
    touched = spark.createDataFrame([("a",)], "grp string")
    out = rescope_groups(
        mv, base1, touched, ["grp"],
        {"lo": ("val", "min"), "hi": ("val", "max")},
    )
    got = {r["grp"]: (r["n_rows"], r["lo"], r["hi"]) for r in out.collect()}
    assert got == {"a": (1, 10.0, 10.0), "b": (1, 30.0, 30.0)}
