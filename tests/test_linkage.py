"""Record linkage (functions/linkage.py:link_records).

Fellegi–Sunter-shaped integer-weight matching; value-exactly oracle-checked
end-to-end via the registry (record_linkage_customer). These tests pin the
matching semantics on controlled fixtures.
"""

from __future__ import annotations

import pytest

from pipelinewise_spark.functions.linkage import (
    feature_band,
    feature_edit,
    feature_exact,
    link_records,
)


@pytest.fixture(scope="module")
def sources(spark):
    left = spark.createDataFrame(
        [
            (1, "alice smith", "NYC", 100.00),
            (2, "bob jones", "NYC", 250.00),
            (3, "carol white", "LA", 300.00),
            (4, "dave black", "LA", 400.00),
        ],
        "id long, name string, city string, bal double",
    )
    right = spark.createDataFrame(
        [
            # typo'd alice: 1 edit, same city, close balance -> matches 1
            (11, "alice smyth", "NYC", 100.01),
            # exact bob
            (12, "bob jones", "NYC", 250.00),
            # carol moved city: blocked out entirely (no candidate)
            (13, "carol white", "NYC", 300.00),
            # stranger: same city as dave but nothing else agrees
            (14, "zed zeta", "LA", 999.00),
        ],
        "id long, name string, city string, bal double",
    )
    return left, right


FEATURES = [
    feature_exact("name", "name", 300),
    feature_edit("name", "name", 500, max_dist=2),
    feature_band("bal", "bal", 400, 0.02),
]


def test_matches_and_nonmatches(sources):
    left, right = sources
    out = {
        r["right_key"]: (r["left_key"], r["score"])
        for r in link_records(
            left, right, "id", "id", [("city", "city")], FEATURES, 700
        ).collect()
    }
    assert out[11] == (1, 900)  # edit + band
    assert out[12] == (2, 1200)  # exact + edit + band
    assert 13 not in out  # blocking excluded the moved record
    assert 14 not in out  # sub-threshold


def test_best_match_tiebreak_lower_key(spark):
    left = spark.createDataFrame(
        [(1, "x", "B1"), (2, "x", "B1")], "id long, name string, blk string"
    )
    right = spark.createDataFrame(
        [(9, "x", "B1")], "id long, name string, blk string"
    )
    out = link_records(
        left, right, "id", "id", [("blk", "blk")],
        [feature_exact("name", "name", 100)], 100,
    ).collect()
    assert len(out) == 1 and out[0]["left_key"] == 1  # equal scores -> lower id


def test_threshold_zero_keeps_all_blocked_candidates(sources):
    left, right = sources
    out = link_records(
        left, right, "id", "id", [("city", "city")], FEATURES, 0
    ).collect()
    # every right record with at least one same-city candidate resolves
    assert {r["right_key"] for r in out} == {11, 12, 13, 14}


def test_empty_right_side(sources, spark):
    left, right = sources
    out = link_records(
        left, right.filter("id < 0"), "id", "id", [("city", "city")],
        FEATURES, 0,
    )
    assert out.count() == 0


def test_null_feature_values_score_zero(spark):
    """NULL on either side of a feature contributes 0, never NULL-poisons
    the score (three-valued logic collapses through the when/otherwise)."""
    left = spark.createDataFrame(
        [(1, None, "B", 5.0)], "id long, name string, blk string, bal double"
    )
    right = spark.createDataFrame(
        [(9, "x", "B", 5.0)], "id long, name string, blk string, bal double"
    )
    out = link_records(
        left, right, "id", "id", [("blk", "blk")], FEATURES, 0
    ).collect()
    assert len(out) == 1 and out[0]["score"] == 400  # only the balance band


def test_max_block_pairs_skips_dense_blocks(spark):
    """A block key shared by many records on both sides is skipped under
    the cap (no quadratic scan, no match emitted from it); normal blocks
    still link identically to the uncapped run."""
    from pyspark.sql import functions as F

    from pipelinewise_spark.functions.linkage import (
        feature_exact,
        link_records,
    )

    # block 'dense' has 50x50 candidates; block 'a'..'e' are 2x1
    left_rows = [(i, "dense", f"L{i}") for i in range(50)] + [
        (100 + i, blk, f"N{i}") for i, blk in enumerate("abcde")
    ] + [(200 + i, blk, f"X{i}") for i, blk in enumerate("abcde")]
    right_rows = [(1000 + i, "dense", f"L{i}") for i in range(50)] + [
        (1100 + i, blk, f"N{i}") for i, blk in enumerate("abcde")
    ]
    left = spark.createDataFrame(left_rows, "lk long, blk string, name string")
    right = spark.createDataFrame(
        right_rows, "rk long, blk string, name string"
    )
    feats = [feature_exact("name", "name", 10)]

    uncapped = link_records(
        left, right, "lk", "rk", [("blk", "blk")], feats, threshold=10
    ).collect()
    capped = link_records(
        left, right, "lk", "rk", [("blk", "blk")], feats, threshold=10,
        max_block_pairs=100,
    ).collect()

    # uncapped: dense block links all 50 + the 5 normal
    assert len(uncapped) == 55
    got = {(r["right_key"], r["left_key"]) for r in capped}
    # capped: dense block skipped entirely; the 5 normal blocks intact
    assert got == {(1100 + i, 100 + i) for i in range(5)}
