"""Seasonal median/MAD anomalies (operators/anomaly.py:seasonal_anomalies)
and histogram distribution drift (operators/drift.py:distribution_drift).

Both are value-exactly oracle-checked end-to-end through the registry
(tests/test_correctness.py); these tests pin the semantic properties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.operators.anomaly import seasonal_anomalies
from pipelinewise_spark.operators.drift import distribution_drift


@pytest.fixture(scope="module")
def orders(spark):
    from pipelinewise_spark.sources.files import read_table

    return read_table(spark, "/root/testdata/sf0.001", "orders")


def test_seasonal_spike_flagged_within_season_only(spark):
    """A Monday spike must flag against the Monday baseline while equally
    sized Saturday values stay normal (a global median/MAD rule would
    flag every Saturday instead)."""
    rows = []
    # 8 weeks: Mondays at ~100, Saturdays at ~500 (weekly shape), one
    # poisoned Monday at 480 — globally unremarkable (close to Saturday
    # values), seasonally a huge outlier
    for w in range(8):
        rows.append(("mon", w, 100 + (w % 3)))
        rows.append(("sat", w, 500 + (w % 3)))
    rows.append(("mon", 99, 480))
    df = spark.createDataFrame(rows, "dow string, week int, cnt long")
    out = seasonal_anomalies(df, "dow", "cnt").collect()
    flagged = {(r["dow"], r["week"]) for r in out if r["is_anomaly"]}
    assert ("mon", 99) in flagged
    assert not any(d == "sat" for d, _ in flagged)


def test_seasonal_regular_series_quiet(spark):
    df = spark.createDataFrame(
        [("a", i, 100) for i in range(10)] + [("b", i, 900) for i in range(10)],
        "season string, i int, cnt long",
    )
    out = seasonal_anomalies(df, "season", "cnt").collect()
    assert not any(r["is_anomaly"] for r in out)
    assert {r["baseline_median"] for r in out} == {100.0, 900.0}


def test_distribution_drift_identical_is_zero(orders):
    out = distribution_drift(
        orders, orders, "o_totalprice", ["o_orderkey"], n_buckets=10
    ).collect()
    assert len(out) == 10
    assert all(r["tvd_ppm"] == 0 and not r["drifted"] for r in out)
    assert all(r["ref_cnt"] == r["cur_cnt"] for r in out)
    # deciles of the reference: bucket counts are near-equal by construction
    n = sum(r["ref_cnt"] for r in out)
    assert all(abs(r["ref_cnt"] - n / 10) <= n / 10 * 0.35 for r in out)


def test_distribution_drift_shift_flags(orders):
    shifted = orders.withColumn(
        "o_totalprice", F.col("o_totalprice") + 50000
    )
    out = distribution_drift(
        orders, shifted, "o_totalprice", ["o_orderkey"], n_buckets=10
    ).collect()
    assert all(r["drifted"] for r in out)
    # a large uniform shift pushes most mass into the top bucket
    top = [r for r in out if r["bucket"] == 10][0]
    assert top["cur_cnt"] > top["ref_cnt"]
    assert out[0]["tvd_ppm"] > 100_000


def test_distribution_drift_buckets_partition_everything(orders):
    cur = orders.filter(F.col("o_orderkey") % 3 == 0)
    out = distribution_drift(
        orders, cur, "o_totalprice", ["o_orderkey"], n_buckets=10
    ).collect()
    assert sum(r["ref_cnt"] for r in out) == orders.count()
    assert sum(r["cur_cnt"] for r in out) == cur.count()


def test_distribution_drift_empty_reference_raises(spark, orders):
    with pytest.raises(ValueError, match="no rows"):
        distribution_drift(
            orders.filter(F.lit(False)), orders, "o_totalprice",
            ["o_orderkey"], n_buckets=10,
        )


def test_distribution_drift_constant_reference(spark):
    """Degenerate reference (one distinct value): every decile edge
    coincides, all reference mass lands in bucket 1, and a shifted current
    still reads as drift rather than crashing."""
    ref = spark.createDataFrame(
        [(i, 100.0) for i in range(50)], "id long, v double"
    )
    cur = spark.createDataFrame(
        [(i, 200.0) for i in range(50)], "id long, v double"
    )
    out = distribution_drift(ref, cur, "v", ["id"], n_buckets=10).collect()
    assert sum(r["ref_cnt"] for r in out) == 50
    assert sum(r["cur_cnt"] for r in out) == 50
    b1 = [r for r in out if r["bucket"] == 1][0]
    b10 = [r for r in out if r["bucket"] == 10][0]
    assert b1["ref_cnt"] == 50 and b10["cur_cnt"] == 50
    assert all(r["drifted"] for r in out)


def test_distribution_drift_nulls_excluded(spark, orders):
    cur = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 2 == 0, None).otherwise(
            F.col("o_totalprice")
        ),
    )
    out = distribution_drift(
        orders, cur, "o_totalprice", ["o_orderkey"], n_buckets=10
    ).collect()
    assert sum(r["cur_cnt"] for r in out) == cur.filter(
        "o_totalprice IS NOT NULL"
    ).count()


def test_distribution_drift_empty_current_is_max_drift(spark, orders):
    """A dead feed (current snapshot empty) must flag max TVD, not a NULL
    that silently passes both drifted==True and drifted==False checks."""
    out = distribution_drift(
        orders, orders.filter(F.lit(False)), "o_totalprice",
        ["o_orderkey"], n_buckets=10,
    ).collect()
    assert all(r["tvd_ppm"] == 1_000_000 and r["drifted"] for r in out)
