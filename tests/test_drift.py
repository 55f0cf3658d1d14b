"""Drift detection: null-rate drift flags independently of mean drift."""

from __future__ import annotations

from pipelinewise_spark.operators.drift import snapshot_drift


def test_null_rate_drift_flags(spark):
    old = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    )
    # same mean, but 10% of values go NULL
    new = spark.createDataFrame(
        [(i, None if i % 10 == 0 else float(i)) for i in range(100)],
        "id long, v double",
    )
    rep = {r["column"]: r for r in snapshot_drift(
        old, new, ["v"], mean_shift_threshold=0.5, null_rate_threshold=0.05
    ).collect()}
    assert rep["v"]["drifted"] is True
    assert abs(rep["v"]["new_null_rate"] - 0.1) < 1e-9

    rep2 = {r["column"]: r for r in snapshot_drift(
        old, old, ["v"], null_rate_threshold=0.05
    ).collect()}
    assert rep2["v"]["drifted"] is False
