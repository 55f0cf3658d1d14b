"""Pins for StreamingQualityMonitor (operators/monitors.py): state is
constant-size and restartable, folds are idempotent per epoch, and the
drained report equals the batch twin — including the HLL register fold,
which must be BIT-equal to the one-shot aggregate, not merely close."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pipelinewise_spark.operators.monitors import (
    StreamingQualityMonitor,
    quality_report_streamable,
)


def _frames(spark):
    ref = spark.range(0, 2000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("seg"),
        (F.col("id") % 97).alias("k"),
        (F.col("id") % 100 + 1).cast("double").alias("v"),
        F.to_date(F.lit("2024-01-10")).alias("d"),
    )
    cur = spark.range(2000, 4000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("seg"),
        (F.col("id") % 11).alias("k"),  # cardinality collapse everywhere
        (F.col("id") % 100 + 21).cast("double").alias("v"),  # +20 shift
        F.to_date(F.lit("2024-01-12")).alias("d"),
    )
    return ref, cur


def test_fold_equals_batch_twin_and_state_is_bounded(spark, tmp_path):
    ref, cur = _frames(spark)
    mon = StreamingQualityMonitor(
        ref, "v", "k", "seg", ["event_id"], str(tmp_path / "st"),
        date_col="d", freshness_sla_days=1,
    )
    parts = [cur.filter(F.col("event_id") % 4 == i) for i in range(4)]
    for i, p in enumerate(parts):
        mon.on_batch(p, i)
    got = sorted(map(tuple, mon.report(spark).collect()))
    want = sorted(
        map(
            tuple,
            quality_report_streamable(
                ref, cur, "v", "k", "seg", ["event_id"], date_col="d",
                freshness_sla_days=1,
            ).collect(),
        )
    )
    assert got == want
    flags = {(r[0], r[1]): r[4] for r in got}
    assert all(flags[("cardinality", s)] for s in "012")
    assert all(flags[("tvd", s)] for s in "012")
    # state is O(segments): 3 segments x (10 buckets + scalars + 1 blob)
    st = json.loads((tmp_path / "st" / "_quality_state.json").read_text())
    assert set(st["vol_cur"]) == {"0", "1", "2"}
    assert len(st["ben_cur"]) <= 9
    assert st["n_applied"] == 4


def test_replay_and_restart_are_lossless(spark, tmp_path):
    ref, cur = _frames(spark)
    sd = str(tmp_path / "st")
    mon = StreamingQualityMonitor(
        ref, "v", "k", "seg", ["event_id"], sd, date_col="d"
    )
    half = cur.filter(F.col("event_id") % 2 == 0)
    mon.on_batch(half, 0)
    # replay of a folded epoch: no-op
    mon.on_batch(half, 0)
    assert mon.state["n_applied"] == 1
    # restart: a new monitor on the same state dir resumes (the
    # reference frame is not re-scanned — state wins)
    mon2 = StreamingQualityMonitor(
        ref.limit(0), "v", "k", "seg", ["event_id"], sd, date_col="d"
    )
    assert mon2.state["n_applied"] == 1
    mon2.on_batch(cur.filter(F.col("event_id") % 2 == 1), 1)
    got = sorted(map(tuple, mon2.report(spark).collect()))
    want = sorted(
        map(
            tuple,
            quality_report_streamable(
                ref, cur, "v", "k", "seg", ["event_id"], date_col="d"
            ).collect(),
        )
    )
    assert got == want


def test_rank_monitors_absent_by_design(spark, tmp_path):
    ref, cur = _frames(spark)
    mon = StreamingQualityMonitor(
        ref, "v", "k", "seg", ["event_id"], str(tmp_path / "st")
    )
    mon.on_batch(cur, 0)
    monitors = {
        r["monitor"] for r in mon.report(spark).select("monitor").collect()
    }
    # ks/mw need value-domain-scale state — nightly batch only
    assert monitors == {"volume", "cardinality", "tvd", "benford"}
