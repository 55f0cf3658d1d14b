"""StreamingKSMonitor (operators/drift.py): the approximate streaming
KS closes the last monitor-matrix batch/stream asymmetry — per-segment
histogram-CDF state, provable d_lo <= exact <= d_hi sandwich against
the exact batch KS, split-invariant folds, replay/restart safety."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pipelinewise_spark.operators.drift import (
    StreamingKSMonitor,
    ks_drift_by_segment,
)


def _frames(spark):
    ref = spark.range(0, 3000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("seg"),
        (F.col("id") % 100 + 1).cast("double").alias("v"),
    )
    # segment '1' carries a +30 location shift; the others are the same
    # distribution (natural parity noise only)
    cur = spark.range(3000, 6000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("seg"),
        F.when(
            (F.col("id") % 3) == 1,
            (F.col("id") % 100 + 31).cast("double"),
        ).otherwise((F.col("id") % 100 + 1).cast("double")).alias("v"),
    )
    return ref, cur


def test_bounds_sandwich_exact_ks_and_flags(spark, tmp_path):
    ref, cur = _frames(spark)
    mon = StreamingKSMonitor(
        ref, "v", ["event_id"], "seg", str(tmp_path / "st"), n_buckets=64
    )
    for i in range(4):
        mon.on_batch(cur.filter(F.col("event_id") % 4 == i), i)
    rep = {r["segment"]: r for r in mon.report(spark).collect()}
    exact = {
        r["segment"]: r
        for r in ks_drift_by_segment(ref, cur, "v", "seg").collect()
    }
    assert set(rep) == set(exact) == {"0", "1", "2"}
    for seg in rep:
        lo, hi = rep[seg]["d_lo_ppm"], rep[seg]["d_hi_ppm"]
        d = exact[seg]["d_ppm"]
        assert lo <= d <= hi, (seg, lo, d, hi)
        # bound width <= one bucket's smaller-side mass: ~1/64 of the
        # reference, widened where the 100-value integer domain ties
        # two values into one bucket (2/100 = 20000 ppm)
        assert rep[seg]["err_bound_ppm"] <= 30_000
    # the shifted segment pages; the unshifted ones do not even under
    # the conservative d_hi test
    assert rep["1"]["significant"]
    assert not rep["0"]["significant"] and not rep["2"]["significant"]


def test_fold_is_split_invariant_and_replay_safe(spark, tmp_path):
    ref, cur = _frames(spark)
    reports = []
    for run, nparts in enumerate((2, 5)):
        mon = StreamingKSMonitor(
            ref, "v", ["event_id"], "seg",
            str(tmp_path / f"st{run}"), n_buckets=16,
        )
        for i in range(nparts):
            mon.on_batch(cur.filter(F.col("event_id") % nparts == i), i)
        reports.append(sorted(map(tuple, mon.report(spark).collect())))
    assert reports[0] == reports[1]  # sum-mergeable state: split-blind

    sd = str(tmp_path / "st_replay")
    mon = StreamingKSMonitor(ref, "v", ["event_id"], "seg", sd, 16)
    half = cur.filter(F.col("event_id") % 2 == 0)
    mon.on_batch(half, 0)
    mon.on_batch(half, 0)  # at-least-once redelivery: no-op
    assert mon.state["n_applied"] == 1
    # restart: a fresh monitor resumes from state (reference not rescanned)
    mon2 = StreamingKSMonitor(
        ref.limit(0), "v", ["event_id"], "seg", sd, 16
    )
    mon2.on_batch(cur.filter(F.col("event_id") % 2 == 1), 1)
    done = StreamingKSMonitor(ref, "v", ["event_id"], "seg",
                              str(tmp_path / "st_oneshot"), 16)
    done.on_batch(cur, 0)
    assert sorted(map(tuple, mon2.report(spark).collect())) == sorted(
        map(tuple, done.report(spark).collect())
    )
    # state is O(segments x buckets): 3 x 16 counts per side
    st = json.loads(
        (tmp_path / "st_replay" / "_ks_state.json").read_text()
    )
    assert set(st["cur"]) == {"0", "1", "2"}
    assert all(len(b) == 16 for b in st["cur"].values())


def test_empty_side_is_maximal_drift(spark, tmp_path):
    ref, cur = _frames(spark)
    mon = StreamingKSMonitor(
        ref, "v", ["event_id"], "seg", str(tmp_path / "st"), n_buckets=16
    )
    # drain NOTHING: every segment is empty on the current side
    rep = mon.report(spark).collect()
    assert all(
        r["d_lo_ppm"] == 1_000_000 and r["significant"] for r in rep
    )


def test_mw_bracket_sandwiches_exact_u_and_flags(spark, tmp_path):
    """The SAME drained histogram state brackets Mann-Whitney: the
    doubled U sandwich u2_lo <= exact u2 <= u2_hi holds segment-wise,
    the effect bracket contains the exact effect, the shifted segment
    pages and the unshifted ones do not (bracket fully inside the
    100k-ppm band)."""
    from pipelinewise_spark.operators.drift import mw_drift_by_segment

    ref, cur = _frames(spark)
    mon = StreamingKSMonitor(
        ref, "v", ["event_id"], "seg", str(tmp_path / "st"), n_buckets=64
    )
    for i in range(3):
        mon.on_batch(cur.filter(F.col("event_id") % 3 == i), i)
    got = {r["segment"]: r for r in mon.mw_report(spark).collect()}
    exact = {
        r["segment"]: r
        for r in mw_drift_by_segment(ref, cur, "v", "seg").collect()
    }
    for seg in got:
        g, e = got[seg], exact[seg]
        assert g["u2_lo"] <= e["u_ref_x2"] <= g["u2_hi"], (seg, g, e)
        assert (
            g["effect_lo_ppm"] <= e["effect_ppm"] <= g["effect_hi_ppm"]
        )
        assert g["err_bound_ppm"] <= 30_000  # ~1/64 + integer-tie slack
    assert got["1"]["drifted"] and exact["1"]["drifted"]
    assert not got["0"]["drifted"] and not got["2"]["drifted"]
