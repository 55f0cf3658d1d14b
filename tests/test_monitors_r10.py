"""r10 observability consolidation, pinned by test.

- volume_drift / segment_scalar_drift: appeared and vanished segments are
  maximal drift; organic deltas score exactly |cur−ref|/ref in ppm.
- cardinality_drift_hll: the 100 TB swap keeps the exact monitor's report
  contract — same columns, estimates inside the ±2% envelope, flags
  agreeing with the exact monitor on a far-from-threshold corpus.
- quality_report: one row per (monitor, segment) cell of the matrix, the
  injected '2-HIGH' location shift flags on the rank monitors (ks, mw)
  and NOT on the scalar monitors (volume, cardinality), and the whole
  composed plan keeps the kernels' no-SinglePartition shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pipelinewise_spark.operators.drift import (
    cardinality_drift,
    cardinality_drift_hll,
    volume_drift,
)
from pipelinewise_spark.operators.monitors import quality_report
from pipelinewise_spark.sources.files import read_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_volume_drift_segments_appear_vanish(spark):
    ref = spark.createDataFrame(
        [("a",)] * 10 + [("gone",)] * 4, "segment string"
    ).select(F.col("segment").alias("s"))
    cur = spark.createDataFrame(
        [("a",)] * 15 + [("new",)] * 3, "segment string"
    ).select(F.col("segment").alias("s"))
    rows = {r["segment"]: r for r in volume_drift(ref, cur, "s").collect()}
    assert rows["a"]["delta_ppm"] == 500_000 and rows["a"]["drifted"]
    assert rows["gone"]["delta_ppm"] == 1_000_000 and rows["gone"]["drifted"]
    assert rows["new"]["delta_ppm"] == 1_000_000 and rows["new"]["drifted"]
    assert rows["new"]["ref_rows"] == 0 and rows["new"]["cur_rows"] == 3


def test_cardinality_hll_matches_exact_contract(spark):
    ev = read_table(spark, SF, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    ref, cur = ev.filter(F.col("ts") < cut), ev.filter(F.col("ts") >= cut)
    exact = {
        r["segment"]: r
        for r in cardinality_drift(ref, cur, "user_id", "event_type")
        .collect()
    }
    est = {
        r["segment"]: r
        for r in cardinality_drift_hll(ref, cur, "user_id", "event_type")
        .collect()
    }
    assert set(exact) == set(est)
    for seg, e in exact.items():
        h = est[seg]
        for c in ("ref_distinct", "cur_distinct"):
            assert abs(h[c] - e[c]) <= 0.02 * e[c], (seg, c, h[c], e[c])
        assert h["drifted"] == e["drifted"], seg


def test_quality_report_matrix_flags(spark):
    o = read_table(spark, SF, "orders")
    cut = F.lit("1998-01-01").cast("date")
    ref = o.filter(F.col("o_orderdate") < cut)
    cur = o.filter(F.col("o_orderdate") >= cut).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderpriority") == "2-HIGH",
            F.col("o_totalprice") + F.lit("50000.00").cast("decimal(12,2)"),
        ).otherwise(F.col("o_totalprice")),
    )
    rep = quality_report(
        ref, cur,
        value_col="o_totalprice", key_col="o_custkey",
        segment_col="o_orderpriority", tie_cols=["o_orderkey"],
        date_col="o_orderdate",
    )
    plan = _plan(rep)
    # The composed plan DOES contain SinglePartition exchanges — the
    # legitimate 1-row scalar reductions (TVD totals, Benford N, the
    # freshness watermark), each fed by map-side partials. What must
    # never appear: a corpus-wide Window (the per-segment running counts
    # come from the grouped two-phase prefix sum) or a cartesian.
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    rows = rep.collect()
    cells = {(r["monitor"], r["segment"]): r for r in rows}
    assert len(cells) == len(rows), "duplicate (monitor, segment) cells"
    monitors = {m for m, _ in cells}
    assert monitors == {
        "volume", "cardinality", "tvd", "ks", "mw", "benford", "freshness"
    }
    # the injected location shift is a rank-monitor finding, not a
    # row-count/id-space one: KS flags it even at sf0.001, and the MW
    # deviation for 2-HIGH dominates every organic segment's (at this
    # tiny SF the +50k shift sits just under MW's 100k ppm threshold —
    # the sf0.01 oracle run exercises the flag itself)
    assert cells[("ks", "2-HIGH")]["drifted"]
    mw_metrics = {s: r["metric"] for (m, s), r in cells.items() if m == "mw"}
    assert max(mw_metrics, key=mw_metrics.get) == "2-HIGH", mw_metrics
    assert not cells[("volume", "2-HIGH")]["drifted"]
    assert not cells[("cardinality", "2-HIGH")]["drifted"]
    # KS rows carry their own per-segment critical bound as threshold
    ks_cell = cells[("ks", "1-URGENT")]
    assert ks_cell["threshold"] is not None and ks_cell["threshold"] > 0
    # freshness audits the current epoch: every segment ends within the
    # TPC-H generator's last weeks -> lag well under the 30-day SLA
    for (m, s), r in cells.items():
        if m == "freshness":
            assert not r["drifted"], (s, r)


def test_quality_report_empty_segment_sides(spark):
    ref = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 2), ("b", 9.0, 3)] * 4,
        "seg string, v double, k long",
    )
    cur = spark.createDataFrame(
        [("a", 1.5, 1), ("a", 2.5, 2), ("c", 9.0, 3)] * 4,
        "seg string, v double, k long",
    )
    rep = quality_report(
        ref, cur, value_col="v", key_col="k", segment_col="seg",
        tie_cols=["k"], n_buckets=2,
    )
    cells = {(r["monitor"], r["segment"]): r for r in rep.collect()}
    # 'b' vanished, 'c' appeared: maximal drift on every epoch monitor,
    # with the KS critical bound undefined (NULL) there
    for seg in ("b", "c"):
        for m in ("volume", "cardinality", "ks", "mw"):
            assert cells[(m, seg)]["drifted"], (m, seg)
        assert cells[("ks", seg)]["metric"] == 1_000_000
        assert cells[("ks", seg)]["threshold"] is None


def test_segmented_stream_monitor_equals_batch(spark):
    """Drain a stream whose rows are exactly `current` through the
    segmented monitor: the folded report must equal
    distribution_drift_by_segment row-for-row (stream = batch), and
    epoch redelivery must be a no-op."""
    import tempfile

    from pipelinewise_spark.operators.drift import (
        SegmentedStreamingDriftMonitor,
        distribution_drift_by_segment,
    )

    ev = read_table(spark, SF, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "value",
        F.when(F.col("event_type") == "click", F.col("value") + 50.0)
        .otherwise(F.col("value")),
    )
    mon = SegmentedStreamingDriftMonitor(
        ref, "value", ["event_id"], "event_type",
        tempfile.mkdtemp(prefix="pws_segmon_"), n_buckets=5,
    )
    # fold `cur` as three uneven batches (associativity is the claim)
    mon.on_batch(cur.filter(F.col("event_id") % 5 < 2), 0)
    mon.on_batch(cur.filter(F.col("event_id") % 5 == 2), 1)
    mon.on_batch(cur.filter(F.col("event_id") % 5 > 2), 2)
    mon.on_batch(cur.limit(100), 1)  # redelivery: no-op
    got = sorted(map(tuple, mon.report(spark).collect()))
    want = sorted(map(tuple, distribution_drift_by_segment(
        ref, cur, "value", ["event_id"], "event_type", n_buckets=5
    ).collect()))
    assert got == want
