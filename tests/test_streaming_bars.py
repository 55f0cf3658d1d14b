"""Mergeable OHLC bar state (streaming/bars.py): folding the same events
in any batch partitioning and any order must produce identical bars —
the associativity/commutativity the streaming query's correctness rests
on — and a late event must fold into an already-published bar."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from pipelinewise_spark.streaming.bars import (
    bar_partials,
    finalize_bars,
    merge_bars,
)

KEYS = ["event_type", "bar_date"]
SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _events(rng, n=300):
    base = dt.datetime(2024, 1, 1)
    return [
        (
            i,
            base + dt.timedelta(minutes=rng.randrange(7 * 24 * 60)),
            rng.choice(["click", "view"]),
            round(rng.uniform(1, 100), 2),
        )
        for i in range(n)
    ]


def _fold(spark, batches):
    state = None
    for b in batches:
        partial = bar_partials(
            spark.createDataFrame(b, SCHEMA),
            "ts",
            "event_id",
            "value",
            ["event_type"],
        )
        state = partial if state is None else merge_bars(state, partial, KEYS)
    return {
        (r["event_type"], r["bar_date"]): (
            r["open"],
            r["high"],
            r["low"],
            r["close"],
            r["n_events"],
            r["total_value"],
        )
        for r in finalize_bars(state, KEYS).collect()
    }


def test_merge_bars_order_independent(spark):
    rng = random.Random(23)
    ev = _events(rng)
    rng.shuffle(ev)
    b1, b2, b3 = ev[:90], ev[90:200], ev[200:]
    whole = _fold(spark, [ev])
    assert whole == _fold(spark, [b1, b2, b3])
    assert whole == _fold(spark, [b3, b1, b2])
    assert whole  # non-degenerate


def test_merge_bars_late_event_updates_open(spark):
    day = dt.datetime(2024, 1, 5, 12)
    on_time = [(1, day, "click", 10.0), (2, day.replace(hour=13), "click", 30.0)]
    # late event EARLIER than the published open: must become the new open
    late = [(3, day.replace(hour=8), "click", 99.0)]
    bars = _fold(spark, [on_time, late])
    (o, hi, lo, c, n, tot) = bars[("click", dt.date(2024, 1, 5))]
    assert (o, hi, lo, c, n) == (99.0, 99.0, 10.0, 30.0, 3)
    assert abs(tot - 139.0) < 1e-9
