"""Watermarked stream-stream joins (SURVEY §2.5 engine-native capability).

The reference has no stream-stream join — Singer taps are independent pipes
and any correlation happens in the warehouse after load. Spark Structured
Streaming joins two live streams directly: both sides carry a watermark and
the join condition carries a time-interval bound, so the state store only
buffers rows inside (watermark + interval) and evicts everything older —
bounded memory at any throughput. The streamed result is exactly the batch
inequality join over the same data (tested both ways).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | tuple[str, str],
    left_ts: str,
    right_ts: str,
    upper: str,
    watermark: str = "2 hours",
    extra: Column | None = None,
) -> DataFrame:
    """Inner join of two (possibly streaming) frames where the right-side
    event lands within ``[left_ts, left_ts + upper]`` — click→purchase
    attribution, order→shipment matching, etc.

    ``upper`` is a SQL interval literal body (e.g. ``"2 hours"``). Both
    sides are watermarked with ``watermark``; for a streaming source this
    makes join state evictable (Spark derives each side's state horizon
    from the watermark plus the interval bounds). On batch frames the
    watermark is a no-op and the same plan is a plain range join.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    lkey, rkey = (on, on) if isinstance(on, str) else on
    key = lw[lkey] == rw[rkey]
    cond = (
        key
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    if extra is not None:
        cond = cond & extra
    return lw.join(rw, cond, "inner")
