"""Windowed / stateful stream processing.

The reference has no time-windowed computation (SURVEY §2.5) — these are
engine-native capabilities a Spark-first pipeline gets for free and a
training-data pipeline needs (event rollups, per-key running state):

- ``windowed_counts``: tumbling event-time windows with a watermark for late
  data. The same Column expression tree serves batch and streaming (the
  Structured Streaming unification — test drives both paths).
- ``running_user_totals``: custom stateful operator via
  ``applyInPandasWithState`` — per-key state that survives across
  micro-batches (the applyInPandasWithState contract: GroupState timeout,
  Arrow-batched per-group pandas frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    by: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window counts (+ value sum); watermark bounds state on the
    streaming path and is a no-op in batch."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window_duration)] + [
        F.col(c) for c in (by or [])
    ]
    return (
        df.groupBy(*keys)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(by or []),
            "n_events",
            "value_sum",
        )
    )


RUNNING_TOTAL_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)
RUNNING_TOTAL_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def _update_running_totals(key, pdfs, state: GroupState):
    """applyInPandasWithState update fn: accumulate per-user counts/sums
    across micro-batches; emit the running total each batch the key appears."""
    import pandas as pd

    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "value_sum": [s]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (cross-batch) event count and value sum — the custom
    stateful operator pattern (applyInPandasWithState)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTAL_OUTPUT,
        stateStructType=RUNNING_TOTAL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedupe(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact-dedup: drop duplicate keys arriving within the
    watermark horizon (``dropDuplicatesWithinWatermark`` — state is bounded
    by the watermark instead of growing forever, which is what makes
    dedup-on-ingest viable on an unbounded 100 TB/day stream; classic
    ``dropDuplicates`` on a stream retains every key seen).

    The batch path uses plain dropDuplicates so one call site serves both
    (stream ≡ batch, modulo the horizon: batch dedupes globally).
    """
    if stream.isStreaming:
        return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return stream.dropDuplicates(keys)
