"""Focused tests for the round-14 ADVICE fixes and the bounded-await
containment (one wedged stream must never stall a whole bench session)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from pipelinewise_spark.partitioning import state_sized_shuffle
from pipelinewise_spark.streaming.bounded import await_bounded
from pipelinewise_spark.streaming.scd import read_closed_log


def test_state_sized_shuffle_malformed_env_falls_back(spark, monkeypatch):
    """A malformed PWS_STREAM_STATE_PARTITIONS must not fail the query —
    it falls back to the computed width (ADVICE r13)."""
    monkeypatch.setenv("PWS_STREAM_STATE_PARTITIONS", "8m")
    with state_sized_shuffle(spark, 1024) as width:
        assert width == min(8, spark.sparkContext.defaultParallelism)
    monkeypatch.setenv("PWS_STREAM_STATE_PARTITIONS", "3")
    with state_sized_shuffle(spark, 1024) as width:
        assert width == 3


def test_read_closed_log_skips_uncommitted_epochs(spark, tmp_path):
    """With the v2 committer a crashed epoch write leaves partial task
    files visible; read_closed_log must only surface epochs whose
    ``_COMMITTED`` marker (or legacy ``_SUCCESS``) exists (ADVICE r13)."""
    closed = str(tmp_path / "closed")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("attr", T.StringType()),
        ]
    )
    committed_df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    committed_df.write.parquet(os.path.join(closed, "epoch=0"))
    with open(os.path.join(closed, "epoch=0", "_COMMITTED"), "w") as fh:
        fh.write("")
    # epoch=1 simulates a crash: parquet data present, no marker
    crash_df = spark.createDataFrame([(9, "crash")], schema)
    crash_df.write.parquet(os.path.join(closed, "epoch=1"))
    marker = os.path.join(closed, "epoch=1", "_COMMITTED")
    assert not os.path.exists(marker)

    rows = {(r["k"], r["attr"]) for r in read_closed_log(spark, closed).collect()}
    assert rows == {(1, "a"), (2, "b")}

    # once the replay commits the epoch, it becomes visible
    with open(marker, "w") as fh:
        fh.write("")
    rows = {(r["k"], r["attr"]) for r in read_closed_log(spark, closed).collect()}
    assert rows == {(1, "a"), (2, "b"), (9, "crash")}


def test_await_bounded_drains_available_now(spark, tmp_path):
    """await_bounded is transparent for a normal availableNow drain."""
    src = str(tmp_path / "src")
    spark.range(10).write.parquet(src)
    stream = spark.readStream.schema("id long").parquet(src)
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_bounded(q)  # must not raise
    assert not q.isActive


def test_await_bounded_stops_wedged_stream(spark, tmp_path):
    """A stream that cannot finish inside the bound is stopped gracefully
    and surfaces as an explicit TimeoutError (bench records an error
    instead of hanging)."""
    stream = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        with pytest.raises(TimeoutError):
            await_bounded(q, max_run_seconds=2)
    finally:
        if q.isActive:
            q.stop()
    assert not q.isActive
