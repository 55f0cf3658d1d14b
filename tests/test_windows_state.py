"""Windowed + stateful streaming: batch/stream unification and
applyInPandasWithState cross-batch state."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from pipelinewise_spark.sources.files import read_table
from pipelinewise_spark.streaming.windows import (
    running_user_totals,
    windowed_counts,
)


def test_windowed_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    """The same transformation over readStream (AvailableNow → memory sink)
    must produce exactly the batch result — Structured Streaming's
    unification contract."""
    events = read_table(spark, sf_dir, "events")
    batch = {
        (r.window_start, r.window_end, r.user_id): (r.n_events, r.value_sum)
        for r in windowed_counts(events, by=["user_id"]).collect()
    }

    src = os.path.join(str(tmp_path), "events_parquet")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        windowed_counts(stream, by=["user_id"])
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.window_start, r.window_end, r.user_id): (r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert streamed == batch and len(batch) > 0


def test_running_totals_state_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: state accumulates across micro-batches; the
    final emitted totals equal the batch groupBy."""
    events = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    expected = {
        r.user_id: (r.n, round(r.s, 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    src = os.path.join(str(tmp_path), "ev")
    # two files → with maxFilesPerTrigger=1, two micro-batches
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per user = final running total
    rows = spark.sql(
        """SELECT user_id, n_events, value_sum FROM (
               SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) rn
               FROM running_totals) WHERE rn = 1"""
    ).collect()
    got = {r.user_id: (r.n_events, round(r.value_sum, 6)) for r in rows}
    assert got == {u: (n, round(s, 6)) for u, (n, s) in expected.items()}


def test_streaming_dedupe_within_watermark(spark, tmp_path):
    """Duplicate content fingerprints on an event stream are dropped on
    ingest; state stays bounded by the watermark."""
    import os

    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from pipelinewise_spark.streaming.windows import streaming_dedupe

    src = str(tmp_path / "in")
    os.makedirs(src)
    rows = [
        {"fp": "a", "ts": "2026-01-01 10:00:00", "doc": "d1"},
        {"fp": "a", "ts": "2026-01-01 10:00:30", "doc": "d1-dup"},
        {"fp": "b", "ts": "2026-01-01 10:01:00", "doc": "d2"},
        {"fp": "b", "ts": "2026-01-01 10:02:00", "doc": "d2-dup"},
        {"fp": "c", "ts": "2026-01-01 10:03:00", "doc": "d3"},
    ]
    import json
    with open(os.path.join(src, "batch.jsonl"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    schema = T.StructType([
        T.StructField("fp", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("doc", T.StringType()),
    ])
    stream = (
        spark.readStream.schema(schema).json(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = streaming_dedupe(stream, ["fp"], ts_col="ts", watermark="10 minutes")
    out_dir = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.fp: r.doc for r in spark.read.parquet(out_dir).collect()}
    assert set(got) == {"a", "b", "c"}
    assert got["a"] == "d1" and got["b"] == "d2"  # first occurrence survives

    # batch path: same call site, global dedupe
    batch = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "z")], "fp string, doc string"
    )
    assert streaming_dedupe(batch, ["fp"]).count() == 2


def test_streaming_dedupe_state_survives_restart(spark, tmp_path):
    """Dedup state persists in the checkpoint: a duplicate arriving in a
    LATER RUN of the query (not merely a later micro-batch) is still
    dropped, as long as it lands within the watermark horizon — the
    checkpoint-resume contract that makes ingest-dedup correct across
    pipeline restarts."""
    import json
    import os

    import pyspark.sql.functions as F
    import pyspark.sql.types as T

    from pipelinewise_spark.streaming.windows import streaming_dedupe

    src = str(tmp_path / "in")
    os.makedirs(src)
    schema = T.StructType([
        T.StructField("fp", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("doc", T.StringType()),
    ])
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema(schema).json(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        deduped = streaming_dedupe(
            stream, ["fp"], ts_col="ts", watermark="10 minutes"
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: originals
    with open(os.path.join(src, "b1.jsonl"), "w") as fh:
        for r in [
            {"fp": "a", "ts": "2026-01-01 10:00:00", "doc": "d1"},
            {"fp": "b", "ts": "2026-01-01 10:01:00", "doc": "d2"},
        ]:
            fh.write(json.dumps(r) + "\n")
    run_once()

    # run 2 (fresh query, same checkpoint): a duplicate of fp=a within the
    # horizon plus one genuinely new key
    with open(os.path.join(src, "b2.jsonl"), "w") as fh:
        for r in [
            {"fp": "a", "ts": "2026-01-01 10:02:00", "doc": "d1-dup"},
            {"fp": "c", "ts": "2026-01-01 10:03:00", "doc": "d3"},
        ]:
            fh.write(json.dumps(r) + "\n")
    run_once()

    got = {r.fp: r.doc for r in spark.read.parquet(out_dir).collect()}
    assert got == {"a": "d1", "b": "d2", "c": "d3"}  # cross-run dup dropped
