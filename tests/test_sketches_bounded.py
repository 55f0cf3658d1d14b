from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from pipelinewise_spark.operators.sketches import approx_stats
from pipelinewise_spark.sources.files import read_table
from pipelinewise_spark.streaming.bounded import run_bounded


def test_approx_stats_within_error(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    row = approx_stats(
        li, numeric_cols=["l_extendedprice"], distinct_cols=["l_orderkey"]
    ).collect()[0]

    exact_distinct = li.select("l_orderkey").distinct().count()
    approx = row["l_orderkey__approx_distinct"]
    assert abs(approx - exact_distinct) / exact_distinct < 0.05

    q = row["l_extendedprice__quantiles"]
    assert len(q) == 4 and q[0] <= q[1] <= q[2] <= q[3]
    exact_median = li.approxQuantile("l_extendedprice", [0.5], 0.0)[0]
    assert abs(q[1] - exact_median) / exact_median < 0.05


def test_run_bounded_stops_continuous_stream(spark, tmp_path):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "10").load()
    )
    query = (
        stream.writeStream.format("memory")
        .queryName("bounded_rate")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .start()
    )
    t0 = time.monotonic()
    finished = run_bounded(query, max_run_seconds=3)
    elapsed = time.monotonic() - t0
    assert finished is False  # rate source never self-terminates
    assert not query.isActive
    assert elapsed < 30


def test_run_bounded_available_now_self_terminates(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    src = os.path.join(str(tmp_path), "ev")
    events.limit(100).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    query = (
        stream.groupBy("event_type").count()
        .writeStream.format("memory")
        .queryName("bounded_avail")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    assert run_bounded(query, max_run_seconds=120) is True
    assert spark.sql("SELECT sum(count) c FROM bounded_avail").collect()[0].c == 100
