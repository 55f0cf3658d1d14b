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


# ------------------------------------------- histogram quantile sketches
def _hist_mod():
    from pipelinewise_spark.operators import sketches as S
    return S


def test_histogram_sketch_bound_and_upper_edge(spark):
    S = _hist_mod()
    n, B, lo, hi = 5000, 256, 0.0, 100.0
    df = spark.range(n).select(
        (F.col("id") % 4).alias("g"), (F.rand(seed=7) * 100).alias("v")
    )
    sk = S.histogram_sketch_table(df, ["g"], "v", lo, hi, B)
    est = {
        r["g"]: r["quantile_est"]
        for r in S.histogram_quantile(sk, 0.5, lo, hi).collect()
    }
    # rank-based exact target: x_(ceil(0.5 n_g)) per group
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("v")
    cnt = Window.partitionBy("g")
    exact = {
        r["g"]: r["v"]
        for r in df.withColumn("rn", F.row_number().over(w))
        .withColumn("c", F.count("*").over(cnt))
        .filter(F.col("rn") == F.ceil(F.col("c") * 0.5))
        .collect()
    }
    width = (hi - lo) / B
    for g in exact:
        assert 0 <= est[g] - exact[g] <= width, (g, est[g], exact[g])


def test_histogram_rollup_exactly_mergeable(spark):
    S = _hist_mod()
    df = spark.range(4000).select(
        (F.col("id") % 3).alias("a"), (F.col("id") % 5).alias("b"),
        (F.rand(seed=3) * 10 - 2).alias("v"),  # exercises clamping too
    )
    fine = S.histogram_sketch_table(df, ["a", "b"], "v", 0.0, 8.0, 64)
    rolled = S.histogram_rollup(fine, ["a"]).orderBy("a")
    direct = S.histogram_sketch_table(df, ["a"], "v", 0.0, 8.0, 64) \
        .orderBy("a")
    assert [r.asDict() for r in rolled.collect()] == [
        r.asDict() for r in direct.collect()
    ], "rollup must be BIT-identical to a direct build"


def test_histogram_sketch_deterministic_across_partitions(spark):
    S = _hist_mod()
    df = spark.range(999).select(
        F.lit(0).alias("g"), (F.col("id") * 0.37).alias("v")
    )
    a = S.histogram_sketch_table(df.repartition(3), ["g"], "v", 0, 400, 32)
    b = S.histogram_sketch_table(df.repartition(17), ["g"], "v", 0, 400, 32)
    assert a.collect() == b.collect()


def test_histogram_apply_feed_matches_rebuild_bit_exact(spark):
    S = _hist_mod()
    df = spark.range(2000).select(
        (F.col("id") % 4).alias("g"), (F.rand(seed=5) * 50).alias("v")
    )
    sk = S.histogram_sketch_table(df, ["g"], "v", 0.0, 50.0, 128)
    # feed: delete 30% (g-dependent), insert shifted replacements
    dels = df.filter((F.col("id") % 10) < 3) \
        .withColumn("_change_type", F.lit("delete"))
    ins = df.filter((F.col("id") % 10) < 3) \
        .withColumn("v", (F.col("v") + 7) % 50) \
        .withColumn("_change_type", F.lit("insert"))
    feed = dels.unionByName(ins)
    maintained = S.histogram_apply_feed(
        sk, feed, ["g"], "v", 0.0, 50.0, 128
    )
    new_state = df.filter((F.col("id") % 10) >= 3).unionByName(
        ins.drop("_change_type")
    )
    rebuilt = S.histogram_sketch_table(new_state, ["g"], "v", 0.0, 50.0, 128)
    a = sorted((r.asDict() for r in maintained.collect()),
               key=lambda d: d["g"])
    b = sorted((r.asDict() for r in rebuilt.collect()),
               key=lambda d: d["g"])
    assert a == b, "maintained sketch must equal rebuild BIT-exactly"


def test_histogram_apply_feed_drops_emptied_groups(spark):
    S = _hist_mod()
    df = spark.range(20).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("double").alias("v")
    )
    sk = S.histogram_sketch_table(df, ["g"], "v", 0.0, 20.0, 16)
    feed = df.filter(F.col("g") == 1) \
        .withColumn("_change_type", F.lit("delete"))
    out = S.histogram_apply_feed(sk, feed, ["g"], "v", 0.0, 20.0, 16)
    assert [r["g"] for r in out.collect()] == [0]
