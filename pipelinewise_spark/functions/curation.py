"""Training-data curation operators: deterministic sampling, quality
filtering, token-budget sharding.

Every operator here is (a) deterministic — re-running a 100 TB curation job
must select the same rows, so sampling derives from md5 of the key, never
``rand()`` — and (b) engine-portable, so each query has an exact DuckDB
oracle (md5 hex and integer arithmetic agree everywhere).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def uniform_hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic uniform bucket in [0, buckets): first 8 md5 hex chars
    of the key as an integer. The engine-portable substitute for rand() —
    identical in Spark, DuckDB, and any warehouse with md5()."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long") % buckets
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, int],
    default_rate: int = 0,
) -> DataFrame:
    """Keep ``rates[stratum]`` percent of each stratum (0-100), chosen by
    the deterministic key hash — per-class downsampling for training mixes
    (e.g. keep 50% en, 20% everything else). Pure projection + filter:
    no shuffle, no state, trivially resumable."""
    bucket = uniform_hash_bucket(F.col(key_col))
    rate: Column = F.lit(default_rate)
    for value, pct in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(pct)).otherwise(rate)
    return df.filter(bucket < rate)


def top_fraction_by(
    df: DataFrame,
    stratum_col: str,
    order_col: str,
    key_col: str,
    fraction: float,
) -> DataFrame:
    """Keep the top ``fraction`` of each stratum by ``order_col`` (ties
    broken on the key, so both engines pick identical rows). Quality
    filtering as rank-cutoff — exact and deterministic where a float
    percentile threshold would flip rows on last-ulp differences.

    Scale: one window per stratum (shuffle on the stratum key); for global
    top-fraction over skewless scores, swap in an approx-quantile threshold
    instead."""
    w = Window.partitionBy(stratum_col).orderBy(
        F.col(order_col).desc(), F.col(key_col).asc()
    )
    cnt = Window.partitionBy(stratum_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count("*").over(cnt))
        .filter(F.col("__rn") <= F.floor(F.col("__n") * fraction))
        .drop("__rn", "__n")
    )


def shard_by_token_budget(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign rows (ordered by key) to training shards so each shard holds
    ~``budget`` tokens: shard = floor(prefix_sum_before_row / budget).

    A single global running-sum window would serialize onto one task; this
    is the classic TWO-PHASE distributed prefix sum instead: range-partition
    by key (so partitions are key-ordered), per-partition running sums in
    parallel, then add each partition's broadcast offset (#partitions rows
    of driver metadata — never row data)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, F.col(key_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("__run", F.sum(F.col(tokens_col)).over(w_in))
    # per-partition totals -> cumulative offsets (metadata-scale collect)
    totals = {
        r["__pid"]: r["t"]
        for r in d.groupBy("__pid").agg(F.max("__run").alias("t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off: Column = F.lit(0)
    for pid, o in offsets.items():
        off = F.when(F.col("__pid") == pid, F.lit(o)).otherwise(off)
    cum = F.col("__run") + off
    return d.withColumn(
        "shard",
        F.floor((cum - F.col(tokens_col)) / F.lit(budget)).cast("long"),
    ).drop("__pid", "__run")


def weighted_sample_top_n(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    n: int,
    stratum_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): rank by u^(1/w) where u = the uniform md5 hash of the
    key in (0,1); keep the top ``n`` (per stratum if given). Heavier rows
    are proportionally likelier to survive, yet reruns pick identical rows —
    the reproducibility contract a 100 TB curation job needs. One window
    shuffle; no driver state.

    The A-ES key is computed as (1/w)·ln(u) (monotone in u^(1/w)) to stay
    in a numerically safe range; ties on the md5 are broken by key.
    """
    u = (
        uniform_hash_bucket(F.col(key_col), buckets=2**31 - 1).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**31))  # (0, 1]
    score = F.log(u) / F.col(weight_col).cast("double")  # maximize => top-n
    strata = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*strata).orderBy(
        score.desc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
