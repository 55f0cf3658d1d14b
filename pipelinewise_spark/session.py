"""SparkSession factory with scale-oriented defaults.

Single place where engine-wide configuration is decided so that tests, bench
and the driver contract all run identical plans.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for a local[32] dev box; on a real cluster the same knobs
#: scale by overriding via ``extra_conf`` (e.g. shuffle partitions ≈ 2-3× total
#: cores, maxPartitionBytes 128-256 MB). AQE re-coalesces at runtime either way.
_DEFAULT_CONF = {
    # deterministic timestamps across engines (DuckDB oracle is tz-naive UTC)
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime shuffle-partition coalescing, skew-join splitting
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # a local[32] box: keep shuffles wide enough to parallelize, small enough
    # to avoid tiny-task overhead at sf<=0.1
    "spark.sql.shuffle.partitions": "32",
    # Arrow for every pandas interchange (pandas UDFs, toPandas)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 100 TB stance: never silently truncate broadcast; 64 MB threshold lets
    # dims (region/nation/supplier/part at our SFs) broadcast while big facts shuffle
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # parquet: vectorized reader + pushdown are defaults, stated for clarity
    "spark.sql.parquet.filterPushdown": "true",
    # tolerate TIMESTAMP(NANOS) parquet (read as long; sources convert to µs)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Spark 4.1's checkpoint-file checksums leave their
    # ChecksumCheckpointFileManager threads alive after a streaming query
    # stops (~40 threads per bounded run, measured): a long multi-query
    # session accumulates hundreds of dead-pool threads and every
    # subsequent query slows ~2x under the scheduler/GC-root load. The
    # checksums also add one sidecar write per checkpoint commit. Engine
    # default is OFF — bounded fixture streams re-run from source on
    # corruption; durability-critical deployments can re-enable per
    # session (the sidecars are additive and ignored when off).
    "spark.sql.streaming.checkpoint.fileChecksum.enabled": "false",
    # quieter local runs
    "spark.ui.enabled": "false",
    # the status store tracks jobs/stages/executions even with the UI off;
    # a long single session (bench: 119 queries; a production daemon:
    # unbounded) otherwise accumulates listener state on the driver heap
    "spark.sql.ui.retainedExecutions": "8",
    "spark.ui.retainedJobs": "100",
    "spark.ui.retainedStages": "100",
    "spark.ui.retainedTasks": "2000",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "pipelinewise-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
