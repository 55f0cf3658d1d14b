"""Kafka-shaped stream source.

The reference's tap-kafka emits per-message records
``{message, message_partition, message_offset, message_timestamp}`` plus
primary keys extracted from the JSON payload by path, with offset/timestamp/
start-time seek and bounded runs (tap_kafka/sync.py:177-200 record shape,
:250-320 seek, :426-430 max_runtime_ms).

Spark mapping:
- a real broker: ``spark.readStream.format('kafka')`` with
  ``startingOffsets`` JSON — gated behind availability (the connector jar
  isn't in this environment); the transform below is source-agnostic.
- this repo's tests: any DataFrame (batch or streaming) with a JSON payload
  column becomes the tap-kafka record shape via ``to_kafka_records`` —
  pure Column expressions.
- bounded runs ≈ ``Trigger.AvailableNow``; bookmarks ≈ checkpoint offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Real Kafka readStream (requires the spark-sql-kafka package)."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # connector jar missing in this environment
        raise NotImplementedError(
            "spark-sql-kafka connector not available; use to_kafka_records "
            "over a file-backed stream instead"
        ) from exc


def to_kafka_records(
    df: DataFrame,
    message_col: str,
    partition_by: F.Column,
    order_by: F.Column,
    timestamp_col: str,
    primary_key_path: str | None = None,
) -> DataFrame:
    """Shape any frame into tap-kafka's record layout.

    ``message_offset`` is the per-partition arrival rank (what a broker
    assigns); ``message_timestamp`` is epoch millis. ``primary_key_path``
    optionally extracts a PK from the JSON payload (tap-kafka's JSON-path
    PKs) as column ``pk``.
    """
    w = Window.partitionBy(partition_by).orderBy(order_by)
    out = df.select(
        F.col(message_col).alias("message"),
        partition_by.cast("int").alias("message_partition"),
        (F.row_number().over(w) - 1).cast("long").alias("message_offset"),
        F.unix_millis(F.col(timestamp_col).cast("timestamp")).alias(
            "message_timestamp"
        ),
    )
    if primary_key_path:
        out = out.withColumn(
            "pk",
            F.get_json_object(F.col("message"), "$." + primary_key_path),
        )
    return out


def seek_offsets(
    records: DataFrame,
    offsets: dict[int, int] | None = None,
    start_timestamp_ms: int | None = None,
) -> DataFrame:
    """Replay-from-bookmark semantics on a record frame: keep messages at or
    after the per-partition offsets, or after a start timestamp
    (tap-kafka seek_partitions / initial_start_time)."""
    if offsets:
        cond = F.lit(False)
        for p, o in offsets.items():
            cond = cond | (
                (F.col("message_partition") == p) & (F.col("message_offset") >= o)
            )
        records = records.filter(cond)
    if start_timestamp_ms is not None:
        records = records.filter(F.col("message_timestamp") >= start_timestamp_ms)
    return records
