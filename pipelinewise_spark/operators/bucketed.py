"""Bucketed (co-located) MERGE support.

At 100 TB the dominant MERGE cost is re-shuffling both sides on the PK every
run. Bucketing fixes the physical layout once: write target AND incoming
batches bucketed by the PK into catalog tables, and the PK equi-join needs no
Exchange at all — each bucket pair joins locally. This module wraps the
catalog-table path (Spark bucketing requires saveAsTable); the
tests assert the no-Exchange plan.

Reference parity note: this is the engine's answer to the reference's
"load to temp table then MERGE" — with layout reuse across runs instead of a
fresh stage+sort per flush.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted catalog table (bucket by the MERGE key)."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_merge(
    spark: SparkSession,
    target_table: str,
    batch_table: str,
    primary_keys: Sequence[str],
    hard_delete: bool = False,
) -> DataFrame:
    """MERGE two co-bucketed catalog tables — shuffle-free PK join."""
    from pipelinewise_spark.operators.merge import merge_upsert

    target = spark.table(target_table)
    batch = spark.table(batch_table)
    return merge_upsert(target, batch, primary_keys, hard_delete=hard_delete)
