"""Target-side behavior queries: MERGE deletes, schema evolution, flattening,
timestamp clamping — each a deterministic, oracle-checkable computation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelinewise_spark.operators.clamp import MAX_TIMESTAMP, clamp_timestamps
from pipelinewise_spark.operators.flattening import flatten
from pipelinewise_spark.operators.merge import merge_upsert
from pipelinewise_spark.operators.schema_evolution import evolve_target
from pipelinewise_spark.operators.sdc import add_sdc_columns
from pipelinewise_spark.queries.pipeline import T0, T1
from pipelinewise_spark.queries.registry import register
from pipelinewise_spark.sources.files import read_table

_ORDERS_COLS = (
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
)


def _orders_with_deletes(spark: SparkSession, sf_dir: str, hard: bool) -> DataFrame:
    """Target = full orders @T0; CDC batch deletes every status-'F' order
    (delete events carry _sdc_deleted_at = event time, reference
    binlog.py:536-560 / logical_replication delete action)."""
    orders = read_table(spark, sf_dir, "orders")
    target = add_sdc_columns(orders, extracted_at=T0, batched_at=T0)
    deletes = add_sdc_columns(
        orders.filter(F.col("o_orderstatus") == "F"),
        extracted_at=T1,
        batched_at=T1,
    ).withColumn("_sdc_deleted_at", F.lit(T1).cast("timestamp"))
    merged = merge_upsert(target, deletes, ["o_orderkey"], hard_delete=hard)
    return merged.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority", "_sdc_extracted_at", "_sdc_batched_at", "_sdc_deleted_at",
    )


@register(
    "merge_soft_delete_orders",
    oracle=f"""
    SELECT {_ORDERS_COLS},
           CASE WHEN o_orderstatus = 'F' THEN TIMESTAMP '{T1}'
                ELSE TIMESTAMP '{T0}' END AS _sdc_extracted_at,
           CASE WHEN o_orderstatus = 'F' THEN TIMESTAMP '{T1}'
                ELSE TIMESTAMP '{T0}' END AS _sdc_batched_at,
           CASE WHEN o_orderstatus = 'F' THEN TIMESTAMP '{T1}'
                ELSE CAST(NULL AS TIMESTAMP) END AS _sdc_deleted_at
    FROM orders
    """,
)
def merge_soft_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft delete: deleted rows stay, `_sdc_deleted_at` populated
    (target_snowflake/__init__.py:173-176)."""
    return _orders_with_deletes(spark, sf_dir, hard=False)


@register(
    "merge_hard_delete_orders",
    oracle=f"""
    SELECT {_ORDERS_COLS},
           TIMESTAMP '{T0}' AS _sdc_extracted_at,
           TIMESTAMP '{T0}' AS _sdc_batched_at,
           CAST(NULL AS TIMESTAMP) AS _sdc_deleted_at
    FROM orders
    WHERE o_orderstatus <> 'F'
    """,
)
def merge_hard_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard delete: rows with `_sdc_deleted_at` dropped after the merge
    (db_sync.py:632-637)."""
    return _orders_with_deletes(spark, sf_dir, hard=True)


@register(
    "schema_evolution_add_column",
    oracle=f"""
    SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
           CASE WHEN c_custkey % 2 = 0 THEN c_acctbal END AS c_acctbal,
           CASE WHEN c_custkey % 2 = 0 THEN TIMESTAMP '{T1}'
                ELSE TIMESTAMP '{T0}' END AS _sdc_extracted_at,
           CASE WHEN c_custkey % 2 = 0 THEN TIMESTAMP '{T1}'
                ELSE TIMESTAMP '{T0}' END AS _sdc_batched_at,
           CAST(NULL AS TIMESTAMP) AS _sdc_deleted_at
    FROM customer
    """,
)
def schema_evolution_add_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD COLUMN evolution: initial sync without c_acctbal, then a batch
    (even custkeys) arrives with the new column — target evolves, old rows
    read NULL (db_sync.py:849-870 add_column)."""
    customer = read_table(spark, sf_dir, "customer")
    target = add_sdc_columns(
        customer.select("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
        extracted_at=T0, batched_at=T0,
    )
    batch = add_sdc_columns(
        customer.filter(F.col("c_custkey") % 2 == 0).select(
            "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
        ),
        extracted_at=T1, batched_at=T1,
    )
    evolved = evolve_target(target, batch)
    merged = merge_upsert(evolved, batch, ["c_custkey"])
    return merged.select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal",
        "_sdc_extracted_at", "_sdc_batched_at", "_sdc_deleted_at",
    )


_VSUF = "20260101_0000"


@register(
    "schema_evolution_version_column",
    oracle=f"""
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 2 = 0
                THEN CAST(c_nationkey AS VARCHAR) END AS c_nationkey,
           c_nationkey AS c_nationkey_{_VSUF},
           c_acctbal, c_mktsegment,
           CASE WHEN c_custkey % 2 = 0 THEN TIMESTAMP '{T1}'
                ELSE TIMESTAMP '{T0}' END AS _sdc_extracted_at,
           CASE WHEN c_custkey % 2 = 0 THEN TIMESTAMP '{T1}'
                ELSE TIMESTAMP '{T0}' END AS _sdc_batched_at,
           CAST(NULL AS TIMESTAMP) AS _sdc_deleted_at
    FROM customer
    """,
)
def schema_evolution_version_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename-on-type-change: c_nationkey arrives as string → old int column
    versioned to c_nationkey_<ts> (data retained), fresh string column added
    (db_sync.py:767-841 update_columns + version_column)."""
    customer = read_table(spark, sf_dir, "customer")
    target = add_sdc_columns(customer, extracted_at=T0, batched_at=T0)
    batch = add_sdc_columns(
        customer.filter(F.col("c_custkey") % 2 == 0).withColumn(
            "c_nationkey", F.col("c_nationkey").cast("string")
        ),
        extracted_at=T1, batched_at=T1,
    )
    evolved = evolve_target(target, batch, version_suffix=_VSUF)
    merged = merge_upsert(evolved, batch, ["c_custkey"])
    return merged.select(
        "c_custkey", "c_name", "c_nationkey", f"c_nationkey_{_VSUF}",
        "c_acctbal", "c_mktsegment",
        "_sdc_extracted_at", "_sdc_batched_at", "_sdc_deleted_at",
    )


@register(
    "flatten_events_props",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS props__k
    FROM events
    """,
)
def flatten_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-object flattening: JSON props → typed struct → `props__k`
    column with the reference's `__` separator (flattening.py:22-161)."""
    events = read_table(spark, sf_dir, "events")
    parsed = events.withColumn("props", F.from_json("props", "k int"))
    return flatten(parsed, max_level=1)


@register(
    "timestamp_clamp_orders",
    oracle=f"""
    SELECT o_orderkey,
           strftime(CASE WHEN o_orderstatus = 'F' THEN
                CASE WHEN o_orderdate + INTERVAL 9000 YEAR
                          > TIMESTAMP '{MAX_TIMESTAMP}'
                     THEN TIMESTAMP '{MAX_TIMESTAMP}'
                     ELSE o_orderdate + INTERVAL 9000 YEAR END
                ELSE o_orderdate END,
                '%Y-%m-%d %H:%M:%S.%f') AS o_orderdate
    FROM orders
    """,
)
def timestamp_clamp_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-range timestamps (simulated by +9000y on 'F' orders) clamp to
    9999-12-31 23:59:59.999999 (stream_utils.py:38-90).

    Output is a formatted string: year-9999 timestamps overflow pandas'
    ns-epoch in the driver's canonicalizer, so both engines emit
    'yyyy-MM-dd HH:mm:ss.SSSSSS' text instead of a timestamp column.
    """
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate",
        F.when(
            F.col("o_orderstatus") == "F",
            F.col("o_orderdate") + F.expr("INTERVAL 9000 YEARS"),
        ).otherwise(F.col("o_orderdate")),
    )
    return clamp_timestamps(orders, ["o_orderdate"]).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "o_orderdate"
        ),
    )
