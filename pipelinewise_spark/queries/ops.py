"""Operational queries: record validation, archive-load metadata, JSON
field_paths masking — remaining SURVEY §2 behaviors as oracle-checked ops."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelinewise_spark.functions.masking import apply_transformations
from pipelinewise_spark.operators.validation import Constraint, validate
from pipelinewise_spark.queries.registry import register
from pipelinewise_spark.sources.files import read_table


@register(
    "validate_events",
    oracle="""
    WITH v AS (
        SELECT event_id,
               list_filter([
                   CASE WHEN NOT (value IS NOT NULL AND value BETWEEN 0 AND 50)
                        THEN 'value:between' END,
                   CASE WHEN NOT (event_type IN ('click','view','purchase'))
                        THEN 'event_type:in_set' END,
                   CASE WHEN NOT (props IS NOT NULL AND
                                  regexp_matches(props, '^\\{"k": [0-9]+\\}$'))
                        THEN 'props:matches' END
               ], x -> x IS NOT NULL) AS violations
        FROM events)
    SELECT event_id, violations, len(violations) = 0 AS is_valid FROM v
    """,
)
def validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint validation (the reference's optional JSON-Schema record
    check, target_snowflake/__init__.py:148-158) as vectorized predicates
    with per-row violation reporting."""
    events = read_table(spark, sf_dir, "events")
    out = validate(
        events,
        [
            Constraint("value", "between", (0, 50)),
            Constraint("event_type", "in_set", ("click", "view", "purchase")),
            Constraint("props", "matches", (r'^\{"k": [0-9]+\}$',)),
        ],
    )
    return out.select("event_id", "violations", "is_valid")


@register(
    "archive_load_metadata_orders",
    oracle="""
    SELECT CAST(o_orderkey % 4 AS BIGINT) AS chunk,
           min(o_orderdate) AS min_key,
           max(o_orderdate) AS max_key,
           count(*) AS n_records
    FROM orders GROUP BY 1
    """,
)
def archive_load_metadata_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive-load-files metadata: per load chunk, min/max of the
    incremental key + record count (target_snowflake/__init__.py:178-191,
    db_sync.py:410-438) — df.agg, no collect."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.groupBy((F.col("o_orderkey") % 4).cast("bigint").alias("chunk"))
        .agg(
            F.min("o_orderdate").alias("min_key"),
            F.max("o_orderdate").alias("max_key"),
            F.count("*").alias("n_records"),
        )
    )


@register(
    "mask_json_field_paths_events",
    oracle="""
    SELECT event_id,
           regexp_replace(props, '"k": [0-9]+', '"k": 0') AS props
    FROM events
    """,
)
def mask_json_field_paths_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masking a path *inside* a JSON document column (transformation
    field_paths, transform-field transform.py:122-131) via the Arrow-batched
    JSON rewrite."""
    events = read_table(spark, sf_dir, "events")
    out = apply_transformations(
        events,
        [{"field_id": "props", "type": "MASK-NUMBER", "field_paths": ["k"]}],
    )
    return out.select("event_id", "props")
