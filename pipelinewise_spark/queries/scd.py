"""SCD Type 2 queries: versioned dimension history from a change batch,
and a point-in-time join of facts against that history.

The reference's targets keep one row per PK and mark deletion with
``_sdc_deleted_at`` (target-snowflake db_sync.py:632-637); SCD2 is the
warehouse layer users build on exactly that feed when they need attribute
history. Both queries drive :mod:`pipelinewise_spark.operators.scd`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelinewise_spark.operators.scd import (
    scd2_apply,
    scd2_init,
    scd2_pit_join,
)
from pipelinewise_spark.operators.sdc import SDC_DELETED_AT
from pipelinewise_spark.queries.pipeline import T0, T1
from pipelinewise_spark.queries.registry import register
from pipelinewise_spark.sources.files import read_table

_HIST_COLS = [
    "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
]


def _customer_scd_frames(
    spark: SparkSession, sf_dir: str, t0: str, t1: str
) -> tuple[DataFrame, DataFrame]:
    """(initial current slice, T1 change batch) over ``customer``.

    Change plan at ``t1`` — batch rows are keys %3==0 or %5==0:
    - %15==0 → tombstone (delete)
    - else %3==0 → segment := 'MACHINERY', acctbal += 100 (changed)
    - else (%5==0) → values re-asserted unchanged (must be a NO-OP)
    """
    cust = read_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cur0 = scd2_init(
        cust.withColumn("_eff", F.lit(t0).cast("timestamp")), "_eff"
    ).drop("_eff")
    chg = (k % 3 == 0) & (k % 15 != 0)
    batch = (
        cust.filter((k % 3 == 0) | (k % 5 == 0))
        .withColumn(
            "c_mktsegment",
            F.when(chg, F.lit("MACHINERY")).otherwise(F.col("c_mktsegment")),
        )
        .withColumn(
            "c_acctbal",
            F.when(chg, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal")),
        )
        .withColumn(
            SDC_DELETED_AT,
            F.when(k % 15 == 0, F.lit(t1).cast("timestamp")),
        )
        .withColumn("_eff", F.lit(t1).cast("timestamp"))
    )
    return cur0, batch


@register(
    "scd2_customer_history",
    oracle=f"""
    WITH closed AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
               TIMESTAMP '{T0}' AS valid_from,
               TIMESTAMP '{T1}' AS valid_to,
               FALSE AS is_current
        FROM customer WHERE c_custkey % 3 = 0
    ), opened AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 100.0 AS c_acctbal,
               'MACHINERY' AS c_mktsegment,
               TIMESTAMP '{T1}' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to,
               TRUE AS is_current
        FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 15 <> 0
    ), kept AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
               TIMESTAMP '{T0}' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to,
               TRUE AS is_current
        FROM customer WHERE c_custkey % 3 <> 0
    )
    SELECT * FROM closed
    UNION ALL SELECT * FROM opened
    UNION ALL SELECT * FROM kept
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 fold of one change batch over an initial dimension load
    (operators/scd.py:scd2_apply — ONE full-outer PK join, each joined
    row emits carried/closed/opened rows via array+explode; closed
    history is append-only by construction). Re-asserted unchanged rows
    must not version; tombstones close without reopening."""
    cur0, batch = _customer_scd_frames(spark, sf_dir, T0, T1)
    hist = scd2_apply(cur0, batch, ["c_custkey"], "_eff")
    return hist.select(
        *_HIST_COLS,
        F.col("_valid_from").alias("valid_from"),
        F.col("_valid_to").alias("valid_to"),
        F.col("_is_current").alias("is_current"),
    )


_PIT_T0 = "1990-01-01 00:00:00"
_PIT_CUT = "1998-06-01 00:00:00"


@register(
    "scd2_pit_revenue_by_segment",
    oracle=f"""
    SELECT CASE
             WHEN o.o_custkey % 15 = 0
                  AND o.o_orderdate >= TIMESTAMP '{_PIT_CUT}'
               THEN 'DELETED'
             WHEN o.o_custkey % 3 = 0
                  AND o.o_orderdate >= TIMESTAMP '{_PIT_CUT}'
               THEN 'MACHINERY'
             ELSE c.c_mktsegment
           END AS segment,
           COUNT(*) AS orders,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                     AS DECIMAL(18,2)) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def scd2_pit_revenue_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-time join: every order picks the customer segment that
    was valid ON ITS OWN order date (operators/scd.py:scd2_pit_join —
    broadcast dim + interval predicate, the fact side never shuffles
    before the aggregate). Customers change segment mid-history and some
    are deleted at the cutover; orders after a delete surface as
    'DELETED' (no valid version → left-join NULL)."""
    cur0, batch = _customer_scd_frames(spark, sf_dir, _PIT_T0, _PIT_CUT)
    k = F.col("c_custkey")
    hist = scd2_apply(
        cur0, batch.filter(k % 3 == 0), ["c_custkey"], "_eff"
    )
    facts = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        "o_totalprice",
        "o_orderdate",
    )
    j = scd2_pit_join(facts, hist, ["c_custkey"], "o_orderdate")
    return j.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("DELETED")).alias("segment")
    ).agg(
        F.count("*").alias("orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("revenue"),
    )
