"""Table-quality queries: the one-pass expectations report and the
write-audit-publish (branch-staged, audit-gated) load."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelinewise_spark.operators.expectations import (
    accepted_values,
    expectations_report,
    in_range,
    not_null,
    row_count_at_least,
    satisfies,
    unique,
    write_audit_publish,
)
from pipelinewise_spark.operators.manifest_table import ManifestTable
from pipelinewise_spark.queries.fixturetime import fixture_timer
from pipelinewise_spark.queries.registry import register
from pipelinewise_spark.sources.files import read_table

_ORD_RULES_SQL = """
    WITH m AS (
        SELECT
            AVG(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END)
                AS m_notnull,
            CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS m_unique,
            AVG(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1.0
                     ELSE 0.0 END) AS m_accepted,
            AVG(CASE WHEN o_totalprice BETWEEN 1000.0 AND 300000.0
                     THEN 1.0 ELSE 0.0 END) AS m_range,
            CAST(COUNT(*) AS DOUBLE) AS m_rows,
            AVG(CASE WHEN o_orderpriority LIKE '1-%' THEN 1.0
                     ELSE 0.0 END) AS m_urgent
        FROM orders)
    SELECT 'not_null' AS rule, 'o_custkey' AS col_name,
           m_notnull AS metric, 1.0 AS threshold,
           m_notnull >= 1.0 AS passed FROM m
    UNION ALL
    SELECT 'unique', 'o_orderkey', m_unique, 1.0, m_unique >= 1.0 FROM m
    UNION ALL
    SELECT 'accepted_values', 'o_orderstatus', m_accepted, 1.0,
           m_accepted >= 1.0 FROM m
    UNION ALL
    SELECT 'in_range', 'o_totalprice', m_range, 0.5, m_range >= 0.5 FROM m
    UNION ALL
    SELECT 'row_count_at_least', '*', m_rows, 1.0, m_rows >= 1.0 FROM m
    UNION ALL
    SELECT 'urgent_share', '*', m_urgent, 0.5, m_urgent >= 0.5 FROM m
"""


def _orders_rules():
    return [
        not_null("o_custkey"),
        unique("o_orderkey"),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        in_range("o_totalprice", 1000.0, 300000.0, min_ratio=0.5),
        row_count_at_least(1),
        # an intentionally failing rule: ~20% of priorities are urgent,
        # the report must carry passed=false rows, not hide them
        satisfies(
            "urgent_share", F.col("o_orderpriority").startswith("1-"), 0.5
        ),
    ]


@register("expectations_report_orders", oracle=_ORD_RULES_SQL)
def expectations_report_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dbt-tests/Great-Expectations-style table acceptance
    (operators/expectations.py): six rules — null ratio, key uniqueness,
    accepted values, range share, row count, an arbitrary predicate —
    ALL evaluated in one aggregate pass (single scan, 1-row reduce),
    unpivoted to a (rule, col_name, metric, threshold, passed) report.
    One rule intentionally fails to prove failures surface."""
    orders = read_table(spark, sf_dir, "orders")
    return expectations_report(orders, _orders_rules()).select(
        "rule",
        F.col("column").alias("col_name"),
        "metric",
        "threshold",
        "passed",
    )


@register(
    "wap_publish_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderpriority
    FROM orders
    """,
)
def wap_publish_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish: batches stage on a ManifestTable BRANCH
    (metadata-only ref, same data files), the expectations audit runs
    against the staged snapshot, and main's pointer fast-forwards only
    when green (operators/manifest_table.py:branch/fast_forward,
    operators/expectations.py:write_audit_publish — Iceberg's WAP
    pattern). A clean batch publishes; a corrupt batch (NULL custkeys)
    is rejected with main untouched — so the final table is exactly
    base + the clean batch."""
    with fixture_timer():
        tmp = tempfile.mkdtemp(prefix="pws_wap_")
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority",
        )
        k = F.col("o_orderkey")
        table = ManifestTable(
            os.path.join(tmp, "orders"), ["o_orderpriority"]
        )
        table.overwrite(orders.filter(k % 4 != 3))

    rules = [
        not_null("o_custkey"),
        unique("o_orderkey"),
        row_count_at_least(1),
    ]
    good = orders.filter(k % 4 == 3)
    ok1, _ = write_audit_publish(
        spark, table, rules,
        lambda br: br.merge(spark, good, ["o_orderkey"]),
    )
    assert ok1, "clean batch must publish"
    # corrupt batch: brand-new keys with NULL o_custkey — if it ever
    # published, the final row count and null profile would both change
    bad = (
        orders.filter(k % 4 == 1)
        .withColumn("o_orderkey", k + 100_000_000)
        .withColumn("o_custkey", F.lit(None).cast("long"))
    )
    ok2, report2 = write_audit_publish(
        spark, table, rules,
        lambda br: br.merge(spark, bad, ["o_orderkey"]),
    )
    assert not ok2, "corrupt batch must be rejected"
    assert any(
        r["rule"] == "not_null" and not r["passed"] for r in report2
    )
    return table.read(spark).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )


@register(
    "ingest_volume_anomaly_orders",
    oracle="""
    WITH deltas AS (
        SELECT CAST(o_orderkey % 5 AS INT) + 1 AS version,
               COUNT(*) AS rows_added
        FROM orders GROUP BY 1
        UNION ALL
        SELECT 6, COUNT(*) FROM orders WHERE o_orderkey % 2 = 0
    ),
    m AS (SELECT MEDIAN(rows_added) AS med FROM deltas),
    d2 AS (SELECT deltas.*, ABS(rows_added - med) AS dev FROM deltas, m),
    mad AS (SELECT MEDIAN(dev) AS mad FROM d2)
    SELECT version, rows_added,
           dev > 3.0 * mad + 0.01 * med AS is_anomaly
    FROM d2, m, mad
    """,
)
def ingest_volume_anomaly_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Data observability over the table's own commit history
    (operators/anomaly.py + manifest metadata tables): five normal
    mod-sharded loads then a double-volume bad batch land as snapshots;
    per-commit loaded-row deltas come from ``meta("snapshots")`` (pure
    manifest arithmetic, zero data scanned) and the median/MAD rule
    flags exactly the bad commit. The oracle recomputes the same deltas
    straight from the source rows. The six-commit history lands with ONE
    staged Spark write + ``import_files`` (the Iceberg add_files-style
    bulk history import: per-commit publishes are metadata-only), so the
    bench number measures DETECTION, not table-building (r7 VERDICT
    task 6)."""
    from pipelinewise_spark.operators.anomaly import (
        snapshot_row_deltas,
        volume_anomalies,
    )

    with fixture_timer():
        tmp = tempfile.mkdtemp(prefix="pws_anom_")
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
        )
        k = F.col("o_orderkey")
        # commits 1-5: the mod-5 shards; commit 6 (the bad batch): a
        # half-table load under fresh keys — its delta is its full size
        staged = orders.withColumn("__commit", (k % 5 + 1)).unionByName(
            orders.filter(k % 2 == 0)
            .withColumn("o_orderkey", k + 200_000_000)
            .withColumn("__commit", F.lit(6))
        )
        t = ManifestTable(os.path.join(tmp, "orders"), ["o_orderpriority"])
        # cluster by the partition tuple: one task per output dir (no
        # writer-per-dir fanout inside a task), one file per commit/prio
        staged.repartition("__commit", "o_orderpriority").write.partitionBy(
            "__commit", "o_orderpriority"
        ).parquet(t.mfs.uri("data/staged"))
        t.import_files("data/staged", split_key="__commit")
    deltas = snapshot_row_deltas(t.meta(spark, "snapshots"))
    return volume_anomalies(deltas, "rows_added").select(
        "version", "rows_added", "is_anomaly"
    )


@register(
    "fk_integrity_orders",
    oracle="""
    WITH batch AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 100 = 0
                    THEN o_custkey + 1000000000 ELSE o_custkey END
                   AS o_custkey
        FROM orders
    ),
    m AS (
        SELECT AVG(CASE WHEN b.o_custkey IN
                        (SELECT c_custkey FROM customer)
                   THEN 1.0 ELSE 0.0 END) AS m_ref,
               AVG(CASE WHEN b.o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END)
                   AS m_notnull
        FROM batch b)
    SELECT 'references' AS rule, 'o_custkey' AS col_name,
           m_ref AS metric, 1.0 AS threshold, m_ref >= 1.0 AS passed
    FROM m
    UNION ALL
    SELECT 'not_null', 'o_custkey', m_notnull, 1.0, m_notnull >= 1.0 FROM m
    """,
)
def fk_integrity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt's `relationships` test as an expectations rule
    (operators/expectations.py:references): 1% of the batch's customer
    FKs are corrupted to orphans; the rule joins the broadcast dim key
    set as an indicator column BEFORE the single aggregate pass, so FK
    integrity + null profiling still cost one scan. The report must
    surface the orphan ratio and fail the rule."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    k = F.col("o_orderkey")
    batch = orders.select(
        "o_orderkey",
        F.when(k % 100 == 0, F.col("o_custkey") + 1_000_000_000)
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
    )
    from pipelinewise_spark.operators.expectations import references

    return expectations_report(
        batch,
        [references("o_custkey", cust, "c_custkey"), not_null("o_custkey")],
    ).select(
        "rule",
        F.col("column").alias("col_name"),
        "metric",
        "threshold",
        "passed",
    )
