"""Table-quality queries: the one-pass expectations report and the
write-audit-publish (branch-staged, audit-gated) load."""

from __future__ import annotations

import os
import tempfile

from pipelinewise_spark.partitioning import local_frame
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


@register(
    "seasonal_anomaly_daily_events",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS cnt
        FROM events GROUP BY 1),
    d2 AS (SELECT day, cnt, CAST(dayofweek(day) AS INT) AS dow FROM daily),
    med AS (
        SELECT dow, ROUND(MEDIAN(cnt), 6) AS baseline_median
        FROM d2 GROUP BY dow),
    dev AS (
        SELECT d2.day, d2.dow, d2.cnt, med.baseline_median,
               ABS(cnt - baseline_median) AS dv
        FROM d2 JOIN med USING (dow)),
    mad AS (SELECT dow, ROUND(MEDIAN(dv), 6) AS mad FROM dev GROUP BY dow)
    SELECT dev.day, dev.dow, dev.cnt, dev.baseline_median, mad.mad,
           dv > 3.0 * mad.mad + 0.01 * dev.baseline_median AS is_anomaly
    FROM dev JOIN mad USING (dow)
    """,
)
def seasonal_anomaly_daily_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Season-aware volume observability (operators/anomaly.py:
    seasonal_anomalies): daily event counts judged against THEIR
    day-of-week's median/MAD baseline — weekly traffic shape doesn't read
    as seven anomalies the way a global baseline would. The corpus
    touches exactly one map-side-combinable aggregate (count per day);
    everything after runs on the date-cardinality-bounded series with
    7-row broadcast baselines. Medians are the exact interpolated
    percentile both engines share; baseline/MAD round to 6 dp so the
    flag arithmetic is engine-portable."""
    from pipelinewise_spark.operators.anomaly import seasonal_anomalies

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count("*").alias("cnt"))
    # Spark dayofweek: 1=Sunday..7; DuckDB dayofweek: 0=Sunday..6
    series = daily.withColumn(
        "dow", (F.dayofweek("day") - 1).cast("int")
    )
    return seasonal_anomalies(series, "dow", "cnt").select(
        "day", "dow", "cnt", "baseline_median", "mad", "is_anomaly"
    )


@register(
    "distribution_drift_orders",
    oracle="""
    WITH ref AS (
        SELECT o_totalprice, o_orderkey FROM orders WHERE o_orderkey % 2 = 0),
    cur AS (
        SELECT CASE WHEN o_orderkey % 10 < 3
                    THEN o_totalprice + 500 ELSE o_totalprice END
                   AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 1),
    edges AS (
        SELECT list_transform(
                 quantile_cont(o_totalprice,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                 q -> CAST(CAST(ROUND(q, 6) AS DECIMAL(18,6)) AS DOUBLE))
                   AS es
        FROM ref),
    rb AS (
        SELECT COALESCE(len(list_filter(es, e -> o_totalprice > e)), 0) + 1
                   AS bucket
        FROM ref, edges),
    cb AS (
        SELECT COALESCE(len(list_filter(es, e -> o_totalprice > e)), 0) + 1
                   AS bucket
        FROM cur, edges),
    rc AS (SELECT bucket, COUNT(*) AS ref_cnt FROM rb GROUP BY bucket),
    cc AS (SELECT bucket, COUNT(*) AS cur_cnt FROM cb GROUP BY bucket),
    per AS (
        SELECT b.bucket,
               CASE WHEN b.bucket > 1 THEN es[b.bucket - 1] END AS lo,
               CASE WHEN b.bucket < 10 THEN es[b.bucket] END AS hi,
               COALESCE(rc.ref_cnt, 0) AS ref_cnt,
               COALESCE(cc.cur_cnt, 0) AS cur_cnt
        FROM (SELECT unnest(range(1, 11)) AS bucket) b
        CROSS JOIN edges
        LEFT JOIN rc USING (bucket) LEFT JOIN cc USING (bucket)),
    tot AS (SELECT SUM(ref_cnt) AS nr, SUM(cur_cnt) AS nc FROM per),
    tvd AS (
        SELECT CAST(FLOOR(
            1000000::HUGEINT
            * SUM(ABS(ref_cnt::HUGEINT * nc - cur_cnt::HUGEINT * nr))
            / (2::HUGEINT * MAX(nr) * MAX(nc))) AS BIGINT) AS tvd_ppm
        FROM per, tot)
    SELECT CAST(per.bucket AS INT) AS bucket, per.lo, per.hi,
           per.ref_cnt, per.cur_cnt, tvd.tvd_ppm,
           tvd.tvd_ppm > 50000 AS drifted
    FROM per, tvd
    """,
)
def distribution_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram drift between two snapshots (operators/drift.py:
    distribution_drift — the PSI-family feature monitor): even-key orders
    are the reference, odd-key orders with +500 on 30% of prices are the
    shifted current batch; both bucket by the reference's decile bounds
    (distributed interpolated quantiles) and the shift scores as
    total-variation distance in EXACT integer arithmetic — Σ|ref·Nc −
    cur·Nr| stays in decimal/HUGEINT space with one integer division at
    the end, so no float-summation-order or transcendental (PSI's ln)
    nondeterminism exists anywhere. Corpus cost: one rank pass + one
    bucket-count aggregate per side; everything else is 10-row
    metadata."""
    from pipelinewise_spark.operators.drift import distribution_drift

    o = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ref = o.filter(k % 2 == 0)
    cur = o.filter(k % 2 == 1).withColumn(
        "o_totalprice",
        F.when(
            k % 10 < 3, F.col("o_totalprice") + 500
        ).otherwise(F.col("o_totalprice")),
    )
    return distribution_drift(
        ref, cur, "o_totalprice", ["o_orderkey"], n_buckets=10
    )


@register(
    "ks_drift_by_segment_orders",
    oracle="""
    WITH ref AS (
        SELECT o_orderpriority AS segment, o_totalprice AS v
        FROM orders WHERE o_orderdate < DATE '1998-01-01'),
    cur AS (
        SELECT o_orderpriority AS segment,
               CASE WHEN o_orderpriority = '2-HIGH'
                    THEN o_totalprice + 50000.00 ELSE o_totalprice END AS v
        FROM orders WHERE o_orderdate >= DATE '1998-01-01'),
    pv AS (
        SELECT segment, v,
               CAST(SUM(r) AS BIGINT) AS cr, CAST(SUM(c) AS BIGINT) AS cc
        FROM (SELECT segment, v, 1 AS r, 0 AS c FROM ref
              UNION ALL
              SELECT segment, v, 0 AS r, 1 AS c FROM cur)
        GROUP BY segment, v),
    cum AS (
        SELECT segment, v,
               SUM(cr) OVER (PARTITION BY segment ORDER BY v) AS cum_r,
               SUM(cc) OVER (PARTITION BY segment ORDER BY v) AS cum_c
        FROM pv),
    n AS (SELECT segment, CAST(SUM(cr) AS BIGINT) AS n_ref,
                 CAST(SUM(cc) AS BIGINT) AS n_cur
          FROM pv GROUP BY segment),
    d AS (SELECT c.segment,
                 CAST(MAX(ABS(cum_r * n_cur - cum_c * n_ref)) AS BIGINT)
                     AS d2
          FROM cum c JOIN n ON c.segment = n.segment
          GROUP BY c.segment)
    SELECT n.segment, n.n_ref, n.n_cur,
           CAST(CASE WHEN n.n_ref = 0 OR n.n_cur = 0 THEN 1000000
                     ELSE FLOOR(1000000 * d.d2 / (n.n_ref * n.n_cur))
                END AS BIGINT) AS d_ppm,
           CASE WHEN n.n_ref = 0 OR n.n_cur = 0 THEN TRUE
                ELSE (d.d2 / (CAST(n.n_ref AS DOUBLE) * n.n_cur))
                     > 1.358 * sqrt((n.n_ref + n.n_cur)
                                    / (CAST(n.n_ref AS DOUBLE) * n.n_cur))
           END AS significant
    FROM d JOIN n ON d.segment = n.segment
    """,
)
def ks_drift_by_segment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment KS drift against a pinned reference epoch
    (operators/drift.py:ks_drift_by_segment) — the nightly monitor a real
    pipeline runs: pre-1998 orders are the reference epoch, 1998+ the
    current, segmented by order priority, and ONE segment ('2-HIGH')
    carries an injected +50000.00 price shift that the bin-free KS must
    flag (untouched segments score only the generator's natural
    epoch-to-epoch drift). Composes the
    ks_test_price_priorities machinery (integer cross-multiplied
    sup-distance over the SEGMENT-grouped two-phase prefix sum — one
    range partitioning for all segments, no SinglePartition window) with
    distribution_drift's reference-vs-current framing. All five rows are
    value-exact vs the oracle; the shift uses decimal ADDITION so the
    transformed values group identically in both engines."""
    from pipelinewise_spark.operators.drift import ks_drift_by_segment

    o = read_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("date")
    ref = o.filter(F.col("o_orderdate") < cut)
    cur = o.filter(F.col("o_orderdate") >= cut).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderpriority") == "2-HIGH",
            F.col("o_totalprice") + F.lit("50000.00").cast("decimal(12,2)"),
        ).otherwise(F.col("o_totalprice")),
    )
    return ks_drift_by_segment(ref, cur, "o_totalprice", "o_orderpriority")


@register(
    "record_linkage_customer",
    oracle="""
    WITH a AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
               substr(c_name, 10, 7) AS blk
        FROM customer),
    b AS (
        SELECT c_custkey + 10000000 AS b_key,
               CASE WHEN c_custkey % 4 = 0
                    THEN substr(c_name, 1, 16) ELSE c_name END AS b_name,
               c_nationkey AS b_nation,
               CASE WHEN c_custkey % 3 = 0
                    THEN c_acctbal + 0.01 ELSE c_acctbal END AS b_acctbal,
               c_mktsegment AS b_seg
        FROM customer WHERE c_custkey % 5 <> 0),
    scored AS (
        SELECT b.b_key AS right_key, a.c_custkey AS left_key,
               CAST(CASE WHEN a.c_name = b.b_name THEN 300 ELSE 0 END
                  + CASE WHEN levenshtein(a.c_name, b.b_name) <= 2
                         THEN 500 ELSE 0 END
                  + CASE WHEN abs(a.c_acctbal - b.b_acctbal) <= 0.02
                         THEN 400 ELSE 0 END
                  + CASE WHEN a.c_mktsegment = b.b_seg THEN 100 ELSE 0 END
                 AS BIGINT) AS score
        FROM a JOIN b ON a.c_nationkey = b.b_nation
                     AND a.blk = substr(b.b_name, 10, 7))
    SELECT right_key, left_key, score FROM (
        SELECT right_key, left_key, score,
               row_number() OVER (PARTITION BY right_key
                                  ORDER BY score DESC, left_key) AS rn
        FROM scored WHERE score >= 800)
    WHERE rn = 1
    """,
)
def record_linkage_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution across two sources (functions/linkage.py:
    link_records — Fellegi-Sunter shaped with INTEGER agreement weights):
    the customer table vs a perturbed sibling source (key space +10M, 25%
    truncated names, a third of balances off by 0.01, 20% of rows
    absent). Blocking on (nation, name-digit prefix) bounds candidates —
    never all-pairs, the edit-distance-dedup join shape; features are
    name-exact(+300) / name-edit<=2(+500) / balance-within-0.02(+400) /
    segment(+100), all engine-portable (levenshtein is JVM-built-in and
    DuckDB-native; balances stay decimal-exact); each right record
    resolves to its best match at threshold 800 with (score DESC, key
    ASC) tie-breaks via one partial-aggregatable min(struct) — no window
    sort."""
    from pipelinewise_spark.functions.linkage import (
        feature_band,
        feature_edit,
        feature_exact,
        link_records,
    )

    c = read_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    a = c.withColumn("blk", F.substring("c_name", 10, 7))
    b = c.filter(k % 5 != 0).select(
        (k + 10_000_000).alias("b_key"),
        F.when(k % 4 == 0, F.substring("c_name", 1, 16))
        .otherwise(F.col("c_name"))
        .alias("b_name"),
        F.col("c_nationkey").alias("b_nation"),
        F.when(k % 3 == 0, F.col("c_acctbal") + 0.01)
        .otherwise(F.col("c_acctbal") + 0)
        .alias("b_acctbal"),
        F.col("c_mktsegment").alias("b_seg"),
    ).withColumn("blk", F.substring("b_name", 10, 7))
    return link_records(
        a,
        b,
        "c_custkey",
        "b_key",
        blocks=[("c_nationkey", "b_nation"), ("blk", "blk")],
        features=[
            feature_exact("c_name", "b_name", 300),
            feature_edit("c_name", "b_name", 500, max_dist=2),
            feature_band("c_acctbal", "b_acctbal", 400, 0.02),
            feature_exact("c_mktsegment", "b_seg", 100),
        ],
        threshold=800,
    )


_RECON_CANON_SQL = """
        concat_ws('|', CAST(o_orderkey AS VARCHAR), o_orderstatus,
                  CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                       AS VARCHAR),
                  CAST(CAST(date_trunc('day', o_orderdate) AS DATE)
                       AS VARCHAR))"""

_RECON_TARGET_SQL = """
        SELECT o_orderkey,
               o_orderstatus,
               CASE WHEN o_orderkey % 997 = 0
                    THEN o_totalprice + 0.01 ELSE o_totalprice END
                   AS o_totalprice,
               o_orderdate
        FROM orders WHERE o_orderkey % 1003 <> 7
        UNION ALL
        SELECT o_orderkey + 300000000, o_orderstatus, o_totalprice,
               o_orderdate
        FROM orders WHERE o_orderkey % 1009 = 3"""


def _recon_frames(spark: SparkSession, sf_dir: str):
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    k = F.col("o_orderkey")
    target = o.filter(k % 1003 != 7).withColumn(
        "o_totalprice",
        F.when(k % 997 == 0, F.col("o_totalprice") + 0.01).otherwise(
            F.col("o_totalprice")
        ),
    ).unionByName(
        o.filter(k % 1009 == 3).withColumn("o_orderkey", k + 300_000_000)
    )
    canon = [
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
        F.date_trunc("day", F.col("o_orderdate")).cast("date").cast("string"),
    ]
    return o, target, canon


@register(
    "reconcile_report_orders",
    oracle=f"""
    WITH tgt AS ({_RECON_TARGET_SQL}),
    sh AS (
        SELECT o_orderkey % 64 AS bucket,
               CAST(('0x' || substr(sha256({_RECON_CANON_SQL}), 1, 12))
                    AS BIGINT) AS h
        FROM orders),
    th AS (
        SELECT o_orderkey % 64 AS bucket,
               CAST(('0x' || substr(sha256({_RECON_CANON_SQL}), 1, 12))
                    AS BIGINT) AS h
        FROM tgt),
    sa AS (SELECT bucket, COUNT(*) AS src_cnt,
                  -- mod-2^61 keeps the checksum in BIGINT at ANY bucket
                  -- size (a raw 48-bit-slice sum overflows at ~65k
                  -- rows/bucket); collision odds are unchanged in practice
                  CAST(SUM(h) % 2305843009213693952 AS BIGINT) AS src_sum
           FROM sh GROUP BY bucket),
    ta AS (SELECT bucket, COUNT(*) AS tgt_cnt,
                  CAST(SUM(h) % 2305843009213693952 AS BIGINT) AS tgt_sum
           FROM th GROUP BY bucket)
    SELECT CAST(COALESCE(sa.bucket, ta.bucket) AS INT) AS bucket,
           COALESCE(src_cnt, 0) AS src_cnt, COALESCE(tgt_cnt, 0) AS tgt_cnt,
           COALESCE(src_sum, 0) AS src_sum, COALESCE(tgt_sum, 0) AS tgt_sum,
           COALESCE(src_cnt, 0) = COALESCE(tgt_cnt, 0)
             AND COALESCE(src_sum, 0) = COALESCE(tgt_sum, 0) AS consistent
    FROM sa FULL JOIN ta ON sa.bucket = ta.bucket
    """,
)
def reconcile_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication verification, bucket granularity (operators/
    reconcile.py:reconcile_report): the target replica carries three
    deterministic corruption classes (rows missing, rows modified by one
    cent, spurious extra rows) and the per-bucket count+checksum report
    pinpoints every dirty bucket without moving data — one aggregation
    pass per side, 64 output rows at ANY table size. Checksums are exact
    integer sums of 48-bit sha256 slices (order-free, engine-identical);
    doubles canonicalize through money-cents rounding."""
    from pipelinewise_spark.operators.reconcile import reconcile_report

    src, target, canon = _recon_frames(spark, sf_dir)
    rep = reconcile_report(src, target, "o_orderkey", canon, n_buckets=64)
    # driver-hash dtype contract wants BIGINT; the operator's exact
    # decimal(38,0) sums fold mod 2^61 so the cast can never overflow
    # (raw 48-bit-slice sums pass LONG_MAX at ~65k rows per bucket)
    return rep.select(
        "bucket", "src_cnt", "tgt_cnt",
        F.pmod(F.col("src_sum"), F.lit(2305843009213693952).cast("decimal(38,0)"))
        .cast("long").alias("src_sum"),
        F.pmod(F.col("tgt_sum"), F.lit(2305843009213693952).cast("decimal(38,0)"))
        .cast("long").alias("tgt_sum"),
        "consistent",
    )


@register(
    "reconcile_diff_orders",
    oracle=f"""
    WITH tgt AS ({_RECON_TARGET_SQL}),
    s AS (
        SELECT o_orderkey AS key,
               CAST(('0x' || substr(sha256({_RECON_CANON_SQL}), 1, 12))
                    AS BIGINT) AS sh
        FROM orders),
    t AS (
        SELECT o_orderkey AS key,
               CAST(('0x' || substr(sha256({_RECON_CANON_SQL}), 1, 12))
                    AS BIGINT) AS th
        FROM tgt)
    SELECT COALESCE(s.key, t.key) AS key,
           CASE WHEN t.th IS NULL THEN 'missing_in_target'
                WHEN s.sh IS NULL THEN 'missing_in_source'
                WHEN s.sh <> t.th THEN 'modified' END AS status
    FROM s FULL JOIN t ON s.key = t.key
    WHERE (t.th IS NULL) OR (s.sh IS NULL) OR (s.sh <> t.th)
    """,
)
def reconcile_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication verification, row granularity (operators/reconcile.py:
    reconcile_diff): the drill-down for the buckets reconcile_report
    flags — a full-outer key join carrying only (key, hash48) classifies
    every disagreement as missing_in_target / missing_in_source /
    modified. At 100 TB this runs only on flagged buckets; here it runs
    table-wide and must recover exactly the three injected corruption
    classes."""
    from pipelinewise_spark.operators.reconcile import reconcile_diff

    src, target, canon = _recon_frames(spark, sf_dir)
    return reconcile_diff(src, target, "o_orderkey", canon)


@register(
    "reconcile_repair_orders",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS DATE) AS o_orderdate
    FROM orders
    """,
)
def reconcile_repair_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The detect→repair loop closed (operators/reconcile.py:
    reconcile_repair): the same three-way-corrupted replica as
    reconcile_report/diff (rows missing, one-cent modifications, spurious
    extras) is repaired back to CONTENT EQUALITY with the source — the
    oracle is simply the source table itself, so every repaired cell is
    value-checked. Spurious rows drop via key anti-join, missing and
    modified rows re-copy from the source via key semi-join; agreeing
    rows pass through untouched (at 100 TB the repair moves only flagged
    keys). A second repair diffs empty (idempotence is asserted in
    tests/test_reconcile.py)."""
    from pipelinewise_spark.operators.reconcile import reconcile_repair

    src, target, canon = _recon_frames(spark, sf_dir)
    repaired = reconcile_repair(src, target, "o_orderkey", canon)
    return repaired.select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
    )


@register(
    "benford_audit_orders",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                           AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice > 0),
    obs AS (SELECT digit, COUNT(*) AS cnt FROM digits GROUP BY digit),
    exp AS (
        SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
                              (4, 96910), (5, 79181), (6, 66947),
                              (7, 57992), (8, 51153), (9, 45757))
            e(digit, expected_ppm)),
    n AS (SELECT SUM(cnt) AS total FROM obs)
    SELECT exp.digit, COALESCE(obs.cnt, 0) AS cnt, exp.expected_ppm,
           CAST(FLOOR(COALESCE(obs.cnt, 0) * 1000000 / n.total) AS BIGINT)
               AS observed_ppm,
           ABS(COALESCE(obs.cnt, 0) * 1000000
               - CAST(exp.expected_ppm AS BIGINT) * n.total)
             > 20000 * n.total AS deviates
    FROM exp LEFT JOIN obs USING (digit) CROSS JOIN n
    """,
)
def benford_audit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals
    (operators/monitors.py:benford_report) — the forensic data-quality
    check for fabricated or truncated numeric feeds. Exact integer
    arithmetic end to end: first digits come from the money-cents
    string, observed shares compare against precomputed Benford ppm
    LITERALS via cross-multiplication (|cnt·1e6 − ppm·N| > tol·N), so no
    log10 / float-summation nondeterminism exists anywhere. One
    map-side-combinable digit aggregate; everything after is 9 rows.
    (TPC-H prices are range-bounded rather than scale-free, so the audit
    legitimately flags most digits here — the point is the report is
    value-exact and cheap at any scale.)"""
    from pipelinewise_spark.operators.monitors import benford_report

    o = read_table(spark, sf_dir, "orders")
    return benford_report(o, "o_totalprice", tol_ppm=20_000).select(
        "digit", "cnt", "expected_ppm", "observed_ppm", "deviates"
    )


@register(
    "freshness_report_events",
    oracle="""
    WITH per AS (
        SELECT event_type,
               COUNT(*) AS n_events,
               MAX(epoch_ms(ts)) AS last_ms
        FROM events GROUP BY event_type),
    ref AS (SELECT MAX(last_ms) AS now_ms FROM per)
    SELECT per.event_type, per.n_events,
           CAST(FLOOR((ref.now_ms - per.last_ms) / 1000) AS BIGINT)
               AS lag_s,
           (ref.now_ms - per.last_ms) > 86400000 AS stale
    FROM per CROSS JOIN ref
    """,
)
def freshness_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness observability — the third leg of the volume
    (ingest_volume_anomaly / seasonal_anomaly) + distribution
    (snapshot/distribution drift) + schema (drift) monitoring quartet:
    per stream (event_type), last-event lag against the corpus watermark
    and a staleness flag at the 24h SLA
    (operators/monitors.py:freshness_report). One map-side-combinable
    aggregate (count + max per group) and a 1-row broadcast reference;
    all arithmetic in exact epoch milliseconds."""
    from pipelinewise_spark.operators.monitors import freshness_report

    ev = read_table(spark, sf_dir, "events")
    return freshness_report(ev, "ts", "event_type", sla_s=86_400).select(
        F.col("segment").alias("event_type"), "n_events", "lag_s", "stale"
    )


@register(
    "cardinality_drift_events",
    oracle="""
    WITH ref AS (
        SELECT event_type AS segment, user_id FROM events
        WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
    cur AS (
        SELECT event_type AS segment,
               CASE WHEN event_type = 'click' THEN user_id % 50
                    ELSE user_id END AS user_id
        FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'),
    r AS (SELECT segment, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                 AS ref_distinct FROM ref GROUP BY segment),
    c AS (SELECT segment, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                 AS cur_distinct FROM cur GROUP BY segment),
    j AS (
        SELECT COALESCE(r.segment, c.segment) AS segment,
               COALESCE(ref_distinct, 0) AS ref_distinct,
               COALESCE(cur_distinct, 0) AS cur_distinct
        FROM r FULL JOIN c ON r.segment = c.segment)
    SELECT segment, ref_distinct, cur_distinct,
           CAST(CASE WHEN ref_distinct = 0 THEN 1000000
                ELSE FLOOR(1000000.0
                           * ABS(cur_distinct - ref_distinct)
                           / ref_distinct) END AS BIGINT) AS delta_ppm,
           CASE WHEN ref_distinct = 0 THEN 1000000
                ELSE FLOOR(1000000.0
                           * ABS(cur_distinct - ref_distinct)
                           / ref_distinct) END > 200000 AS drifted
    FROM j
    """,
)
def cardinality_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment distinct-key cardinality drift (operators/drift.py:
    cardinality_drift) — the fifth observability face next to volume /
    distribution / freshness / schema: pre-Jan-20 events are the
    reference epoch; the current epoch carries an injected id-space
    COLLAPSE on one segment ('click' user ids squashed mod 50 — the
    key-truncation bug class) that the monitor must flag while organic
    segments stay quiet. Two countDistinct passes + an answer-sized
    segment join; delta leaves integer space only in the final ppm
    division. At 100 TB the exact countDistinct swaps for the HLL sketch
    table with the same report contract."""
    from pipelinewise_spark.operators.drift import cardinality_drift

    ev = read_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    ref = ev.filter(F.col("ts") < cut)
    cur = ev.filter(F.col("ts") >= cut).withColumn(
        "user_id",
        F.when(
            F.col("event_type") == "click", F.col("user_id") % 50
        ).otherwise(F.col("user_id")),
    )
    return cardinality_drift(ref, cur, "user_id", "event_type")


@register(
    "cardinality_drift_hll_events",
    oracle="""
    WITH ref AS (
        SELECT event_type AS segment, user_id FROM events
        WHERE ts < TIMESTAMP '2024-01-20 00:00:00'),
    cur AS (
        SELECT event_type AS segment,
               CASE WHEN event_type = 'click' THEN user_id % 50
                    ELSE user_id END AS user_id
        FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'),
    r AS (SELECT segment, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                 AS ref_exact FROM ref GROUP BY segment),
    c AS (SELECT segment, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                 AS cur_exact FROM cur GROUP BY segment)
    SELECT COALESCE(r.segment, c.segment) AS segment,
           COALESCE(ref_exact, 0) AS ref_exact,
           COALESCE(cur_exact, 0) AS cur_exact,
           TRUE AS ref_est_within_2pct,
           TRUE AS cur_est_within_2pct,
           CASE WHEN COALESCE(ref_exact, 0) = 0 THEN 1000000
                ELSE FLOOR(1000000.0
                           * ABS(COALESCE(cur_exact, 0) - ref_exact)
                           / ref_exact) END > 200000 AS drifted,
           TRUE AS flag_agrees_with_exact
    FROM r FULL JOIN c ON r.segment = c.segment
    """,
)
def cardinality_drift_hll_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB cardinality monitor (operators/drift.py:
    cardinality_drift_hll): the docstring-promised "swap the exact
    countDistinct for the HLL sketch table" made a REAL code path with
    the SAME report contract, on the same epoch split and injected
    'click' id-space collapse as cardinality_drift_events. The exact
    monitor shuffles every distinct (segment, key) pair; the sketch
    build shuffles KB-sized registers — the swap that matters when the
    key space is billions.

    Oracle contract (the HLL estimate is a DataSketches value DuckDB
    cannot reproduce): the query ALSO computes the exact monitor in
    Spark and emits the exact counts plus three hash-checked bounds —
    each side's estimate within the documented ±2% envelope (25x
    slack over the lgK=14 ~0.8% standard error), and the sketch
    monitor's drifted flag AGREEING with the exact monitor's on every
    segment (the injected collapse is 95%+ and organic drift is far
    from the 20% threshold, so the ±2% envelope cannot flip a flag
    here). A drifting sketch flips a hash-checked boolean instead of
    hiding behind a rows-only check."""
    from pipelinewise_spark.operators.drift import (
        cardinality_drift,
        cardinality_drift_hll,
    )

    ev = read_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")
    ref = ev.filter(F.col("ts") < cut)
    cur = ev.filter(F.col("ts") >= cut).withColumn(
        "user_id",
        F.when(
            F.col("event_type") == "click", F.col("user_id") % 50
        ).otherwise(F.col("user_id")),
    )
    exact = cardinality_drift(ref, cur, "user_id", "event_type").select(
        "segment",
        F.col("ref_distinct").alias("ref_exact"),
        F.col("cur_distinct").alias("cur_exact"),
        F.col("drifted").alias("__exact_drifted"),
    )
    est = cardinality_drift_hll(ref, cur, "user_id", "event_type").select(
        "segment",
        F.col("ref_distinct").alias("__ref_est"),
        F.col("cur_distinct").alias("__cur_est"),
        F.col("drifted").alias("__est_drifted"),
    )
    within = lambda e, x: (  # noqa: E731
        F.abs(F.col(e) - F.col(x)) <= F.lit(0.02) * F.col(x)
    )
    return exact.join(est, "segment").select(
        "segment",
        "ref_exact",
        "cur_exact",
        within("__ref_est", "ref_exact").alias("ref_est_within_2pct"),
        within("__cur_est", "cur_exact").alias("cur_est_within_2pct"),
        F.col("__exact_drifted").alias("drifted"),
        (F.col("__est_drifted") == F.col("__exact_drifted")).alias(
            "flag_agrees_with_exact"
        ),
    )


@register(
    "quality_report_orders",
    oracle="""
    WITH ref AS (
        SELECT o_orderpriority AS segment, o_totalprice AS v,
               o_custkey AS k, CAST(o_orderdate AS DATE) AS d
        FROM orders WHERE o_orderdate < DATE '1998-01-01'),
    cur AS (
        SELECT o_orderpriority AS segment,
               CASE WHEN o_orderpriority = '2-HIGH'
                    THEN o_totalprice + 50000.00 ELSE o_totalprice END AS v,
               o_custkey AS k, CAST(o_orderdate AS DATE) AS d
        FROM orders WHERE o_orderdate >= DATE '1998-01-01'),
    -- volume ------------------------------------------------------------
    volr AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS rn
             FROM ref GROUP BY segment),
    volc AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS cn
             FROM cur GROUP BY segment),
    vol AS (
        SELECT 'volume' AS monitor, segment,
               CAST(CASE WHEN COALESCE(rn, 0) = 0 THEN 1000000
                    ELSE FLOOR(1000000.0 * ABS(COALESCE(cn, 0) - rn) / rn)
               END AS BIGINT) AS metric,
               CAST(200000 AS BIGINT) AS threshold
        FROM volr FULL JOIN volc USING (segment)),
    -- cardinality -------------------------------------------------------
    cardr AS (SELECT segment, CAST(COUNT(DISTINCT k) AS BIGINT) AS rn
              FROM ref WHERE k IS NOT NULL GROUP BY segment),
    cardc AS (SELECT segment, CAST(COUNT(DISTINCT k) AS BIGINT) AS cn
              FROM cur WHERE k IS NOT NULL GROUP BY segment),
    card AS (
        SELECT 'cardinality' AS monitor, segment,
               CAST(CASE WHEN COALESCE(rn, 0) = 0 THEN 1000000
                    ELSE FLOOR(1000000.0 * ABS(COALESCE(cn, 0) - rn) / rn)
               END AS BIGINT) AS metric,
               CAST(200000 AS BIGINT) AS threshold
        FROM cardr FULL JOIN cardc USING (segment)),
    -- tvd (global, reference-decile buckets) -----------------------------
    edges AS (
        SELECT list_transform(
                 quantile_cont(v,
                   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                 q -> CAST(CAST(ROUND(q, 6) AS DECIMAL(18,6)) AS DOUBLE))
                   AS es
        FROM ref),
    rb AS (SELECT COALESCE(len(list_filter(es, e -> v > e)), 0) + 1
                   AS bucket FROM ref, edges),
    cb AS (SELECT COALESCE(len(list_filter(es, e -> v > e)), 0) + 1
                   AS bucket FROM cur, edges),
    rc AS (SELECT bucket, COUNT(*) AS ref_cnt FROM rb GROUP BY bucket),
    cc AS (SELECT bucket, COUNT(*) AS cur_cnt FROM cb GROUP BY bucket),
    per AS (
        SELECT b.bucket, COALESCE(rc.ref_cnt, 0) AS ref_cnt,
               COALESCE(cc.cur_cnt, 0) AS cur_cnt
        FROM (SELECT unnest(range(1, 11)) AS bucket) b
        LEFT JOIN rc USING (bucket) LEFT JOIN cc USING (bucket)),
    tot AS (SELECT SUM(ref_cnt) AS nr2, SUM(cur_cnt) AS nc2 FROM per),
    tvd AS (
        SELECT 'tvd' AS monitor, '(all)' AS segment,
               CAST(FLOOR(
                 1000000::HUGEINT
                 * SUM(ABS(ref_cnt::HUGEINT * nc2 - cur_cnt::HUGEINT * nr2))
                 / (2::HUGEINT * MAX(nr2) * MAX(nc2))) AS BIGINT) AS metric,
               CAST(50000 AS BIGINT) AS threshold
        FROM per, tot),
    -- ks + mw (shared per-(segment, value) counts) ------------------------
    pv AS (
        SELECT segment, v,
               CAST(SUM(r) AS BIGINT) AS cr, CAST(SUM(c) AS BIGINT) AS cc
        FROM (SELECT segment, v, 1 AS r, 0 AS c FROM ref
              UNION ALL
              SELECT segment, v, 0 AS r, 1 AS c FROM cur)
        GROUP BY segment, v),
    n AS (SELECT segment, CAST(SUM(cr) AS BIGINT) AS n_ref,
                 CAST(SUM(cc) AS BIGINT) AS n_cur
          FROM pv GROUP BY segment),
    cum AS (
        SELECT segment, v,
               SUM(cr) OVER (PARTITION BY segment ORDER BY v) AS cum_r,
               SUM(cc) OVER (PARTITION BY segment ORDER BY v) AS cum_c,
               2 * SUM(cr + cc) OVER (PARTITION BY segment ORDER BY v)
                 - (cr + cc) + 1 AS r2,
               cr
        FROM pv),
    dd AS (SELECT c.segment,
                  CAST(MAX(ABS(cum_r * n_cur - cum_c * n_ref)) AS HUGEINT)
                      AS d2
           FROM cum c JOIN n USING (segment) GROUP BY c.segment),
    ks AS (
        SELECT 'ks' AS monitor, n.segment,
               CAST(CASE WHEN n_ref = 0 OR n_cur = 0 THEN 1000000
                    ELSE FLOOR(1000000 * d2 / (n_ref * n_cur))
               END AS BIGINT) AS metric,
               CAST(CASE WHEN n_ref = 0 OR n_cur = 0 THEN NULL
                    ELSE FLOOR(1000000.0 * 1.358
                               * sqrt((n_ref + n_cur)
                                      / (CAST(n_ref AS DOUBLE) * n_cur)))
               END AS BIGINT) AS threshold,
               CASE WHEN n_ref = 0 OR n_cur = 0 THEN TRUE
                    ELSE (d2 / (CAST(n_ref AS DOUBLE) * n_cur))
                         > 1.358 * sqrt((n_ref + n_cur)
                                        / (CAST(n_ref AS DOUBLE) * n_cur))
               END AS drifted
        FROM dd JOIN n USING (segment)),
    mwagg AS (
        SELECT segment,
               CAST(SUM(cr * r2) AS HUGEINT) AS rr2,
               MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur
        FROM cum JOIN n USING (segment) GROUP BY segment),
    mw AS (
        SELECT 'mw' AS monitor, segment,
               CAST(ABS(CASE WHEN n_ref = 0 OR n_cur = 0 THEN 1000000
                    ELSE FLOOR(1000000 * (rr2 - n_ref * (n_ref + 1))
                               / (2 * n_ref * n_cur)) END - 500000)
               AS BIGINT) AS metric,
               CAST(100000 AS BIGINT) AS threshold
        FROM mwagg),
    -- benford (current epoch) --------------------------------------------
    bdig AS (
        SELECT CAST(substr(CAST(CAST(ROUND(v * 100, 0) AS BIGINT)
                           AS VARCHAR), 1, 1) AS INT) AS digit
        FROM cur WHERE v > 0),
    bobs AS (SELECT digit, COUNT(*) AS cnt FROM bdig GROUP BY digit),
    bexp AS (
        SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
                              (4, 96910), (5, 79181), (6, 66947),
                              (7, 57992), (8, 51153), (9, 45757))
            e(digit, expected_ppm)),
    bn AS (SELECT SUM(cnt) AS total FROM bobs),
    ben AS (
        SELECT 'benford' AS monitor, 'digit=' || bexp.digit AS segment,
               CAST(FLOOR(ABS(COALESCE(bobs.cnt, 0) * 1000000
                              - CAST(bexp.expected_ppm AS BIGINT) * bn.total)
                          / bn.total) AS BIGINT) AS metric,
               CAST(20000 AS BIGINT) AS threshold,
               ABS(COALESCE(bobs.cnt, 0) * 1000000
                   - CAST(bexp.expected_ppm AS BIGINT) * bn.total)
                 > 20000 * bn.total AS drifted
        FROM bexp LEFT JOIN bobs USING (digit) CROSS JOIN bn),
    -- freshness (current epoch, date-grained) -----------------------------
    fper AS (SELECT segment, MAX(d) AS last FROM cur GROUP BY segment),
    fref AS (SELECT MAX(last) AS now FROM fper),
    fresh AS (
        SELECT 'freshness' AS monitor, segment,
               CAST(date_diff('day', last, now) AS BIGINT) AS metric,
               CAST(30 AS BIGINT) AS threshold
        FROM fper, fref)
    SELECT monitor, segment, metric, threshold,
           metric > threshold AS drifted FROM vol
    UNION ALL
    SELECT monitor, segment, metric, threshold,
           metric > threshold AS drifted FROM card
    UNION ALL
    SELECT monitor, segment, metric, threshold,
           metric > threshold AS drifted FROM tvd
    UNION ALL
    SELECT monitor, segment, metric, threshold, drifted FROM ks
    UNION ALL
    SELECT monitor, segment, metric, threshold,
           metric > threshold AS drifted FROM mw
    UNION ALL
    SELECT monitor, segment, metric, threshold, drifted FROM ben
    UNION ALL
    SELECT monitor, segment, metric, threshold,
           metric > threshold AS drifted FROM fresh
    """,
)
def quality_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNIFIED nightly quality matrix (operators/monitors.py:
    quality_report) — the r9 index-lifecycle consolidation applied to
    observability: all seven monitor verbs (per-segment volume,
    cardinality, bucketed TVD, KS, Mann-Whitney, Benford, freshness)
    over ONE pinned (reference epoch, current epoch) pair, emitted as
    one (monitor, segment, metric, threshold, drifted) frame a
    production pipeline registers as a single nightly job. Same epoch
    split and injected +50000.00 '2-HIGH' shift as the standalone
    ks/mw queries, so the matrix must flag the shifted segment on the
    rank monitors while the scalar monitors (volume/cardinality) stay
    quiet at the generator's organic drift. Every row keeps its
    kernel's exact integer/ppm arithmetic — this composition reshapes
    columns, never recomputes a verdict — and each kernel is one or two
    map-side-combinable corpus aggregates, so the composed nightly job
    costs exactly the sum of its parts."""
    from pipelinewise_spark.operators.monitors import quality_report

    o = read_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("date")
    ref = o.filter(F.col("o_orderdate") < cut)
    cur = o.filter(F.col("o_orderdate") >= cut).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderpriority") == "2-HIGH",
            F.col("o_totalprice") + F.lit("50000.00").cast("decimal(12,2)"),
        ).otherwise(F.col("o_totalprice")),
    )
    return quality_report(
        ref,
        cur,
        value_col="o_totalprice",
        key_col="o_custkey",
        segment_col="o_orderpriority",
        tie_cols=["o_orderkey"],
        date_col="o_orderdate",
        freshness_sla_days=30,
    )


@register(
    "mw_drift_by_segment_orders",
    oracle="""
    WITH ref AS (
        SELECT o_orderpriority AS segment, o_totalprice AS v
        FROM orders WHERE o_orderdate < DATE '1998-01-01'),
    cur AS (
        SELECT o_orderpriority AS segment,
               CASE WHEN o_orderpriority = '2-HIGH'
                    THEN o_totalprice + 50000.00 ELSE o_totalprice END AS v
        FROM orders WHERE o_orderdate >= DATE '1998-01-01'),
    pv AS (
        SELECT segment, v,
               CAST(SUM(r) AS BIGINT) AS cr, CAST(SUM(c) AS BIGINT) AS cc
        FROM (SELECT segment, v, 1 AS r, 0 AS c FROM ref
              UNION ALL
              SELECT segment, v, 0 AS r, 1 AS c FROM cur)
        GROUP BY segment, v),
    ranked AS (
        SELECT segment, v, cr, cc,
               2 * SUM(cr + cc) OVER (PARTITION BY segment ORDER BY v)
                 - (cr + cc) + 1 AS r2
        FROM pv),
    agg AS (
        SELECT segment,
               CAST(SUM(cr * r2) AS BIGINT) AS rr2,
               CAST(SUM(cr) AS BIGINT) AS n_ref,
               CAST(SUM(cc) AS BIGINT) AS n_cur
        FROM ranked GROUP BY segment)
    SELECT segment, n_ref, n_cur,
           CAST(rr2 - n_ref * (n_ref + 1) AS BIGINT) AS u_ref_x2,
           CAST(CASE WHEN n_ref = 0 OR n_cur = 0 THEN 1000000
                ELSE FLOOR(1000000 * (rr2 - n_ref * (n_ref + 1))
                           / (2 * n_ref * n_cur)) END AS BIGINT)
               AS effect_ppm,
           ABS(CASE WHEN n_ref = 0 OR n_cur = 0 THEN 1000000
                ELSE FLOOR(1000000 * (rr2 - n_ref * (n_ref + 1))
                           / (2 * n_ref * n_cur)) END - 500000) > 100000
               AS drifted
    FROM agg
    """,
)
def mw_drift_by_segment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Mann-Whitney location drift (operators/drift.py:
    mw_drift_by_segment) — the rank-sum sibling of
    ks_drift_by_segment_orders on the SAME epoch split and injected
    +50000.00 shift: the shifted segment's common-language effect
    collapses toward 0 (reference values rank below the shifted current
    ones) and flags; organic segments hover near the no-shift 500000
    ppm. Integer-exact end to end (doubled tie-averaged ranks over the
    segment-grouped distributed prefix sum; one trailing ppm
    division)."""
    from pipelinewise_spark.operators.drift import mw_drift_by_segment

    o = read_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("date")
    ref = o.filter(F.col("o_orderdate") < cut)
    cur = o.filter(F.col("o_orderdate") >= cut).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderpriority") == "2-HIGH",
            F.col("o_totalprice") + F.lit("50000.00").cast("decimal(12,2)"),
        ).otherwise(F.col("o_totalprice")),
    )
    return mw_drift_by_segment(ref, cur, "o_totalprice", "o_orderpriority")


@register(
    "k_anonymity_customer",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT))
                AS BIGINT) AS l_diversity,
           count(*) < 10 AS at_risk
    FROM customer
    GROUP BY 1, 2
    """,
)
def k_anonymity_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification risk report (operators/compliance.py:
    k_anonymity_report) — the measurement face of the privacy story
    whose erasure face is `forget`: equivalence classes over the
    (nation, market-segment) quasi-identifier tuple, each class's size
    (its k-anonymity), its l-diversity over the banded account balance
    (floor(acctbal/1000) — a class where every member shares a balance
    band leaks the attribute even when k-anonymous), and the at_risk
    flag (class smaller than k=10). One map-side-combinable groupBy;
    the answer is quasi-domain-sized, never row-scale."""
    from pipelinewise_spark.operators.compliance import k_anonymity_report

    cust = read_table(spark, sf_dir, "customer").withColumn(
        "__band", F.floor(F.col("c_acctbal") / 1000.0)
    )
    return k_anonymity_report(
        cust,
        ["c_nationkey", "c_mktsegment"],
        sensitive_col="__band",
        k=10,
    )


@register(
    "vocab_drift_documents",
    oracle=r"""
    WITH ref AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        FROM documents WHERE doc_id % 2 = 0),
    cur0 AS (
        SELECT CASE WHEN doc_id % 10 = 1
                    THEN text || ' lorem_template_block lorem_template_block'
                         || ' lorem_template_block lorem_template_block'
                         || ' lorem_template_block lorem_template_block'
                         || ' lorem_template_block lorem_template_block'
                         || ' lorem_template_block lorem_template_block'
                    ELSE text END AS text
        FROM documents WHERE doc_id % 2 = 1),
    cur AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        FROM cur0),
    rt AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(toks) AS term FROM ref) t
        WHERE length(term) > 0 GROUP BY 1),
    ct AS (
        SELECT term, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(toks) AS term FROM cur) t
        WHERE length(term) > 0 GROUP BY 1),
    v AS (
        SELECT term FROM (
            SELECT term, row_number() OVER (ORDER BY cnt DESC, term) AS r
            FROM rt)
        WHERE r <= 50),
    pr AS (
        SELECT v.term, COALESCE(rt.cnt, 0) AS ref_cnt,
               COALESCE(ct.cnt, 0) AS cur_cnt
        FROM v LEFT JOIN rt USING (term) LEFT JOIN ct USING (term)),
    rtot AS (SELECT COALESCE(SUM(cnt), 0) AS n FROM rt),
    ctot AS (SELECT COALESCE(SUM(cnt), 0) AS n FROM ct),
    rin AS (SELECT COALESCE(SUM(ref_cnt), 0) AS s FROM pr),
    cin AS (SELECT COALESCE(SUM(cur_cnt), 0) AS s FROM pr),
    per AS (
        SELECT term, ref_cnt, cur_cnt FROM pr
        UNION ALL
        SELECT '(oov)', rtot.n - rin.s, ctot.n - cin.s
        FROM rtot, ctot, rin, cin),
    tot AS (SELECT SUM(ref_cnt) AS nr, SUM(cur_cnt) AS nc FROM per),
    tvd AS (
        SELECT CAST(FLOOR(
            1000000::HUGEINT
            * SUM(ABS(ref_cnt::HUGEINT * nc - cur_cnt::HUGEINT * nr))
            / (2::HUGEINT * MAX(nr) * MAX(nc))) AS BIGINT) AS tvd_ppm
        FROM per, tot)
    SELECT per.term,
           CAST(per.ref_cnt AS BIGINT) AS ref_cnt,
           CAST(per.cur_cnt AS BIGINT) AS cur_cnt,
           CAST(FLOOR(1000000.0 * per.ref_cnt / tot.nr) AS BIGINT)
               AS ref_ppm,
           CAST(FLOOR(1000000.0 * per.cur_cnt / tot.nc) AS BIGINT)
               AS cur_ppm,
           tvd.tvd_ppm, tvd.tvd_ppm > 33000 AS drifted
    FROM per, tot, tvd
    """,
)
def vocab_drift_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-corpus vocabulary drift (operators/drift.py:vocab_drift) —
    the TEXT face of the drift family: even-doc_id documents pin the
    reference alphabet (top-50 terms + the (oov) bucket); the current
    epoch (odd doc_ids) carries an injected template block (10 repeated
    tokens on every tenth document — the scraper-breakage / boilerplate-
    injection pathology) that lands in (oov) and must push the
    integer-exact TVD over the calibrated 33k-ppm bound, while the
    organic parity split alone stays under it (measured 21-27k ppm vs
    42-47k injected at sf0.001/0.01). Top-K selection rides the
    distributed rank — no SinglePartition window over the vocabulary."""
    from pipelinewise_spark.operators.drift import vocab_drift

    d = read_table(spark, sf_dir, "documents")
    blk = " ".join(["lorem_template_block"] * 10)
    ref = d.filter(F.col("doc_id") % 2 == 0)
    cur = d.filter(F.col("doc_id") % 2 == 1).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 1,
            F.concat(F.col("text"), F.lit(" " + blk)),
        ).otherwise(F.col("text")),
    )
    return vocab_drift(ref, cur, "text", top_k=50, threshold_ppm=33_000)


@register(
    "wap_privacy_gate_customer",
    oracle="""
    WITH seg AS (
        SELECT c_mktsegment, COUNT(*) AS n,
               COUNT(DISTINCT c_nationkey) AS l
        FROM customer GROUP BY 1),
    agg AS (
        SELECT CAST(SUM(CASE WHEN n >= 5 THEN n ELSE 0 END) AS DOUBLE)
                   / SUM(n) AS ka,
               CAST(SUM(CASE WHEN l >= 2 THEN n ELSE 0 END) AS DOUBLE)
                   / SUM(n) AS la
        FROM seg),
    nameseg AS (SELECT c_name, COUNT(*) AS n FROM customer GROUP BY 1),
    aggb AS (
        SELECT CAST(SUM(CASE WHEN n >= 5 THEN n ELSE 0 END) AS DOUBLE)
                   / SUM(n) AS kb
        FROM nameseg)
    SELECT 'generalized' AS scenario, 'k_anonymous' AS rule,
           'c_mktsegment' AS col_name, ka AS metric, 1.0 AS threshold,
           ka >= 1.0 AS passed, (ka >= 1.0 AND la >= 1.0) AS published
    FROM agg
    UNION ALL
    SELECT 'generalized', 'l_diverse', 'c_mktsegment', la, 1.0,
           la >= 1.0, (ka >= 1.0 AND la >= 1.0) FROM agg
    UNION ALL
    SELECT 'fine_quasi', 'k_anonymous', 'c_name', kb, 1.0, kb >= 1.0,
           kb >= 1.0 FROM aggb
    """,
)
def wap_privacy_gate_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy as a RELEASE GATE (operators/expectations.py:k_anonymous/
    l_diverse wired into write_audit_publish): a data release stages on
    a ManifestTable branch, the k-anonymity/l-diversity audit runs
    against the STAGED snapshot, and main fast-forwards only when the
    re-identification risk clears the bound — the same WAP machinery
    that refuses FK violations (wap_publish_orders) now refuses privacy
    risk. Scenario 'generalized' (quasi = c_mktsegment, sensitive =
    c_nationkey) publishes: every class is large and diverse. Scenario
    'fine_quasi' (quasi = c_name — globally unique, every class a
    singleton) is BLOCKED with main untouched, asserted in-query.
    Metrics are row-share ratios from ONE aggregate pass per audit
    (exact 0/1 indicator division, identical IEEE in both engines)."""
    cust = read_table(spark, sf_dir, "customer")
    from pipelinewise_spark.operators.expectations import (
        k_anonymous,
        l_diverse,
    )

    release = cust.select(
        "c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal"
    )
    fine = cust.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    with fixture_timer():
        tmp = tempfile.mkdtemp(prefix="pws_privgate_")
        table_a = ManifestTable(os.path.join(tmp, "release"))
        table_a.overwrite(release.limit(0))
        table_b = ManifestTable(os.path.join(tmp, "release_fine"))
        table_b.overwrite(fine.limit(0))

    rules_a = [
        k_anonymous(["c_mktsegment"], k=5),
        l_diverse(["c_mktsegment"], "c_nationkey", l_min=2),
    ]
    ok_a, rep_a = write_audit_publish(
        spark, table_a, rules_a,
        lambda br: br.merge(spark, release, ["c_custkey"]),
    )
    assert ok_a, "generalized release must publish"
    assert table_a.read(spark).count() == release.count()

    rules_b = [k_anonymous(["c_name"], k=5)]
    ok_b, rep_b = write_audit_publish(
        spark, table_b, rules_b,
        lambda br: br.merge(spark, fine, ["c_custkey"]),
    )
    assert not ok_b, "singleton-quasi release must be blocked"
    # the blocked release never reaches main's readers
    assert table_b.read(spark).count() == 0

    rows = [
        ("generalized", r["rule"], r["column"], r["metric"],
         r["threshold"], r["passed"], ok_a)
        for r in rep_a
    ] + [
        ("fine_quasi", r["rule"], r["column"], r["metric"],
         r["threshold"], r["passed"], ok_b)
        for r in rep_b
    ]
    return local_frame(spark, 
        rows,
        "scenario string, rule string, col_name string, metric double, "
        "threshold double, passed boolean, published boolean",
    )
