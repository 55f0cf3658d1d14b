"""Analytic benchmark queries over the driver's TPC-H-ish star schema.

These are the engine's headline throughput anchors (bench.py). Numeric note:
both Spark and the DuckDB oracle cast DOUBLE measures to DECIMAL before
summing, so aggregates are exact and hash-comparable regardless of partial-agg
order; final values cast back to DOUBLE. Decimal widths are chosen so no
intermediate exceeds precision 38 in either engine (their overflow/capping
rules differ — staying under the cap keeps both sides exact and identical).
Plans: fact-side scans keep pushed filters; dimension joins broadcast
(verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelinewise_spark.queries.registry import register
from pipelinewise_spark.sources.files import read_table

# SQL fragments shared by the DuckDB oracles (kept textually parallel to the
# Column expressions below — same casts, same widths).
_SQL_DISC_PRICE = (
    "CAST(CAST({p}l_extendedprice AS DECIMAL(12,4)) * "
    "CAST(1 - CAST({p}l_discount AS DECIMAL(12,4)) AS DECIMAL(13,4)) "
    "AS DECIMAL(22,8))"
)
_SQL_CHARGE = (
    f"CAST({_SQL_DISC_PRICE} * "
    "CAST(1 + CAST({p}l_tax AS DECIMAL(12,4)) AS DECIMAL(13,4)) "
    "AS DECIMAL(30,12))"
)


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(12,4)")


def _sum_double(c: Column) -> Column:
    """Exact decimal SUM surfaced as DOUBLE, identically in both engines.

    decimal→double casts are only correctly rounded when the unscaled value
    fits in an int64 fast path (DuckDB's int128 path differs in the last ulp),
    so round to scale 6 and squeeze through DECIMAL(18,6) first.
    """
    return F.round(F.sum(c), 6).cast("decimal(18,6)").cast("double")


# SQL twin of _sum_double
def _sql_sum_double(expr: str) -> str:
    return f"CAST(CAST(ROUND(SUM({expr}), 6) AS DECIMAL(18,6)) AS DOUBLE)"


def _disc_price() -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal, width-capped."""
    one_minus = (F.lit(1).cast("decimal(12,4)") - _dec("l_discount")).cast(
        "decimal(13,4)"
    )
    return (_dec("l_extendedprice") * one_minus).cast("decimal(22,8)")


def _charge() -> Column:
    one_plus = (F.lit(1).cast("decimal(12,4)") + _dec("l_tax")).cast("decimal(13,4)")
    return (_disc_price() * one_plus).cast("decimal(30,12)")


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {_sql_sum_double("CAST(l_quantity AS DECIMAL(12,4))")} AS sum_qty,
           {_sql_sum_double("CAST(l_extendedprice AS DECIMAL(12,4))")} AS sum_base_price,
           {_sql_sum_double(_SQL_DISC_PRICE.format(p=""))} AS sum_disc_price,
           {_sql_sum_double(_SQL_CHARGE.format(p=""))} AS sum_charge,
           {_sql_sum_double("CAST(l_quantity AS DECIMAL(12,4))")} / COUNT(*) AS avg_qty,
           {_sql_sum_double("CAST(l_extendedprice AS DECIMAL(12,4))")} / COUNT(*) AS avg_price,
           {_sql_sum_double("CAST(l_discount AS DECIMAL(12,4))")} / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship query. One scan with a
    pushed shipdate filter, partial aggregation map-side, 6 groups out."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sum_double(_dec("l_quantity")).alias("sum_qty"),
            _sum_double(_dec("l_extendedprice")).alias("sum_base_price"),
            _sum_double(_disc_price()).alias("sum_disc_price"),
            _sum_double(_charge()).alias("sum_charge"),
            (_sum_double(_dec("l_quantity")) / F.count("*")).alias("avg_qty"),
            (_sum_double(_dec("l_extendedprice")) / F.count("*")).alias("avg_price"),
            (_sum_double(_dec("l_discount")) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {_sql_sum_double(_SQL_DISC_PRICE.format(p="l."))} AS revenue,
           o.o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter → fact joins → grouped revenue.
    customer (filtered) broadcasts; orders⋈lineitem shuffles on orderkey."""
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_sum_double(_disc_price()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {_sql_sum_double(_SQL_DISC_PRICE.format(p="l."))} AS revenue
    FROM customer c
    JOIN orders o     ON c.c_custkey = o.o_custkey
    JOIN lineitem l   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s   ON l.l_suppkey = s.s_suppkey
                     AND c.c_nationkey = s.s_nationkey
    JOIN nation n     ON s.s_nationkey = n.n_nationkey
    JOIN region r     ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: 6-table star join; all dims broadcast, facts shuffle
    once on orderkey."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_sum_double(_disc_price()).alias("revenue"))
    )


@register(
    "sessionize_events",
    oracle="""
    WITH gaps AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w)
                            > 30 * 60 * 1000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
        SELECT user_id, event_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap sessions per user via lag + running sum —
    one user-hash shuffle, the standard event-analytics building block."""
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(w))
    new_session = F.when(
        gap_ms.isNull() | (gap_ms > 30 * 60 * 1000), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = e.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", F.col("session_id").cast("bigint").alias("session_id"),
                "session_start", "session_end", "n_events")
    )


@register(
    "rollup_order_revenue",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {_sql_sum_double("CAST(o_totalprice AS DECIMAL(12,4))")} AS revenue,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregation via ROLLUP (subtotals + grand total) — one
    pass, grouping-set expansion handled by Catalyst."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            _sum_double(F.col("o_totalprice").cast("decimal(12,4)")).alias(
                "revenue"
            ),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate
    GROUP BY l.l_linestatus
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional aggregation over a fact join."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT CAST(100.0 AS DOUBLE) *
           {_sql_sum_double(
               "CASE WHEN p.p_type = 'PROMO' THEN "
               + _SQL_DISC_PRICE.format(p="l.")
               + " ELSE CAST(0 AS DECIMAL(22,8)) END")}
           / {_sql_sum_double(_SQL_DISC_PRICE.format(p="l."))}
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo-revenue percentage; part broadcasts."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part")
    promo = F.when(
        F.col("p_type") == "PROMO", _disc_price()
    ).otherwise(F.lit(0).cast("decimal(22,8)"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0).cast("double")
                * _sum_double(promo)
                / _sum_double(_disc_price())
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_orderkey' AS column, count(*) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value,
           CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           count(DISTINCT o_orderstatus),
           CAST(min(o_orderstatus) AS VARCHAR),
           CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-column profiling (null rate, distinct, min/max) —
    the data-quality statistics operator."""
    from pipelinewise_spark.operators.profile import profile

    o = read_table(spark, sf_dir, "orders")
    return profile(o, ["o_orderkey", "o_orderstatus"])


@register(
    "windowed_event_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           user_id,
           count(*) AS n_events,
           CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6)
                AS DECIMAL(18,6)) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (the same expression tree runs
    streaming with a watermark — tests/test_windows_state.py proves
    stream ≡ batch)."""
    from pipelinewise_spark.streaming.windows import windowed_counts

    e = read_table(spark, sf_dir, "events")
    return windowed_counts(e, by=["user_id"])


@register(
    "anti_join_inactive_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    """,
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no order since 1999 — the
    filter pushes into the orders scan, the anti join broadcasts the smaller
    side under AQE."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "semi_join_parts_shipped",
    oracle="""
    SELECT p.p_partkey, p.p_brand, p.p_retailprice
    FROM part p
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
    """,
)
def semi_join_parts_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): parts that ever shipped in quantity >= 45."""
    p = read_table(spark, sf_dir, "part")
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return p.join(
        l, p.p_partkey == l.l_partkey, "left_semi"
    ).select("p_partkey", "p_brand", "p_retailprice")


@register(
    "except_customers_both_segments",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def except_customers_both_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (EXCEPT DISTINCT): customers with open orders but no
    finished ones."""
    o = read_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.subtract(fin_c)  # EXCEPT DISTINCT semantics


@register(
    "intersect_customers_both_statuses",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def intersect_customers_both_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (INTERSECT DISTINCT): customers with both open and
    finished orders."""
    o = read_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(fin_c)


@register(
    "events_topk_per_user",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY value DESC, event_id DESC) <= 3
    """,
)
def events_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per key via ranked window — one key-hash shuffle, no driver loop."""
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .drop("__rn")
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join (late-shipment
    variant — this schema has no commit/receipt dates). The semi join keeps
    the orders scan narrow (no lineitem columns survive the join) and
    aggregates after — one shuffle on the join key, one on the group key."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {_sql_sum_double(_SQL_DISC_PRICE.format(p="l."))} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue. The
    returnflag filter is pushed into the lineitem scan; nation broadcasts;
    the customer/orders joins shuffle on their keys (both sides fact-sized
    at scale). Deterministic top-k: ties broken on c_custkey."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_sum_double(_disc_price()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 6)
                    AS DECIMAL(18,6)) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY 1
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 150)
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over an exact-decimal quantity sum, then join
    back to orders/customer. The heavy aggregation runs FIRST (map-side
    partial combine on l_orderkey), so only qualifying orders reach the
    joins — the aggregate-then-join ordering that survives 100×."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__sq"))
        .filter(F.col("__sq") > 150)
        .select(
            "l_orderkey",
            F.round(F.col("__sq"), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("sum_qty"),
        )
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
    )


@register(
    "asof_join_click_purchase",
    oracle="""
    WITH c AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'click'),
    p AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               event_id AS purchase_event_id, value AS purchase_value,
               row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                                  ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'purchase'),
    p1 AS (SELECT user_id, ts_us, purchase_event_id, purchase_value
           FROM p WHERE rn = 1)
    SELECT c.event_id, c.user_id, c.ts_us,
           p1.purchase_event_id, p1.purchase_value
    FROM c ASOF LEFT JOIN p1
      ON c.user_id = p1.user_id AND c.ts_us >= p1.ts_us
    """,
)
def asof_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correctness for feature pipelines: every click event
    joined to the same user's newest purchase at-or-before it, via the
    merge-sort as-of join (operators/asof.py). Oracle = DuckDB's native
    ASOF LEFT JOIN, value-for-value."""
    from pyspark.sql import Window

    from pipelinewise_spark.operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    # determinism: one purchase per (user, instant)
    w = Window.partitionBy("user_id", "ts_us").orderBy("purchase_event_id")
    p1 = (
        purchases.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    out = asof_join(clicks, p1, by=["user_id"], on="ts_us")
    return out.select(
        "event_id", "user_id", "ts_us", "purchase_event_id", "purchase_value"
    )


@register(
    "range_join_attribution",
    oracle="""
    WITH c AS (
        SELECT event_id, user_id, epoch_us(ts) AS ts_us
        FROM events WHERE event_type = 'click'),
    p AS (
        SELECT event_id AS purchase_event_id, user_id,
               epoch_us(ts) - 3600000000 AS w_start, epoch_us(ts) AS w_end
        FROM events WHERE event_type = 'purchase')
    SELECT p.purchase_event_id,
           count(*) AS n_clicks,
           CAST(min(c.event_id) AS BIGINT) AS first_click_event_id
    FROM c JOIN p
      ON c.user_id = p.user_id
     AND c.ts_us >= p.w_start AND c.ts_us <= p.w_end
    GROUP BY 1
    """,
)
def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window range join: clicks within the 1 h window before
    each same-user purchase, via the bucketed interval join
    (operators/rangejoin.py) — an equi-join on (user, bucket), never a
    nested loop. Oracle = the plain inequality join in DuckDB."""
    from pipelinewise_spark.operators.rangejoin import range_join

    ev = read_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        (F.col("ts_us") - 3_600_000_000).alias("w_start"),
        F.col("ts_us").alias("w_end"),
    )
    joined = range_join(
        clicks, purchases, "ts_us", "w_start", "w_end",
        by=["user_id"], bucket_width=3_600_000_000,
    )
    return joined.groupBy("purchase_event_id").agg(
        F.count("*").alias("n_clicks"),
        F.min("event_id").cast("bigint").alias("first_click_event_id"),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice) AS best_price
        FROM lineitem GROUP BY 1, 2)
    SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, ps.best_price
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE p.p_size <= 10
      AND ps.best_price = (SELECT min(ps2.best_price) FROM ps ps2
                           WHERE ps2.l_partkey = ps.l_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar subquery (cheapest supplier per
    part), written as actual SQL so Catalyst's subquery DECORRELATION does
    the rewrite — it lowers to an aggregate + self-join, never a per-row
    probe. Demonstrates the engine's full-SQL surface beside the DataFrame
    API (same session, same tables)."""
    for t in ("lineitem", "part", "supplier"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(f"__q2_{t}")
    return spark.sql("""
        WITH ps AS (
            SELECT l_partkey, l_suppkey, min(l_extendedprice) AS best_price
            FROM __q2_lineitem GROUP BY 1, 2)
        SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, ps.best_price
        FROM ps
        JOIN __q2_part p ON p.p_partkey = ps.l_partkey
        JOIN __q2_supplier s ON s.s_suppkey = ps.l_suppkey
        WHERE p.p_size <= 10
          AND ps.best_price = (SELECT min(ps2.best_price) FROM ps ps2
                               WHERE ps2.l_partkey = ps.l_partkey)
    """)


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           {_sql_sum_double(_SQL_DISC_PRICE.format(p="l."))} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair by year —
    five-table join with an OR'd pair predicate. Both nation joins
    broadcast; the OR filter applies after them (Catalyst pushes the
    per-side IN('NATION_1','NATION_2') residuals into the broadcast
    hash joins)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("__n1k"), F.col("n_name").alias("cust_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("__n2k"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | (
        (F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("__n1k"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("__n2k"))
        .filter(pair)
        .groupBy(
            "cust_nation", "supp_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(_sum_double(_disc_price()).alias("revenue"))
    )


@register(
    "q20_excess_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)
        GROUP BY l_suppkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,4))) > 400)
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: doubly-nested IN subqueries — written as SQL so
    Catalyst rewrites both levels into semi joins (small-part filter feeds
    the lineitem aggregation, which semi-joins into supplier). Exact
    decimal HAVING on both engines."""
    for t in ("lineitem", "part", "supplier"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(f"__q20_{t}")
    return spark.sql("""
        SELECT s.s_suppkey, s.s_name
        FROM __q20_supplier s
        WHERE s.s_suppkey IN (
            SELECT l_suppkey FROM __q20_lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM __q20_part
                                WHERE p_size <= 5)
            GROUP BY l_suppkey
            HAVING sum(CAST(l_quantity AS DECIMAL(12,4))) > 400)
    """)


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(ROUND(SUM(
               CAST(CAST(l_extendedprice AS DECIMAL(12,4)) *
                    CAST(l_discount AS DECIMAL(12,4)) AS DECIMAL(22,8))
           ), 6) AS DECIMAL(18,6)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate. Every predicate reaches
    the parquet scan (PushedFilters on shipdate/discount/quantity), the
    projection prunes to three columns, and the single global sum combines
    map-side — the canonical no-shuffle query."""
    li = read_table(spark, sf_dir, "lineitem")
    rev = (_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(22,8)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(_sum_double(rev).alias("revenue"))
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH co AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey)
    SELECT c_count, count(*) AS custdist
    FROM co GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with an extra join-side predicate
    (customers with zero qualifying orders must survive with c_count = 0),
    then a histogram over the per-customer counts. count(o_orderkey) counts
    only matched rows — the outer-join-aware aggregate. Two shuffles: the
    outer join on custkey, the tiny histogram groupBy."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem's distinct (part, supplier) pairs stand in
    for partsupp — this schema ships none). NOT IN over a never-NULL key
    becomes a broadcast ANTI join against the small excluded-supplier set;
    the part filter broadcasts into the pair frame; count(DISTINCT) is the
    only wide shuffle."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    bad_supp = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(bad_supp),
            pairs.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pl AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#5'),
    thr AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE)
                   / count(*) * 0.2 AS t
        FROM pl GROUP BY 1)
    SELECT CAST(CAST(ROUND(SUM(
               CAST(pl.l_extendedprice AS DECIMAL(12,4))), 6)
           AS DECIMAL(18,6)) AS DOUBLE) / 7.0 AS avg_yearly
    FROM pl JOIN thr ON pl.l_partkey = thr.l_partkey
    WHERE pl.l_quantity < thr.t
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part AVG subquery, decorrelated the
    Spark way — aggregate per l_partkey once, join the threshold back
    (aggregate-then-join beats a correlated rescan at any scale). The
    threshold is an exact decimal sum over integer-valued quantities cast to
    DOUBLE at the end, so the < comparison is bit-identical in both engines."""
    part = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    li = read_table(spark, sf_dir, "lineitem")
    pl = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = pl.groupBy("l_partkey").agg(
        (
            F.sum(_dec("l_quantity")).cast("double")
            / F.count("*") * F.lit(0.2)
        ).alias("t")
    )
    joined = pl.join(thr, "l_partkey").filter(F.col("l_quantity") < F.col("t"))
    return joined.agg(
        (_sum_double(_dec("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {_sql_sum_double(_SQL_DISC_PRICE.format(p="l."))} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs disjunctive predicate across both join
    sides. Catalyst extracts the common single-side conjuncts (brand/size on
    part, quantity range on lineitem) as pushed pre-join filters, then
    applies the residual disjunction after the broadcast join — the plan
    scans a fraction of each table instead of evaluating the OR row-by-row
    on the full join."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(_sum_double(_disc_price()).alias("revenue"))


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (sole-blamed supplier: returnflag 'R' stands in for
    the missing receipt/commit dates). The two correlated EXISTS become ONE
    per-order aggregate instead of two lineitem self-joins:
    supp_cnt >= 2 ⇔ "another supplier exists on the order", and
    r_supp_cnt = 1 with l1 itself flagged 'R' ⇔ "no OTHER supplier has 'R'".
    One extra shuffle on l_orderkey replaces two semi/anti self-shuffles of
    the biggest table — the decorrelation you want at 100 TB."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = read_table(spark, sf_dir, "supplier")
    # two-level aggregate instead of two COUNT(DISTINCT)s: a pair of
    # distincts over one group compiles to an Expand (doubling every
    # lineitem row before the shuffle); (orderkey, suppkey) partial agg
    # then a count per orderkey computes the same without row expansion
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "__has_r"
        )
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count("*").alias("__supp_cnt"),
        F.sum("__has_r").alias("__r_supp_cnt"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    blamed = (
        l1.join(per_order, "l_orderkey")
        .filter((F.col("__supp_cnt") >= 2) & (F.col("__r_supp_cnt") == 1))
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
    )
    return (
        blamed.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
        SELECT c_custkey, CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
               c_acctbal
        FROM customer WHERE c_nationkey % 10 IN (0, 3, 5, 7)),
    avgbal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   / count(*) AS a
        FROM eligible WHERE c_acctbal > 0.0)
    SELECT e.cntrycode,
           count(*) AS numcust,
           CAST(CAST(ROUND(SUM(CAST(e.c_acctbal AS DECIMAL(12,2))), 6)
                AS DECIMAL(18,6)) AS DOUBLE) AS totacctbal
    FROM eligible e, avgbal
    WHERE e.c_acctbal > avgbal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.c_custkey)
    GROUP BY e.cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey mod 10 stands in for the missing phone
    country code): scalar AVG subquery broadcast as a cross-joined literal
    frame, NOT EXISTS as a LEFT ANTI join against orders. The average is an
    exact decimal sum divided double-side so the > cut is bit-identical in
    both engines; the anti join shuffles on custkey (orders is pre-projected
    to the join key only)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    eligible = cust.filter((F.col("c_nationkey") % 10).isin(0, 3, 5, 7)).select(
        "c_custkey",
        (F.col("c_nationkey") % 10).cast("long").alias("cntrycode"),
        "c_acctbal",
    )
    avgbal = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
            / F.count("*")
        ).alias("__a")
    )
    return (
        eligible.crossJoin(F.broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("__a"))
        .join(orders, eligible.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            _sum_double(F.col("c_acctbal").cast("decimal(12,2)")).alias(
                "totacctbal"
            ),
        )
    )


@register(
    "histogram_order_totals",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
           50000.0 * floor(o_totalprice / 50000.0) AS bin_lo,
           count(*) AS n,
           CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 6)
                AS DECIMAL(18,6)) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width numeric histogram (profiling family): bin id computed as
    a projection so the aggregation is an ordinary groupBy with map-side
    partial combine — one shuffle whose cardinality is #bins, not #rows.
    The per-bin decimal sum stays exact in both engines."""
    orders = read_table(spark, sf_dir, "orders")
    bin_id = F.floor(F.col("o_totalprice") / F.lit(50000.0))
    return (
        orders.withColumn("bin", bin_id.cast("long"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            _sum_double(F.col("o_totalprice").cast("decimal(12,2)")).alias(
                "total"
            ),
        )
        .select(
            "bin",
            (F.lit(50000.0) * F.col("bin")).alias("bin_lo"),
            "n",
            "total",
        )
    )


@register(
    "pivot_user_event_counts",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS error
    FROM events
    GROUP BY user_id
    """,
)
def pivot_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user event counts, one column per event type.
    The category list is pinned, so Spark skips the extra distinct-values
    job and the pivot compiles to conditional aggregates — exactly the
    oracle's CASE sums, one shuffle."""
    ev = read_table(spark, sf_dir, "events")
    kinds = ["click", "purchase", "signup", "view", "error"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for absent combos; the oracle's CASE sums yield 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).cast("long").alias(k) for k in kinds],
    )


@register(
    "q8_national_market_share",
    oracle=f"""
    WITH alln AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {_SQL_DISC_PRICE.format(p="l.")} AS volume,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
    SELECT o_year,
           {_sql_sum_double(
               "CASE WHEN supp_nation = 'NATION_3' THEN volume "
               "ELSE CAST(0 AS DECIMAL(22,8)) END")}
           / {_sql_sum_double("volume")} AS mkt_share
    FROM alln GROUP BY o_year
    """,
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-table star join, per-year share of one supplier
    nation in a region's volume. Every dimension broadcasts (part is
    type-filtered first); the two fact tables shuffle once on orderkey; the
    share is a conditional-sum / sum ratio of exact decimals."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    n1 = read_table(spark, sf_dir, "nation")
    n2 = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    nat_vol = F.when(
        F.col("supp_nation") == "NATION_3", _disc_price()
    ).otherwise(F.lit(0).cast("decimal(22,8)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            (_sum_double(nat_vol) / _sum_double(_disc_price())).alias(
                "mkt_share"
            )
        )
    )


_SQL_COST01 = (
    "CAST(CAST(CAST(p.p_retailprice AS DECIMAL(12,4)) * "
    "CAST(l.l_quantity AS DECIMAL(12,4)) AS DECIMAL(22,8)) * "
    "CAST(0.1 AS DECIMAL(3,2)) AS DECIMAL(26,10))"
)


@register(
    "q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           {_sql_sum_double(
               "CAST(" + _SQL_DISC_PRICE.format(p="l.")
               + " - " + _SQL_COST01 + " AS DECIMAL(30,12))")}
               AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (this schema has no partsupp/supplycost, so cost is
    proxied as 10% of p_retailprice per unit): profit by supplier nation and
    order year for parts matching a name pattern. The LIKE filter prunes
    part before its broadcast; decimal widths capped stepwise exactly like
    the charge expression."""
    p = read_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    cost = (
        (_dec("p_retailprice") * _dec("l_quantity")).cast("decimal(22,8)")
        * F.lit(0.1).cast("decimal(3,2)")
    ).cast("decimal(26,10)")
    profit = (_disc_price() - cost).cast("decimal(30,12)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            profit.alias("__p"),
        )
        .groupBy("nation", "o_year")
        .agg(_sum_double(F.col("__p")).alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    oracle=f"""
    WITH v AS (
        SELECT l.l_partkey, {_SQL_DISC_PRICE.format(p="l.")} AS val
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2')),
    g AS (
        SELECT l_partkey, {_sql_sum_double("val")} AS part_value
        FROM v GROUP BY l_partkey),
    t AS (SELECT {_sql_sum_double("val")} AS total FROM v)
    SELECT g.l_partkey AS p_partkey, g.part_value
    FROM g, t WHERE g.part_value > 0.001 * t.total
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (lineitem value over two supplier nations stands in
    for partsupp stock value): per-part value HAVING > fraction of the
    grand total — the grand total is a 1-row broadcast, never a re-scan.
    Both sums are exact decimals surfaced as identical doubles, so the
    threshold cut picks the same parts in both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_partkey", _disc_price().alias("__val"))
    )
    g = v.groupBy("l_partkey").agg(_sum_double(F.col("__val")).alias("part_value"))
    t = v.agg(_sum_double(F.col("__val")).alias("__total"))
    return (
        g.crossJoin(F.broadcast(t))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("__total"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, {_sql_sum_double(_SQL_DISC_PRICE.format(p=""))}
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey),
    m AS (SELECT max(total_revenue) AS mr FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM rev r JOIN m ON r.total_revenue = m.mr
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, return the top
    one(s) via max-scalar equality (not LIMIT 1 — ties must all surface).
    The max is a 1-row broadcast against the already-aggregated revenue
    frame; supplier broadcasts into the tiny result."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        _sum_double(_disc_price()).alias("total_revenue")
    )
    m = rev.agg(F.max("total_revenue").alias("__mr"))
    return (
        rev.crossJoin(F.broadcast(m))
        .filter(F.col("total_revenue") == F.col("__mr"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "cube_order_revenue",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) AS g_priority,
           GROUPING(o_orderstatus) AS g_status,
           count(*) AS n,
           CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 6)
                AS DECIMAL(18,6)) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def cube_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all four grouping sets in one pass —
    Spark expands to a single Expand + one shuffle, not four scans), with
    GROUPING() markers so total/subtotal rows are distinguishable from
    genuine NULL dimension values."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus").agg(
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
            _sum_double(F.col("o_totalprice").cast("decimal(12,2)")).alias(
                "revenue"
            ),
        )
    )


@register(
    "median_order_price_by_priority",
    oracle="""
    WITH r AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS cnt
        FROM orders)
    SELECT o_orderpriority, o_totalprice AS median_price
    FROM r WHERE rn = (cnt + 1) // 2
    """,
)
def median_order_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median by rank selection (lower middle, ties broken
    on the key): pure sort + pick, ZERO floating-point arithmetic, so both
    engines select the identical row. One shuffle on the group key. For
    approximate quantiles at scale see approx_stats_lineitem
    (percentile_approx); this is the exact twin."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    cnt = Window.partitionBy("o_orderpriority")
    return (
        orders.withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count("*").over(cnt))
        .filter(F.col("__rn") == F.floor((F.col("__cnt") + 1) / 2))
        .select("o_orderpriority", F.col("o_totalprice").alias("median_price"))
    )


@register(
    "funnel_click_purchase",
    oracle="""
    WITH fc AS (
        SELECT user_id, min(ts) AS first_click
        FROM events WHERE event_type = 'click' GROUP BY user_id),
    conv AS (
        SELECT e.user_id, min(e.ts) AS first_purchase
        FROM events e JOIN fc ON e.user_id = fc.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= fc.first_click
          AND e.ts <= fc.first_click + INTERVAL 7 DAY
        GROUP BY e.user_id)
    SELECT fc.user_id,
           epoch_us(fc.first_click) AS first_click_us,
           epoch_us(conv.first_purchase) AS first_purchase_us,
           (conv.user_id IS NOT NULL) AS converted
    FROM fc LEFT JOIN conv ON fc.user_id = conv.user_id
    """,
)
def funnel_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage funnel: first click per user, then first purchase within 7
    days of it. Aggregate-then-join both stages (each stage is one groupBy
    on user_id; the stage-2 join reuses the same key partitioning — no
    extra exchange under co-partitioned AQE). LEFT join keeps
    non-converters with NULL purchase."""
    ev = read_table(spark, sf_dir, "events")
    fc = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        fc.join(purchases, fc.user_id == F.col("p_user"))
        .filter(
            (F.col("p_ts") >= F.col("first_click"))
            & (F.col("p_ts") <= F.col("first_click") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("first_purchase"))
        .select(F.col("user_id").alias("c_user"), "first_purchase")
    )
    return (
        fc.join(conv, fc.user_id == F.col("c_user"), "left")
        .select(
            "user_id",
            F.unix_micros("first_click").alias("first_click_us"),
            F.unix_micros("first_purchase").alias("first_purchase_us"),
            F.col("c_user").isNotNull().alias("converted"),
        )
    )


@register(
    "retention_cohorts_weekly",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id,
               date_trunc('week', e.ts) AS active_week
        FROM events e)
    SELECT CAST(f.cohort_week AS DATE) AS cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) // 7
                AS BIGINT) AS week_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, counted
    in each later week they were active. first-seen is one groupBy; the
    distinct user-week activity is computed BEFORE the join so the join
    input is already collapsed (distinct-then-join, not join-then-distinct
    — the order that survives 100×)."""
    ev = read_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.col("cohort_week").cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@register(
    "session_window_events",
    oracle="""
    WITH gaps AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM gaps)
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` aggregation — Spark's built-in gap-based
    sessionizer (merges event windows [ts, ts+gap) that overlap; an event
    exactly ``gap`` later starts a NEW session, hence the oracle's >=). The
    same expression works on a stream with a watermark, where the manual
    lag+cumsum twin (sessionize_events) cannot — windows close when the
    watermark passes session end. One shuffle on the session key."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "ntile_documents_by_length",
    oracle="""
    SELECT doc_id, n_chars,
           ntile(4) OVER (ORDER BY n_chars, doc_id) AS size_quartile
    FROM documents
    """,
)
def ntile_documents_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartile assignment (corpus size-striation for curation
    mixes): deterministic because the order carries the doc_id tie-break.
    NOT a global window (that plans Exchange SinglePartition — one task
    sorts the corpus): ``operators/rank.py:ntile_exact`` computes the exact
    same bucketing from a range-partitioned two-phase global rank, so the
    sort parallelizes like Spark's own orderBy while staying bit-identical
    to ``ntile(4) OVER (ORDER BY n_chars, doc_id)``."""
    from pipelinewise_spark.operators.rank import ntile_exact

    d = read_table(spark, sf_dir, "documents")
    return ntile_exact(
        d.select("doc_id", "n_chars"),
        ["n_chars", "doc_id"],
        4,
        out_col="size_quartile",
    )


@register(
    "monthly_revenue_moving_avg",
    oracle="""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders GROUP BY 1)
    SELECT CAST(month AS DATE) AS month,
           CAST(CAST(ROUND(rev, 6) AS DECIMAL(18,6)) AS DOUBLE) AS revenue,
           CAST(CAST(ROUND(SUM(rev) OVER (
                    ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                6) AS DECIMAL(18,6)) AS DOUBLE)
           / least(CAST(row_number() OVER (ORDER BY month) AS BIGINT), 3)
               AS moving_avg_3m
    FROM m
    """,
)
def monthly_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series rollup + trailing window: monthly revenue and its
    3-month moving average. The moving sum runs over DECIMAL monthly
    totals (exact regardless of frame evaluation order) and divides by the
    actual frame size, so the leading partial windows are true averages.
    The window is over ~dozens of month rows — driver-scale after the
    groupBy, no skew concern."""
    from pyspark.sql import Window

    orders = read_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("__month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("__rev"))
    w = Window.orderBy("__month").rowsBetween(-2, 0)
    rn = Window.orderBy("__month")
    return m.select(
        F.col("__month").cast("date").alias("month"),
        F.round(F.col("__rev"), 6).cast("decimal(18,6)").cast("double").alias(
            "revenue"
        ),
        (
            F.round(F.sum("__rev").over(w), 6)
            .cast("decimal(18,6)")
            .cast("double")
            / F.least(F.row_number().over(rn).cast("long"), F.lit(3))
        ).alias("moving_avg_3m"),
    )


@register(
    "gap_fill_daily_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 6)
                    AS DECIMAL(18,6)) AS DOUBLE) AS rev
        FROM orders WHERE o_orderkey % 13 = 0 GROUP BY 1),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
            AS day
        FROM b),
    j AS (SELECT s.day, d.rev FROM spine s LEFT JOIN daily d USING (day))
    SELECT day,
           coalesce(rev, 0.0) AS revenue,
           last_value(rev IGNORE NULLS) OVER (
               ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS revenue_locf,
           rev IS NULL AS was_gap
    FROM j
    """,
)
def gap_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a sparse daily revenue series (orders
    sampled 1-in-13 so gaps are guaranteed) is completed onto a full
    day spine — zero-fill AND last-observation-carried-forward columns,
    plus the gap marker. The spine generates from a broadcast 1-row
    bounds aggregate; the LOCF window runs over the AGGREGATED series
    (days between min and max — answer-scale, thousands of rows for
    decades — never the corpus), the standard shape for resampling a
    100 TB event table: aggregate first, window the series."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 13 == 0
    )
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 6)
        .cast("decimal(18,6)").cast("double").alias("rev")
    )
    bounds = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    j = spine.join(daily, "day", "left")
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return j.select(
        "day",
        F.coalesce(F.col("rev"), F.lit(0.0)).alias("revenue"),
        F.last("rev", ignorenulls=True).over(w).alias("revenue_locf"),
        F.col("rev").isNull().alias("was_gap"),
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) AS g_priority,
           GROUPING(o_orderstatus) AS g_status,
           count(*) AS n,
           CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 6)
                AS DECIMAL(18,6)) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form under ROLLUP/CUBE
    (both already covered): three chosen grains (per-priority,
    per-status, grand total) in ONE pass — Spark expands to a single
    Expand node + one shuffle, never three scans. GROUPING() markers
    keep subtotal rows distinguishable from genuine NULLs. At 100 TB
    this is the difference between one corpus read and one per grain."""
    orders = read_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gs_orders")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               count(*) AS n,
               CAST(CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 6)
                    AS DECIMAL(18,6)) AS DOUBLE) AS revenue
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """)


@register(
    "unpivot_order_measures",
    oracle="""
    SELECT o_orderkey, measure, value
    FROM (
        SELECT o_orderkey,
               o_totalprice AS totalprice,
               CAST(o_custkey AS DOUBLE) AS custkey_d,
               CAST(o_orderkey % 100 AS DOUBLE) AS bucket_d
        FROM orders)
    UNPIVOT (value FOR measure IN (totalprice, custkey_d, bucket_d))
    """,
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (wide→long, the inverse of
    pivot_user_event_counts): three measure columns unpivot to
    (key, measure, value) rows via Spark's native ``unpivot`` — one
    narrow projection per row expanded JVM-side (an Expand node, no
    shuffle at all), the shape feature stores and metric pipelines
    feed on. The oracle is DuckDB's UNPIVOT of the same projection."""
    orders = read_table(spark, sf_dir, "orders")
    wide = orders.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey_d"),
        (F.col("o_orderkey") % 100).cast("double").alias("bucket_d"),
    )
    return wide.unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey_d", "bucket_d"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "hierarchy_rollup_parts",
    oracle="""
    WITH RECURSIVE anc AS (
        SELECT p_partkey AS id, p_partkey AS root_id, CAST(0 AS BIGINT) AS depth
        FROM part WHERE p_partkey < 8
        UNION ALL
        SELECT c.p_partkey, a.root_id, a.depth + 1
        FROM part c JOIN anc a ON c.p_partkey // 8 = a.id AND c.p_partkey >= 8)
    SELECT a.root_id,
           count(*) AS n_nodes,
           max(a.depth) AS max_depth,
           CAST(CAST(ROUND(SUM(CAST(p.p_retailprice AS DECIMAL(12,2))), 6)
                AS DECIMAL(18,6)) AS DOUBLE) AS subtree_value
    FROM anc a JOIN part p ON p.p_partkey = a.id
    GROUP BY a.root_id
    """,
)
def hierarchy_rollup_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE replacement: flatten a parent-pointer hierarchy (a
    deterministic forest over part — ``parent = p_partkey DIV 8``, roots
    below 8) to (node → root, depth) with pointer jumping, then roll the
    subtree value up per root.  The closure costs ceil(log2 depth)
    self-joins — NOT depth joins — so a 20-level dimension tree is 5
    rounds; the oracle is DuckDB's native WITH RECURSIVE over the same
    forest.  Decimal-exact subtree sums per the module convention."""
    from pipelinewise_spark.operators.hierarchy import (
        resolve_hierarchy,
        rollup_by_root,
    )

    part = read_table(spark, sf_dir, "part")
    nodes = part.select(
        "p_partkey",
        F.when(
            F.col("p_partkey") >= 8, F.expr("p_partkey DIV 8")
        ).alias("parent"),
        F.col("p_retailprice").cast("decimal(12,2)").alias("val"),
    )
    resolved = resolve_hierarchy(nodes, "p_partkey", "parent")
    return rollup_by_root(nodes, resolved, "p_partkey", "val").select(
        "root_id",
        F.col("n_nodes"),
        "max_depth",
        F.round(F.col("subtree_value"), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("subtree_value"),
    )


@register(
    "part_pairs_cooccurrence",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    tot AS (SELECT count(DISTINCT b) AS n_baskets FROM baskets),
    supports AS (
        SELECT i, count(*) AS nb FROM baskets GROUP BY i
        HAVING count(*) >= 10),
    pruned AS (SELECT b.b, b.i FROM baskets b JOIN supports s USING (i)),
    pairs AS (
        SELECT x.i AS item_a, y.i AS item_b, count(*) AS pair_baskets
        FROM pruned x JOIN pruned y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2 HAVING count(*) >= 3)
    SELECT p.item_a, p.item_b, p.pair_baskets,
           fa.nb AS baskets_a, fb.nb AS baskets_b, t.n_baskets,
           CAST(FLOOR(1000000.0 * p.pair_baskets * t.n_baskets
                      / (fa.nb * fb.nb)) AS BIGINT) AS lift_ppm
    FROM pairs p
    JOIN supports fa ON fa.i = p.item_a
    JOIN supports fb ON fb.i = p.item_b
    CROSS JOIN tot t
    """,
)
def part_pairs_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining: frequent part pairs across orders with lift.
    Apriori level-1 pruning (items under support 10 drop via a broadcast
    semi-join BEFORE the pair self-join) bounds the b^2 basket blow-up;
    pair generation is one shuffle on the basket key, counting one on the
    pair.  Lift is emitted as an integer ppm (floor) so the hash is
    immune to round-half conventions."""
    from pipelinewise_spark.functions.basket import cooccurrence_pairs

    li = read_table(spark, sf_dir, "lineitem")
    pairs = cooccurrence_pairs(
        li,
        "l_orderkey",
        "l_partkey",
        min_item_support=10,
        min_pair_support=3,
    )
    return pairs.select(
        "item_a",
        "item_b",
        "pair_baskets",
        "baskets_a",
        "baskets_b",
        "n_baskets",
        F.floor(
            F.lit(1000000.0)
            * F.col("pair_baskets")
            * F.col("n_baskets")
            / (F.col("baskets_a") * F.col("baskets_b"))
        ).alias("lift_ppm"),
    )


@register(
    "ohlc_daily_events",
    oracle="""
    WITH ranked AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS bar_date,
               value,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events)
    SELECT event_type, bar_date,
           min(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           min(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS n_events,
           CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 6)
                AS DECIMAL(18,6)) AS DOUBLE) AS total_value
    FROM ranked GROUP BY 1, 2
    """,
)
def ohlc_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to OHLC bars (the hypertable /
    continuous-aggregate shape): per (event_type, day), open/close are
    ``min_by``/``max_by`` on the (ts, event_id) key — ONE partial-aggregable
    shuffle, no window sort, no row_number materialization (the oracle
    needs two window passes for the same answer).  open/high/low/close are
    untouched doubles (no arithmetic → bit-exact both engines); the volume
    sum is decimal-exact per the module convention."""
    ev = read_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("bar_date"),
        )
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").alias("n_events"),
            _sum_double(F.col("value").cast("decimal(12,2)")).alias(
                "total_value"
            ),
        )
    )


@register(
    "triangle_count_parts",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    e AS (
        SELECT x.i AS u, y.i AS v
        FROM baskets x JOIN baskets y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2 HAVING count(*) >= 2),
    nodes AS (
        SELECT count(DISTINCT n) AS n_nodes
        FROM (SELECT u AS n FROM e UNION SELECT v FROM e)),
    tri AS (
        SELECT count(*) AS n_triangles
        FROM e a
        JOIN e b ON b.u = a.u AND b.v > a.v
        JOIN e c ON c.u = a.v AND c.v = b.v)
    SELECT n.n_nodes, (SELECT count(*) FROM e) AS n_edges, t.n_triangles
    FROM nodes n CROSS JOIN tri t
    """,
)
def triangle_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the co-purchase graph (parts appearing in
    >=2 common orders).  The operator orients edges low→high (degree, id)
    before wedge generation — each triangle closes at exactly one apex and
    hub wedge fan-out is bounded by O(sqrt m) (functions/graph.py); the
    oracle is the textbook 3-way self-join on canonical edges, the shape
    the orientation exists to avoid at scale."""
    from pipelinewise_spark.functions.graph import triangle_count

    li = read_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("b"), F.col("l_partkey").alias("i")
    ).distinct()
    left = baskets.select("b", F.col("i").alias("pu"))
    right = baskets.select("b", F.col("i").alias("pv"))
    edges = (
        left.join(right, "b")
        .filter(F.col("pu") < F.col("pv"))
        .groupBy("pu", "pv")
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") >= 2)
    )
    return triangle_count(edges, "pu", "pv")


@register(
    "ewma_daily_events",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS bar_date,
               CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 6)
                    AS DECIMAL(18,6)) AS DOUBLE) AS daily_total
        FROM events GROUP BY 1, 2),
    seq AS (
        SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY bar_date) AS rn
        FROM daily),
    ew AS (
        SELECT event_type, bar_date, daily_total, rn,
               daily_total AS ewma
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.bar_date, s.daily_total, s.rn,
               CAST(0.3 AS DOUBLE) * s.daily_total
                   + CAST(0.7 AS DOUBLE) * e.ewma
        FROM seq s JOIN ew e
          ON s.event_type = e.event_type AND s.rn = e.rn + 1)
    SELECT event_type, bar_date, daily_total, ewma FROM ew
    """,
)
def ewma_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over daily event volume —
    the genuinely sequential per-key fold (y = 0.3x + 0.7y') that plain
    window functions cannot express.  Daily totals are a decimal-exact
    shuffle aggregate; the fold runs per event_type inside ONE
    ``applyInPandas`` pass (Arrow-batched, series-at-a-time — each key's
    series is bar-sized, keys parallelize across executors).  The oracle
    is a recursive CTE stepping the identical double arithmetic, so
    values hash-compare bit-exactly with no rounding of the EWMA itself."""
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("bar_date"),
    ).agg(
        _sum_double(F.col("value").cast("decimal(12,2)")).alias("daily_total")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bar_date").reset_index(drop=True)
        out = []
        y = None
        for x in pdf["daily_total"]:
            # same expression and order as the oracle's recursive step
            y = x if y is None else 0.3 * x + 0.7 * y
            out.append(y)
        pdf["ewma"] = out
        return pdf

    return daily.groupBy("event_type").applyInPandas(
        fold,
        "event_type string, bar_date date, daily_total double, ewma double",
    )


@register(
    "chi2_priority_status",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority AS p, o_orderstatus AS s,
               CAST(count(*) AS DOUBLE) AS c
        FROM orders GROUP BY 1, 2),
    m AS (
        SELECT p, s, c,
               SUM(c) OVER (PARTITION BY p) AS rp,
               SUM(c) OVER (PARTITION BY s) AS cs,
               SUM(c) OVER () AS t
        FROM cells)
    SELECT count(*) AS n_cells,
           CAST((count(DISTINCT p) - 1) * (count(DISTINCT s) - 1)
                AS BIGINT) AS dof,
           ROUND(SUM(pow(c - rp * cs / t, 2) / (rp * cs / t)), 6) AS chi2
    FROM m
    """,
)
def chi2_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order priority and status —
    the contingency table is ONE count shuffle (answer-sized: |priorities|
    × |statuses| cells); marginals and the statistic are window/broadcast
    arithmetic over those cells, never a second pass over the fact table.
    The 6-decimal round absorbs summation-order ulps in the final
    (answer-sized) reduction."""
    orders = read_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("p"), F.col("o_orderstatus").alias("s")
    ).agg(F.count("*").cast("double").alias("c"))
    from pyspark.sql import Window

    m = cells.select(
        "p",
        "s",
        "c",
        F.sum("c").over(Window.partitionBy("p")).alias("rp"),
        F.sum("c").over(Window.partitionBy("s")).alias("cs"),
        F.sum("c").over(Window.partitionBy()).alias("t"),
    )
    exp = F.col("rp") * F.col("cs") / F.col("t")
    return m.agg(
        F.count("*").alias("n_cells"),
        (
            (F.count_distinct("p") - 1) * (F.count_distinct("s") - 1)
        ).cast("long").alias("dof"),
        F.round(F.sum(F.pow(F.col("c") - exp, 2) / exp), 6).alias("chi2"),
    )


def _pagerank_oracle(iterations: int = 5) -> str:
    """Unrolled power-iteration oracle — standard SQL forbids aggregation
    in a recursive CTE member, so a FIXED iteration count unrolls into a
    CTE chain (r0..rN), mirroring the Spark loop term-for-term (same
    double expressions, same order; only the per-node summation order
    differs, absorbed by the final 9-decimal round)."""
    steps = []
    prev = "r0"
    for k in range(1, iterations + 1):
        steps.append(f"""
    r{k} AS (
        SELECT nd.node,
               (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.cnt
                   + CAST(0.85 AS DOUBLE)
                     * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS rank
        FROM nodes nd CROSS JOIN n nn
        LEFT JOIN (
            SELECT e.t AS node, sum(r.rank / od.deg) AS contrib
            FROM e2 e
            JOIN {prev} r ON r.node = e.s
            JOIN outdeg od ON od.node = e.s
            GROUP BY e.t) c ON c.node = nd.node)""")
        prev = f"r{k}"
    return f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    eu AS (
        SELECT x.i AS u, y.i AS v
        FROM baskets x JOIN baskets y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2 HAVING count(*) >= 2),
    e2 AS (SELECT u AS s, v AS t FROM eu
           UNION ALL SELECT v, u FROM eu),
    outdeg AS (SELECT s AS node, count(*) AS deg FROM e2 GROUP BY s),
    nodes AS (SELECT DISTINCT s AS node FROM e2),
    n AS (SELECT count(*) AS cnt FROM nodes),
    r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / cnt AS rank
           FROM nodes CROSS JOIN n),{",".join(steps)}
    SELECT node, ROUND(rank, 9) AS rank FROM {prev}
    """


@register("pagerank_copurchase_parts", oracle=_pagerank_oracle())
def pagerank_copurchase_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the undirected co-purchase graph (parts
    sharing >=2 orders), 5 fixed power iterations, damping 0.85.  Each
    iteration is one edge-keyed shuffle join + one dst aggregate with the
    lineage cut per step (functions/graph.py:pagerank); symmetrized edges
    mean no dangling-mass correction is needed.  The oracle unrolls the
    identical arithmetic into a 5-step CTE chain."""
    from pipelinewise_spark.functions.graph import pagerank

    li = read_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("b"), F.col("l_partkey").alias("i")
    ).distinct()
    left = baskets.select("b", F.col("i").alias("pu"))
    right = baskets.select("b", F.col("i").alias("pv"))
    edges = (
        left.join(right, "b")
        .filter(F.col("pu") < F.col("pv"))
        .groupBy("pu", "pv")
        .agg(F.count("*").alias("nb"))
        .filter(F.col("nb") >= 2)
    )
    ranks = pagerank(edges, "pu", "pv", iterations=5, damping=0.85)
    return ranks.select("node", F.round("rank", 9).alias("rank"))


@register(
    "regression_price_by_brand",
    oracle="""
    SELECT p.p_brand,
           regr_count(l.l_extendedprice, l.l_quantity) AS n,
           ROUND(regr_slope(l.l_extendedprice, l.l_quantity), 4) AS slope,
           ROUND(regr_intercept(l.l_extendedprice, l.l_quantity), 4)
               AS intercept,
           ROUND(regr_r2(l.l_extendedprice, l.l_quantity), 6) AS r2,
           ROUND(corr(l.l_extendedprice, l.l_quantity), 6) AS corr
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    """,
)
def regression_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped OLS — the SQL regr_* family, engine-native: per brand,
    regress line price on quantity (slope ≈ mean unit price, so the fit
    is meaningful, r2 high).  Spark 4's regr_slope/intercept/r2/corr are
    JVM-side partial-aggregable moments: ONE broadcast dim join + ONE
    shuffle of brand-sized moment partials — never a second pass, never
    a sort.  Moment accumulation order differs between engines, so
    outputs round (4dp for the unbounded slope/intercept, 6dp for the
    bounded r2/corr)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.regr_count("l_extendedprice", "l_quantity").alias("n"),
            F.round(
                F.regr_slope("l_extendedprice", "l_quantity"), 4
            ).alias("slope"),
            F.round(
                F.regr_intercept("l_extendedprice", "l_quantity"), 4
            ).alias("intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias(
                "r2"
            ),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias(
                "corr"
            ),
        )
    )


@register(
    "window_functions_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume_dist,
           first_value(o_totalprice) OVER w AS min_price,
           nth_value(o_totalprice, 3) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS third_price,
           last_value(o_totalprice) OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING) AS max_price
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth in one pass: lag/lead, percent_rank,
    cume_dist, first/nth/last value over an explicit full frame — all
    seven collapse into ONE physical Window node (same partition+order;
    Catalyst merges across frame variants — plan-pinned in
    tests/test_plans_r7c.py): one shuffle on the partition key, one
    per-partition sort.  percent_rank/cume_dist are exact rational
    doubles (identical division both engines — no rounding needed); the
    (price, key) order is total, so every output is deterministic."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
        F.first("o_totalprice").over(w).alias("min_price"),
        F.nth_value("o_totalprice", 3).over(wf).alias("third_price"),
        F.last("o_totalprice").over(wf).alias("max_price"),
    )


@register(
    "item_recommendations_parts",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
    tot AS (SELECT count(DISTINCT b) AS n FROM baskets),
    supports AS (
        SELECT i, count(*) AS nb FROM baskets GROUP BY i
        HAVING count(*) >= 10),
    pruned AS (SELECT b.b, b.i FROM baskets b JOIN supports s USING (i)),
    pairs AS (
        SELECT x.i AS item_a, y.i AS item_b, count(*) AS pair_baskets
        FROM pruned x JOIN pruned y ON x.b = y.b AND x.i < y.i
        GROUP BY 1, 2 HAVING count(*) >= 3),
    sym AS (
        SELECT item_a AS item, item_b AS rec, pair_baskets FROM pairs
        UNION ALL
        SELECT item_b, item_a, pair_baskets FROM pairs),
    scored AS (
        SELECT s.item, s.rec, s.pair_baskets,
               CAST(FLOOR(1000000.0 * s.pair_baskets * t.n
                          / (fa.nb * fb.nb)) AS BIGINT) AS lift_ppm
        FROM sym s
        JOIN supports fa ON fa.i = s.item
        JOIN supports fb ON fb.i = s.rec
        CROSS JOIN tot t),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY item
                   ORDER BY lift_ppm DESC, pair_baskets DESC, rec) AS rnk
        FROM scored)
    SELECT item, rec, pair_baskets, lift_ppm, rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def item_recommendations_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item collaborative filtering ("customers also bought"):
    symmetrize the Apriori-pruned co-occurrence pairs, score by lift,
    keep each item's top 3 by a deterministic (lift, support, id) order.
    The ranking window partitions by item over the PAIR table — already
    support-pruned and answer-sized, so the window sort never sees raw
    baskets.  The whole pipeline reuses `functions/basket.py`; at scale
    this is the batch-precompute side of a recommendation serving
    store."""
    from pyspark.sql import Window

    from pipelinewise_spark.functions.basket import cooccurrence_pairs

    li = read_table(spark, sf_dir, "lineitem")
    pairs = cooccurrence_pairs(
        li, "l_orderkey", "l_partkey", min_item_support=10, min_pair_support=3
    ).select(
        "item_a",
        "item_b",
        "pair_baskets",
        "baskets_a",
        "baskets_b",
        "n_baskets",
        F.floor(
            F.lit(1000000.0)
            * F.col("pair_baskets")
            * F.col("n_baskets")
            / (F.col("baskets_a") * F.col("baskets_b"))
        ).alias("lift_ppm"),
    )
    sym = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("rec"),
        "pair_baskets",
        "lift_ppm",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("rec"),
            "pair_baskets",
            "lift_ppm",
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("lift_ppm").desc(), F.col("pair_baskets").desc(), F.col("rec")
    )
    return (
        sym.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("item", "rec", "pair_baskets", "lift_ppm", "rnk")
    )


@register(
    "key_skew_report_events",
    oracle="""
    WITH per_key AS (
        SELECT event_type, user_id, count(*) AS c
        FROM events GROUP BY 1, 2),
    ranked AS (
        SELECT event_type, c,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY c, user_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS k,
               SUM(c) OVER (PARTITION BY event_type) AS total
        FROM per_key)
    SELECT event_type,
           CAST(max(k) AS BIGINT) AS n_keys,
           CAST(max(total) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CASE WHEN rn > k - 10 THEN c ELSE 0 END) AS DOUBLE)
                 / max(total), 6) AS top10_share,
           ROUND(CAST(2 * SUM(CAST(rn AS DECIMAL(18,0)) * c) AS DOUBLE)
                 / (CAST(max(k) AS DOUBLE) * CAST(max(total) AS DOUBLE))
                 - CAST(max(k) + 1 AS DOUBLE) / max(k), 6) AS gini
    FROM ranked GROUP BY event_type
    """,
)
def key_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic — the report you run BEFORE choosing a
    salting factor: per event_type, the key count, row count, top-10-key
    mass share, and the Gini coefficient of the per-key distribution
    (0 = uniform, →1 = one hot key), via the exact sorted-rank identity
    G = 2·Σ(r·c)/(k·Σc) − (k+1)/k.  The windows run over the PRE-REDUCED
    per-key counts (one map-side-combinable groupBy collapses raw rows
    first), so the diagnostic is itself skew-safe — the hot key that
    motivates the report reduces to one row before any sort."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    per_key = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("c")
    )
    wt = Window.partitionBy("event_type")
    ranked = per_key.select(
        "event_type",
        "c",
        F.row_number()
        .over(wt.orderBy(F.col("c"), F.col("user_id")))
        .alias("rn"),
        F.count("*").over(wt).alias("k"),
        F.sum("c").over(wt).alias("total"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("k").cast("long").alias("n_keys"),
        F.max("total").cast("long").alias("n_rows"),
        F.round(
            F.sum(
                F.when(F.col("rn") > F.col("k") - 10, F.col("c")).otherwise(
                    F.lit(0)
                )
            ).cast("double")
            / F.max("total"),
            6,
        ).alias("top10_share"),
        # exact-decimal rank-mass sum: Σ rn·c reaches ~k·Σc (≈1e20 at
        # 100 TB group sizes) — an int64 accumulator overflows (ANSI
        # throws); DECIMAL(38) holds it exactly in both engines
        F.round(
            (2 * F.sum(F.col("rn").cast("decimal(18,0)") * F.col("c")))
            .cast("double")
            / (F.max("k").cast("double") * F.max("total").cast("double"))
            - (F.max("k") + 1).cast("double") / F.max("k"),
            6,
        ).alias("gini"),
    )


@register(
    "rolling_7day_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', o_orderdate) AS DATE))
                   AS day_num,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders GROUP BY 1, 2)
    SELECT day,
           CAST(CAST(ROUND(rev, 6) AS DECIMAL(18,6)) AS DOUBLE) AS revenue,
           CAST(CAST(ROUND(SUM(rev) OVER (
                    ORDER BY day_num
                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
                6) AS DECIMAL(18,6)) AS DOUBLE) AS rolling_7d
    FROM daily
    """,
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-interval aggregation with a RANGE frame — the window
    family's gap vs ROWS frames (monthly_revenue_moving_avg): a 7-day
    trailing sum must include exactly the CALENDAR window, skipping
    nothing and double-counting nothing when days are missing, which a
    ROWS BETWEEN 6 PRECEDING frame gets wrong on sparse dates.  The
    frame keys on epoch-day ints (identical in both engines);
    revenue sums are exact decimal.  The global-order window runs over
    the PRE-REDUCED daily table — answer-sized (one row per calendar
    day), the documented small-frame exception to the
    no-SinglePartition rule."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"))
    daily = daily.withColumn(
        "day_num", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day",
        F.round(F.col("rev"), 6).cast("decimal(18,6)").cast("double").alias(
            "revenue"
        ),
        F.round(F.sum("rev").over(w), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("rolling_7d"),
    )


@register(
    "sliding_window_event_counts",
    oracle="""
    WITH k AS (SELECT unnest(range(4)) AS i),
    assigned AS (
        SELECT e.event_type, e.value,
               CAST(to_timestamp(floor(epoch(e.ts) / 900) * 900
                                 - k.i * 900) AS TIMESTAMP)
                   AS window_start
        FROM events e CROSS JOIN k
        WHERE CAST(to_timestamp(floor(epoch(e.ts) / 900) * 900
                                - k.i * 900) AS TIMESTAMP)
              > e.ts - INTERVAL 1 HOUR)
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6)
                AS DECIMAL(18,6)) AS DOUBLE) AS value_sum
    FROM assigned GROUP BY 1, 2, 3
    """,
)
def sliding_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (1 h duration, 15 min slide) — the
    overlapping-window streaming shape tumbling windows
    (windowed_event_counts) can't express: every event lands in
    duration/slide = 4 windows.  Spark's `window(ts, '1 hour',
    '15 minutes')` does the 4-way assignment JVM-side inside the
    aggregate (an Expand node — no self-join, no UDF); the same
    expression runs streaming with a watermark.  The oracle reproduces
    the window arithmetic with an explicit range(4) cross join —
    window_start = floor(ts/slide)·slide − i·slide, kept while
    start > ts − duration — the textbook definition Spark implements."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


@register(
    "holt_forecast_daily_events",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(date_trunc('day', ts) AS DATE) AS bar_date,
               CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 6)
                    AS DECIMAL(18,6)) AS DOUBLE) AS daily_total
        FROM events GROUP BY 1, 2),
    seq AS (
        SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY bar_date) AS rn
        FROM daily),
    h AS (
        SELECT event_type, bar_date, daily_total, rn,
               daily_total AS level, CAST(0 AS DOUBLE) AS trend
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.bar_date, s.daily_total, s.rn,
               CAST(0.5 AS DOUBLE) * s.daily_total
                   + CAST(0.5 AS DOUBLE) * (h.level + h.trend),
               CAST(0.3 AS DOUBLE)
                   * ((CAST(0.5 AS DOUBLE) * s.daily_total
                       + CAST(0.5 AS DOUBLE) * (h.level + h.trend))
                      - h.level)
                   + CAST(0.7 AS DOUBLE) * h.trend
        FROM seq s JOIN h ON s.event_type = h.event_type
                         AND s.rn = h.rn + 1)
    SELECT event_type, bar_date, daily_total, level, trend,
           level + trend AS forecast_next
    FROM h
    """,
)
def holt_forecast_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecasting (double exponential smoothing) over
    daily event volume — the EWMA fold extended with a trend state:
    l = 0.5x + 0.5(l' + b'), b = 0.3(l − l') + 0.7b', one-step-ahead
    forecast l + b. Init: level = first observation, trend = 0. Same
    scale shape as ewma_daily_events: one decimal-exact shuffle aggregate
    builds the date-cardinality-bounded series, then the genuinely
    sequential per-key fold runs series-at-a-time inside ONE
    applyInPandas pass (keys parallelize across executors). The oracle
    steps the IDENTICAL double arithmetic in a recursive CTE, so level /
    trend / forecast hash-compare bit-exactly with no rounding."""
    import pandas as pd

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("bar_date"),
    ).agg(
        _sum_double(F.col("value").cast("decimal(12,2)")).alias("daily_total")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bar_date").reset_index(drop=True)
        levels, trends = [], []
        lv, tr = None, 0.0
        for x in pdf["daily_total"]:
            if lv is None:
                lv, tr = x, 0.0
            else:
                # identical expression and evaluation order as the
                # oracle's recursive step
                new_lv = 0.5 * x + 0.5 * (lv + tr)
                tr = 0.3 * (new_lv - lv) + 0.7 * tr
                lv = new_lv
            levels.append(lv)
            trends.append(tr)
        pdf["level"] = levels
        pdf["trend"] = trends
        pdf["forecast_next"] = [l + t for l, t in zip(levels, trends)]
        return pdf

    return daily.groupBy("event_type").applyInPandas(
        fold,
        "event_type string, bar_date date, daily_total double, "
        "level double, trend double, forecast_next double",
    )


@register(
    "mann_whitney_acctbal_segments",
    oracle="""
    WITH c AS (
        SELECT c_acctbal AS v, c_mktsegment AS seg
        FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
    r AS (
        SELECT v, seg,
               rank() OVER (ORDER BY v) AS rmin,
               count(*) OVER (PARTITION BY v) AS cv
        FROM c),
    agg AS (
        SELECT CAST(SUM(CASE WHEN seg = 'BUILDING'
                             THEN 2 * rmin + cv - 1 ELSE 0 END) AS BIGINT)
                   AS r1_2,
               CAST(COUNT(*) FILTER (WHERE seg = 'BUILDING') AS BIGINT)
                   AS n_a,
               CAST(COUNT(*) FILTER (WHERE seg = 'MACHINERY') AS BIGINT)
                   AS n_b
        FROM r)
    SELECT n_a, n_b,
           (r1_2 - n_a * (n_a + 1)) / 2.0 AS u_a,
           CAST(n_a AS DOUBLE) * n_b - (r1_2 - n_a * (n_a + 1)) / 2.0 AS u_b,
           ROUND(((r1_2 - n_a * (n_a + 1)) / 2.0) / (CAST(n_a AS DOUBLE) * n_b), 6)
               AS effect_a
    FROM agg
    """,
)
def mann_whitney_acctbal_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing account-balance
    distributions between two customer segments — the nonparametric A/B
    test, next to chi-square (categorical) and OLS (linear) in the
    statistical family. EXACT by construction: tie-averaged ranks stay in
    integer space doubled (2·rank_min + ties − 1), so the rank-sum and
    both U statistics are integer-exact (halves at worst) and the
    common-language effect size is one deterministic IEEE division,
    rounded 6 dp. Scale shape: ONE distributed range-partitioned rank
    (operators/rank.py — no SinglePartition) + one per-value groupBy; the
    final fold is a 1-row aggregate."""
    from pipelinewise_spark.operators.rank import _ranked

    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).select(
        F.col("c_acctbal").alias("v"),
        F.col("c_mktsegment").alias("seg"),
        "c_custkey",
    )
    ranked, _ = _ranked(c, ["v", "c_custkey"], "__rn", None)
    # per distinct value: min global row_number == rank() (ties share it),
    # tie count, and the A-side count; all integer
    per_v = ranked.groupBy("v").agg(
        F.min("__rn").alias("rmin"),
        F.count("*").alias("cv"),
        F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0)).alias(
            "cnt_a"
        ),
    )
    agg = per_v.agg(
        F.sum(
            F.col("cnt_a") * (2 * F.col("rmin") + F.col("cv") - 1)
        ).alias("r1_2"),
        F.sum("cnt_a").alias("n_a"),
        F.sum(F.col("cv") - F.col("cnt_a")).alias("n_b"),
    )
    u_a = (F.col("r1_2") - F.col("n_a") * (F.col("n_a") + 1)) / 2.0
    return agg.select(
        "n_a",
        "n_b",
        u_a.alias("u_a"),
        (F.col("n_a").cast("double") * F.col("n_b") - u_a).alias("u_b"),
        F.round(
            u_a / (F.col("n_a").cast("double") * F.col("n_b")), 6
        ).alias("effect_a"),
    )


@register(
    "ks_test_price_priorities",
    oracle="""
    WITH s AS (
        SELECT o_totalprice AS v,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    pv AS (
        SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
               CAST(COUNT(*) - SUM(a) AS BIGINT) AS cb
        FROM s GROUP BY v),
    cum AS (
        SELECT v,
               SUM(ca) OVER (ORDER BY v) AS cum_a,
               SUM(cb) OVER (ORDER BY v) AS cum_b
        FROM pv),
    n AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb FROM pv),
    d AS (SELECT MAX(ABS(cum_a * nb - cum_b * na)) AS d2 FROM cum, n)
    SELECT n.na AS n_a, n.nb AS n_b,
           CAST(FLOOR(1000000 * d.d2 / (n.na * n.nb)) AS BIGINT) AS d_ppm,
           (d.d2 / (CAST(n.na AS DOUBLE) * n.nb))
             > 1.358 * sqrt((n.na + n.nb) / (CAST(n.na AS DOUBLE) * n.nb))
               AS significant
    FROM d, n
    """,
)
def ks_test_price_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov comparing order-price distributions
    between URGENT and LOW priorities — the bin-free complement to the
    bucketed TVD drift monitor and the third nonparametric in the family
    (chi-square: categorical; Mann-Whitney: location; KS: whole-CDF
    shape). EXACT: the sup-distance stays in integer cross-multiplied
    space (max |cumA·nB − cumB·nA|) with one trailing division, and the
    alpha=0.05 significance compare is literal-coefficient IEEE
    arithmetic (sqrt is correctly rounded — deterministic both engines).
    Scale shape: one map-side-combinable per-value aggregate, then
    running counts over the DISTINCT-VALUE table via the two-phase
    distributed prefix sum (functions/curation.py:group_prefix_sum — no
    SinglePartition window), then a 1-row max fold."""
    from pipelinewise_spark.functions.curation import group_prefix_sum

    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    s = o.select(
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("a"),
    )
    pv = s.groupBy("v").agg(
        F.sum("a").cast("long").alias("ca"),
        (F.count("*") - F.sum("a")).cast("long").alias("cb"),
    ).withColumn("__g", F.lit(0))
    cum = group_prefix_sum(pv, ["__g"], ["v"], "ca", out_col="cum_a")
    cum = group_prefix_sum(cum, ["__g"], ["v"], "cb", out_col="cum_b")
    n = pv.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    # cross-multiplied sup-distance in decimal(38,0) (the DuckDB twin's
    # SUM-OVER/HUGEINT space): plain LongType wraps silently in non-ANSI
    # Spark once cum·n or 1e6·d2 passes 2^63 (~3M rows per side)
    dec = "decimal(38,0)"
    d = (
        cum.crossJoin(F.broadcast(n))
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a").cast(dec) * F.col("nb")
                    - F.col("cum_b").cast(dec) * F.col("na")
                )
            ).alias("d2"),
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
        )
    )
    na, nb = F.col("na").cast("double"), F.col("nb")
    return d.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.floor(
            F.lit(1_000_000).cast(dec) * F.col("d2")
            / (F.col("na").cast(dec) * F.col("nb"))
        )
        .cast("long")
        .alias("d_ppm"),
        (
            F.col("d2").cast("double") / (na * nb)
            > 1.358 * F.sqrt((F.col("na") + F.col("nb")) / (na * nb))
        ).alias("significant"),
    )


@register(
    "event_transitions_events",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events),
    c AS (
        SELECT event_type AS prev_state, next_type AS next_state,
               CAST(count(*) AS BIGINT) AS n
        FROM s WHERE next_type IS NOT NULL
        GROUP BY 1, 2),
    t AS (SELECT prev_state, SUM(n) AS total FROM c GROUP BY 1)
    SELECT c.prev_state, c.next_state, c.n,
           CAST(FLOOR(1000000.0 * c.n / t.total) AS BIGINT) AS p_ppm
    FROM c JOIN t USING (prev_state)
    """,
)
def event_transitions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the replicated event
    stream (operators/transitions.py): per (prev, next) event-type pair
    across consecutive events of the same user (ordered by ts, event_id),
    the count and the integer-ppm share of the prev-state's outgoing
    edges. One entity-keyed window exchange + one map-side-combinable
    matrix aggregate; totals join broadcast (states^2 rows)."""
    from pipelinewise_spark.operators.transitions import transition_matrix

    ev = read_table(spark, sf_dir, "events")
    return transition_matrix(
        ev, "user_id", "event_type", ["ts", "event_id"]
    )


@register(
    "frequent_event_paths",
    oracle="""
    WITH s AS (
        SELECT event_type,
               lead(event_type, 1) OVER w AS s2,
               lead(event_type, 2) OVER w AS s3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    p AS (
        SELECT event_type || '>' || s2 || '>' || s3 AS path
        FROM s WHERE event_type IS NOT NULL
          AND s2 IS NOT NULL AND s3 IS NOT NULL),
    c AS (
        SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM p GROUP BY 1)
    SELECT path, n_occurrences,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, path)
                AS BIGINT) AS rank
    FROM c
    QUALIFY rank <= 20
    """,
)
def frequent_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journeys (operators/transitions.py:
    frequent_paths) — the n-gram generalization of the transition
    matrix: per-user consecutive event-type trigrams (ordered by ts,
    event_id), counted corpus-wide. The n-1 lead() columns ride ONE
    entity-keyed window exchange; the final rank window runs on the
    aggregated path table (states^n rows — answer-sized)."""
    from pipelinewise_spark.operators.transitions import frequent_paths

    ev = read_table(spark, sf_dir, "events")
    return frequent_paths(
        ev, "user_id", "event_type", ["ts", "event_id"], n=3, topk=20
    )
