"""Relational core (SURVEY.md §2 B/C/G4/H/I) as oracle-checked queries.

These exercise the engine spine — scan → filter → project → join → aggregate →
window → sort — on the TPC-H-ish fixture tables. Design-for-scale notes:

- Filters use literal predicates on scan columns so Catalyst pushes them into
  the parquet reader (check ``PushedFilters`` in ``.explain("formatted")``).
- Sums over doubles go through :func:`dsum` (decimal-cast) so results are
  order-independent — mandatory for reproducibility on a 1000-executor
  cluster AND for the DuckDB oracle value-hash to match.
- Small dims (nation/region) are broadcast explicitly; fact-fact joins are
  left to AQE, which converts to broadcast or splits skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.coercion import dsum
from ..functions.scalars import extract_plate, sql_extract_plate, us_date_string
from ..operators.joins import asof_join, range_join
from ..sources.tables import load_table


# --------------------------------------------------------------------------
# H1-style aggregation: pricing summary (flagship; reference's groupby-agg
# shape, Main.py:259-261 / 284-288, at TPC-H Q1 scale).
# --------------------------------------------------------------------------
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), 2).alias("sum_qty"),
            dsum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            F.round(dsum(F.col("l_quantity"), 2) / F.count("*"), 2).alias("avg_qty"),
            F.round(dsum(F.col("l_extendedprice"), 2) / F.count("*"), 2).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*), 2) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*), 2) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# 5-way star join + aggregation (the "explicit join" the reference never had,
# SURVEY.md §2 I; dims broadcast — zero shuffle for the dim side at any SF).
# --------------------------------------------------------------------------
def _revenue_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared 5-way star join for the revenue family (by-nation / rollup /
    cube): lineitem→orders→customer→broadcast(nation)→broadcast(region).
    ONE construction site — a join-key or broadcast-hint change must not
    need three lockstep edits."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )


REVENUE_STAR_FROM_SQL = """FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _revenue_star(spark, sf_dir)
        .groupBy("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


REVENUE_BY_NATION_SQL = f"""
SELECT r_name,
       n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
{REVENUE_STAR_FROM_SQL}
GROUP BY r_name, n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# Top-k by aggregate (SURVEY.md §2 I "limits/top-k" gap — reference's only
# top-1 is the fuzzy extractOne; here the general operator).
# --------------------------------------------------------------------------
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey,
       c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# H2/H4 percentage-of-total pattern: reference computes denominators as a
# separate scalar aggregate (Main.py:262-263, 289-290). The Spark shape is a
# broadcast scalar denominator over the (tiny) grouped frame — NOT a
# ``sum() over ()`` window, which funnels the frame through one partition
# (WindowExec "No Partition Defined") and invites copy-paste onto big
# frames. The denominator subtree repeats the groupBy, but it's the SAME
# exchange, so Spark's ReuseExchange evaluates the scan+aggregate once.
# --------------------------------------------------------------------------
def order_priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))
    total = counts.agg(F.sum("n_orders").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("pct", F.round(F.col("n_orders") * 100.0 / F.col("__total"), 2))
        .drop("__total")
        .orderBy("o_orderpriority")
    )


# dialect-portable: CAST to DOUBLE because Spark SQL types the 100.0
# literal as DECIMAL while DuckDB uses DOUBLE
ORDER_PRIORITY_SHARE_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(CAST(COUNT(*) AS DOUBLE) * 100 / SUM(COUNT(*)) OVER (), 2) AS pct
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# SQL-surface demo: the same dialect-portable SQL string runs through
# spark.sql AND serves as the DuckDB oracle — the engine's spark.sql
# entry point is a first-class query surface, not just the DataFrame API.
# --------------------------------------------------------------------------
def priority_share_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(ORDER_PRIORITY_SHARE_SQL)


# --------------------------------------------------------------------------
# C2 plate extraction + B5 string scrub on customer (regex digits, lstrip
# zeros, 'No Plate' default — Main.py:392-397 semantics on c_name).
# --------------------------------------------------------------------------
def customer_plates(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        F.col("c_custkey"),
        extract_plate(F.col("c_name")).alias("plate"),
        F.coalesce(F.col("c_mktsegment").cast("string"), F.lit("")).alias("segment"),
        F.round(F.col("c_acctbal"), 2).alias("acctbal"),
    )


CUSTOMER_PLATES_SQL = f"""
SELECT c_custkey,
       {sql_extract_plate("c_name")} AS plate,
       COALESCE(CAST(c_mktsegment AS VARCHAR), '') AS segment,
       ROUND(c_acctbal, 2) AS acctbal
FROM customer
"""


# --------------------------------------------------------------------------
# C3 US-style date string (no zero padding, Main.py:399-402) + B4 timestamp.
# --------------------------------------------------------------------------
def orders_us_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey"),
        us_date_string(F.col("o_orderdate")).alias("order_date_us"),
        F.round(F.col("o_totalprice"), 2).alias("total_price"),
    )


ORDERS_US_DATES_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderdate IS NOT NULL
            THEN CAST(month(o_orderdate) AS VARCHAR) || '/' ||
                 CAST(day(o_orderdate) AS VARCHAR) || '/' ||
                 CAST(year(o_orderdate) AS VARCHAR)
            ELSE '' END AS order_date_us,
       ROUND(o_totalprice, 2) AS total_price
FROM orders
"""


# --------------------------------------------------------------------------
# G4 unpivot/melt (reference's df.melt, Main.py:273-277) on lineitem measures.
# --------------------------------------------------------------------------
def lineitem_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count("*").alias("n_values"),
            dsum(F.col("value"), 6).alias("total"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
        .orderBy("measure")
    )


LINEITEM_UNPIVOT_SQL = """
WITH long AS (
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
)
SELECT measure,
       COUNT(*) AS n_values,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total,
       ROUND(MIN(value), 6) AS min_value,
       ROUND(MAX(value), 6) AS max_value
FROM long
GROUP BY measure
ORDER BY measure
"""


# --------------------------------------------------------------------------
# Rollup / grouping sets (SURVEY.md §2 I — absent in the reference, free in
# Spark): region→nation revenue with subtotals and a grand total.
# --------------------------------------------------------------------------
def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _revenue_star(spark, sf_dir)
        .rollup("r_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"))
    )


REVENUE_ROLLUP_SQL = f"""
SELECT r_name,
       n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
{REVENUE_STAR_FROM_SQL}
GROUP BY ROLLUP(r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
"""


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE sibling of revenue_rollup (SURVEY.md §2 I grouping-sets
    completeness): all four grouping sets — (region, nation), region-only,
    nation-only, grand total — in ONE pass with map-side partials;
    grouping_id disambiguates aggregated-away NULLs from data NULLs."""
    return (
        _revenue_star(spark, sf_dir)
        .cube("r_name", "n_name")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.asc_nulls_first("r_name"), F.asc_nulls_first("n_name"), "gid")
    )


REVENUE_CUBE_SQL = f"""
SELECT r_name,
       n_name,
       CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
{REVENUE_STAR_FROM_SQL}
GROUP BY CUBE(r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST, gid
"""


# --------------------------------------------------------------------------
# Anti / semi joins (SURVEY.md §2 I set-op gap): customers with no orders,
# and suppliers that do appear in lineitem. Anti/semi express as one join
# with no duplication — the shapes NOT EXISTS / IN compile to.
# --------------------------------------------------------------------------
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders after 2000-01-01 (the bare
    no-orders set is empty in the fixture; the date predicate makes the
    anti-join path carry real rows)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-01-01'
)
ORDER BY c_custkey
"""


def active_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        supplier.join(li, supplier.s_suppkey == li.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


ACTIVE_SUPPLIERS_SQL = """
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# As-of (point-in-time) join: every event gets the latest "rate" in effect
# at its timestamp. Rates are derived deterministically from orders and
# mapped into the events' time range (o_orderkey % 720 hours into Jan 2024)
# so the match genuinely varies per event; duplicate (user, ts) rates are
# pre-reduced to the max-orderkey row, making the result exact in both
# engines (DuckDB mirrors with a native ASOF LEFT JOIN).
# --------------------------------------------------------------------------
def events_asof_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    orders = load_table(spark, sf_dir, "orders")
    rate_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
        + (F.col("o_orderkey") % 720) * 3600
    )
    rates0 = orders.select(
        (F.col("o_custkey") % 150).alias("user_id"),
        rate_ts.alias("rate_ts"),
        "o_orderkey",
        "o_totalprice",
    )
    w = Window.partitionBy("user_id", "rate_ts").orderBy(F.desc("o_orderkey"))
    rates = (
        rates0.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "rate_ts",
            F.col("o_orderkey").alias("rate_id"),
            F.round("o_totalprice", 2).alias("rate_price"),
        )
    )
    joined = asof_join(
        ev, rates, key="user_id", left_ts="ts", right_ts="rate_ts",
        payload_cols=["rate_id", "rate_price"],
    )
    return joined.select(
        "event_id", "user_id", "event_type", "rate_id", "rate_price"
    ).orderBy("event_id")


EVENTS_ASOF_RATES_SQL = """
WITH rates0 AS (
    SELECT o_custkey % 150 AS user_id,
           TIMESTAMP '2024-01-01' + (o_orderkey % 720) * INTERVAL 1 HOUR AS rate_ts,
           o_orderkey,
           o_totalprice,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey % 150,
                            TIMESTAMP '2024-01-01' + (o_orderkey % 720) * INTERVAL 1 HOUR
               ORDER BY o_orderkey DESC) AS rn
    FROM orders
),
rates AS (
    SELECT user_id, rate_ts, o_orderkey AS rate_id, ROUND(o_totalprice, 2) AS rate_price
    FROM rates0 WHERE rn = 1
)
SELECT e.event_id, e.user_id, e.event_type, r.rate_id, r.rate_price
FROM events e
ASOF LEFT JOIN rates r ON e.user_id = r.user_id AND e.ts >= r.rate_ts
ORDER BY e.event_id
"""


# --------------------------------------------------------------------------
# Range (interval) join: per purchase, how many click/view events the same
# user produced in the preceding 2 hours — the attribution-window query.
# The BETWEEN theta-join is executed as a binned equi-join
# (operators/joins.range_join), never a nested loop; DuckDB mirrors the
# predicate directly.
# --------------------------------------------------------------------------
def events_attribution_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("w_start"),
    )
    points = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "ts", "event_type"
    )
    matched = range_join(
        points,
        purchases,
        on=["user_id"],
        point_ts="ts",
        start_ts="w_start",
        end_ts="p_ts",
        bin_seconds=7200,
    )
    counts = matched.groupBy("purchase_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_clicks"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n_views"),
    )
    return (
        purchases.join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
        )
        .orderBy("purchase_id")
    )


EVENTS_ATTRIBUTION_RANGE_SQL = """
WITH purchases AS (
    SELECT event_id AS purchase_id, user_id, ts
    FROM events WHERE event_type = 'purchase'
),
prior AS (
    SELECT p.purchase_id,
           SUM(CASE WHEN e.event_type = 'click' THEN 1 ELSE 0 END) AS n_clicks,
           SUM(CASE WHEN e.event_type = 'view' THEN 1 ELSE 0 END) AS n_views
    FROM purchases p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts - INTERVAL 2 HOUR
     AND e.ts < p.ts
     AND e.event_type IN ('click', 'view')
    GROUP BY p.purchase_id
)
SELECT p.purchase_id, p.user_id,
       CAST(COALESCE(n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(COALESCE(n_views, 0) AS BIGINT) AS n_views
FROM purchases p LEFT JOIN prior USING (purchase_id)
ORDER BY p.purchase_id
"""


QUERIES = {
    "customers_without_orders": customers_without_orders,
    "active_suppliers": active_suppliers,
    "pricing_summary": pricing_summary,
    "revenue_rollup": revenue_rollup,
    "revenue_cube": revenue_cube,
    "revenue_by_nation": revenue_by_nation,
    "top_customers": top_customers,
    "order_priority_share": order_priority_share,
    "priority_share_sql": priority_share_sql,
    "customer_plates": customer_plates,
    "orders_us_dates": orders_us_dates,
    "lineitem_unpivot": lineitem_unpivot,
    "events_asof_rates": events_asof_rates,
    "events_attribution_range": events_attribution_range,
}

ORACLES = {
    "customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "active_suppliers": ACTIVE_SUPPLIERS_SQL,
    "pricing_summary": PRICING_SUMMARY_SQL,
    "revenue_cube": REVENUE_CUBE_SQL,
    "revenue_by_nation": REVENUE_BY_NATION_SQL,
    "top_customers": TOP_CUSTOMERS_SQL,
    "order_priority_share": ORDER_PRIORITY_SHARE_SQL,
    "lineitem_unpivot": LINEITEM_UNPIVOT_SQL,
    "events_asof_rates": EVENTS_ASOF_RATES_SQL,
    "events_attribution_range": EVENTS_ATTRIBUTION_RANGE_SQL,
}

# Oracle-checked by pytest only (tests/test_oracle_parity.py), NOT shipped in
# the driver's 50-entry correctness window: priority_share_sql runs the SAME
# SQL string as order_priority_share through spark.sql, so its driver check
# was a duplicate of an already-green row — demoted to open window headroom
# (VERDICT r4 "Next round" #2) without losing the local hash check.
LOCAL_ORACLES = {
    "priority_share_sql": ORDER_PRIORITY_SHARE_SQL,
    # Demoted round 11 to fund a driver slot for dedup_substring (VERDICT
    # r10 "Next round" #6): CUBE strictly supersets ROLLUP's grouping sets
    # over the same aggregate, so revenue_cube's green driver row already
    # covers every rollup cell; full hash parity still runs in pytest.
    "revenue_rollup": REVENUE_ROLLUP_SQL,
    # Demoted round 13 to fund driver slots for the M-family (VERDICT r12
    # "Next round" #3): both are single-function showcases whose operators
    # run LIVE inside the hash-green trips_master row — Car_Num is the
    # same extract_plate (C2) and date the same us_date_string (C3) over
    # the master corpus — so their driver checks were near-subsets of an
    # already-green row. Full hash parity still runs in pytest.
    "customer_plates": CUSTOMER_PLATES_SQL,
    "orders_us_dates": ORDERS_US_DATES_SQL,
}
