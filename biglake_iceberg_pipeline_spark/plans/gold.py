"""Silver + gold medallion queries on the driver tables.

Parity map (thelook_ecommerce → driver schema): users→customer,
orders→orders, order_items→lineitem, products→part. Each query
mirrors a reference transformation or DEMO.md gold table:

- silver_dedup_events / silver_orders: silver transformations
  (ROW_NUMBER dedup + type standardization + 7-format ts parsing),
  test_data/thelook_ecommerce/silver/transformations/*.sql
- clean_customer: the agent's trim/sentinel/case cleaning applied as a
  silver "users" transform (transformations/users.sql:22-77)
- gold_customer_metrics / gold_product_performance / gold_daily_sales /
  gold_orders_enriched / customer_profiles / cohort_retention:
  DEMO.md §3 (gold builds), §6 (cohort retention), §7 (profiles)
- currency_convert: DEMO.md §4 remote function → broadcast rate join

Scale notes: every dim join (nation/region/rates) is broadcast; fact
aggregations are partial-agg'd map-side; the customer-level rollups
shuffle once on custkey and Catalyst reuses that exchange across the
orders- and lineitem-derived subaggregates where possible. Monetary
sums rounded 2dp, ratios 4dp for cross-engine hash stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.functions.currency import convert_to_usd
from biglake_iceberg_pipeline_spark.functions.numeric import money_round
from biglake_iceberg_pipeline_spark.functions.timestamps import (
    duckdb_parse_multi_format_sql,
    parse_multi_format_ts,
)
from biglake_iceberg_pipeline_spark.operators.cleaning import clean_string
from biglake_iceberg_pipeline_spark.operators.medallion import dedup_latest
from biglake_iceberg_pipeline_spark.sources.catalog import load_table

# Fixed "today" so churn/days-since metrics are deterministic.
REF_DATE = "2002-01-01"


# ---------------------------------------------------------------- silver


def silver_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver-layer dedup: latest event per (user_id, event_type)."""
    ev = load_table(spark, sf_dir, "events")
    return dedup_latest(
        ev, ["user_id", "event_type"], "ts", tiebreak=["event_id"]
    ).select("event_id", "ts", "user_id", "event_type", "value")


SILVER_DEDUP_EVENTS_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC
    ) AS rn
    FROM events
)
WHERE rn = 1
"""


def silver_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver orders: dedup by key, status-code expansion, and the
    reference's multi-format timestamp COALESCE parse chain.

    The raw date is round-tripped through one of three string formats
    (keyed off o_orderkey) to exercise the parser exactly the way the
    reference's dirty CSVs do (generate.py writes 7 date variants).
    """
    o = load_table(spark, sf_dir, "orders")
    fmt = F.col("o_orderkey") % 3
    as_str = (
        F.when(fmt == 0, F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        .when(fmt == 1, F.date_format("o_orderdate", "MM/dd/yyyy HH:mm:ss"))
        .otherwise(F.date_format("o_orderdate", "MMM dd yyyy HH:mm:ss"))
    )
    o = o.withColumn("o_orderdate_raw", as_str)
    o = dedup_latest(o, ["o_orderkey"], "o_orderdate", tiebreak=["o_custkey"])
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderstatus") == "O", "Open")
        .when(F.col("o_orderstatus") == "F", "Finished")
        .when(F.col("o_orderstatus") == "P", "Pending")
        .otherwise(F.initcap(F.lower(F.trim("o_orderstatus"))))
        .alias("status"),
        F.round("o_totalprice", 2).alias("total_price"),
        parse_multi_format_ts("o_orderdate_raw").alias("created_at"),
        F.col("o_orderpriority").alias("priority"),
    )


_PARSE_RAW = duckdb_parse_multi_format_sql("o_orderdate_raw")
SILVER_ORDERS_SQL = f"""
WITH raw AS (
    SELECT *,
        CASE o_orderkey % 3
            WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
            WHEN 1 THEN strftime(o_orderdate, '%m/%d/%Y %H:%M:%S')
            ELSE strftime(o_orderdate, '%b %d %Y %H:%M:%S')
        END AS o_orderdate_raw
    FROM orders
),
dedup AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderkey ORDER BY o_orderdate DESC, o_custkey DESC
    ) AS rn
    FROM raw
)
SELECT
    o_orderkey,
    o_custkey,
    CASE o_orderstatus
        WHEN 'O' THEN 'Open'
        WHEN 'F' THEN 'Finished'
        WHEN 'P' THEN 'Pending'
        ELSE upper(substr(lower(trim(o_orderstatus)), 1, 1))
             || substr(lower(trim(o_orderstatus)), 2)
    END AS status,
    ROUND(o_totalprice, 2) AS total_price,
    {_PARSE_RAW} AS created_at,
    o_orderpriority AS priority
FROM dedup
WHERE rn = 1
"""


def clean_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silver 'users'-style cleaning: trim + sentinel→NULL + case
    normalization (INITCAP segment, lowered name-as-email analogue)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        clean_string("c_name", case=None).alias("name"),
        clean_string("c_name", case="lower").alias("email_key"),
        clean_string("c_mktsegment", case="title").alias("segment"),
        F.col("c_nationkey").alias("nation_key"),
        F.round("c_acctbal", 2).alias("acct_balance"),
    )


# DuckDB 1.0 has no initcap; emulate per-word (single-word segments here).
_DUCK_INITCAP = (
    "array_to_string(list_transform(string_split(lower(trim({x})), ' '), "
    "w -> upper(w[1]) || substr(w, 2)), ' ')"
)
_SENTINELS_SQL = (
    "('null','none','n/a','na','-','--','','#n/a','nan','missing')"
)
CLEAN_CUSTOMER_SQL = f"""
SELECT
    c_custkey,
    CASE WHEN lower(trim(c_name)) IN {_SENTINELS_SQL} THEN NULL
         ELSE trim(c_name) END AS name,
    CASE WHEN lower(trim(c_name)) IN {_SENTINELS_SQL} THEN NULL
         ELSE lower(trim(c_name)) END AS email_key,
    CASE WHEN lower(trim(c_mktsegment)) IN {_SENTINELS_SQL} THEN NULL
         ELSE {_DUCK_INITCAP.format(x='c_mktsegment')} END AS segment,
    c_nationkey AS nation_key,
    ROUND(c_acctbal, 2) AS acct_balance
FROM customer
"""


# ------------------------------------------------------------------ gold


def gold_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO.md §3: lifetime orders, spend, AOV, first/last order,
    return rate, churn flag (>90 days since last order at REF_DATE).

    The returns CTE pre-aggregates lineitem at l_orderkey grain BEFORE
    joining orders (the q21 grain trick, commit 1a498dd): the shuffle
    then carries ~|orders| partially-combined rows (map-side partial
    agg collapses a customer's ~4 lines per order) instead of all of
    |lineitem|, and the big-big join probes |orders|-many rows — the
    shape that survives 100×. r5 quiet-host A/B vs the direct join:
    statistically tied at sf0.1 (best-of-5 0.384 s vs 0.375 s,
    medians 0.400/0.394 — the r4 driver drift was host load), results
    bit-identical; shipped for the scale shape. Counts are exact
    integers, so sum-of-per-order counts == direct counts and the
    DuckDB oracle is unchanged."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    per_cust = orders.groupBy(
        F.col("o_custkey").alias("pc_custkey")
    ).agg(
        F.count(F.lit(1)).alias("lifetime_order_count"),
        money_round(F.sum("o_totalprice"), 2).alias("total_spend"),
        money_round(F.avg("o_totalprice"), 4).alias("avg_order_value"),
        F.min("o_orderdate").alias("first_order_at"),
        F.max("o_orderdate").alias("last_order_at"),
    )
    li_agg = li.groupBy("l_orderkey").agg(
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias(
            "n_returns"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )
    returns = (
        li_agg.join(
            orders.select("o_orderkey", "o_custkey"),
            li_agg.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_custkey").alias("rt_custkey"))
        .agg(
            money_round(
                F.try_divide(F.sum("n_returns"), F.sum("n_lines")), 4
            ).alias("return_rate")
        )
    )
    ref = F.to_date(F.lit(REF_DATE))
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.pc_custkey, "left")
        .join(returns, cust.c_custkey == returns.rt_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("lifetime_order_count", F.lit(0)).alias(
                "lifetime_order_count"
            ),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
            "avg_order_value",
            "first_order_at",
            "last_order_at",
            "return_rate",
            F.datediff(ref, F.to_date("last_order_at")).alias(
                "days_since_last_order"
            ),
            (F.datediff(ref, F.to_date("last_order_at")) > 90).alias(
                "churn_flag"
            ),
        )
    )


GOLD_CUSTOMER_METRICS_SQL = f"""
WITH per_cust AS (
    SELECT
        o_custkey,
        COUNT(*) AS lifetime_order_count,
        floor(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS total_spend,
        floor(AVG(o_totalprice) * 10000.0 + 0.5) / 10000.0
            AS avg_order_value,
        MIN(o_orderdate) AS first_order_at,
        MAX(o_orderdate) AS last_order_at
    FROM orders GROUP BY o_custkey
),
returns AS (
    SELECT
        o_custkey,
        floor(
            COUNT(*) FILTER (WHERE l_returnflag = 'R')
            / NULLIF(COUNT(*), 0)::DOUBLE * 10000.0 + 0.5
        ) / 10000.0 AS return_rate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey
)
SELECT
    c_custkey,
    c_name,
    COALESCE(lifetime_order_count, 0) AS lifetime_order_count,
    COALESCE(total_spend, 0.0) AS total_spend,
    avg_order_value,
    first_order_at,
    last_order_at,
    return_rate,
    datediff('day', CAST(last_order_at AS DATE), DATE '{REF_DATE}')
        AS days_since_last_order,
    datediff('day', CAST(last_order_at AS DATE), DATE '{REF_DATE}') > 90
        AS churn_flag
FROM customer
LEFT JOIN per_cust ON c_custkey = per_cust.o_custkey
LEFT JOIN returns ON c_custkey = returns.o_custkey
"""


def gold_product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO.md §3: units sold, revenue, avg sale price, return rate."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        money_round(F.sum("l_quantity"), 2).alias("units_sold"),
        money_round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue"),
        money_round(F.avg("l_extendedprice"), 4).alias("avg_sale_price"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias(
            "return_count"
        ),
        money_round(
            F.try_divide(
                F.count(F.when(F.col("l_returnflag") == "R", 1)),
                F.count(F.lit(1)),
            ),
            4,
        ).alias("return_rate"),
    )
    return part.join(
        per_part, part.p_partkey == per_part.l_partkey, "left"
    ).select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.coalesce("units_sold", F.lit(0.0)).alias("units_sold"),
        F.coalesce("total_revenue", F.lit(0.0)).alias("total_revenue"),
        "avg_sale_price",
        F.coalesce("return_count", F.lit(0)).alias("return_count"),
        "return_rate",
    )


GOLD_PRODUCT_PERFORMANCE_SQL = """
WITH per_part AS (
    SELECT
        l_partkey,
        floor(SUM(l_quantity) * 100.0 + 0.5) / 100.0 AS units_sold,
        floor(SUM(l_extendedprice * (1 - l_discount)) * 100.0 + 0.5)
            / 100.0 AS total_revenue,
        floor(AVG(l_extendedprice) * 10000.0 + 0.5) / 10000.0
            AS avg_sale_price,
        COUNT(*) FILTER (WHERE l_returnflag = 'R') AS return_count,
        floor(
            COUNT(*) FILTER (WHERE l_returnflag = 'R')
            / NULLIF(COUNT(*), 0)::DOUBLE * 10000.0 + 0.5
        ) / 10000.0 AS return_rate
    FROM lineitem GROUP BY l_partkey
)
SELECT
    p_partkey,
    p_name,
    p_brand,
    COALESCE(units_sold, 0.0) AS units_sold,
    COALESCE(total_revenue, 0.0) AS total_revenue,
    avg_sale_price,
    COALESCE(return_count, 0) AS return_count,
    return_rate
FROM part LEFT JOIN per_part ON p_partkey = l_partkey
"""


def gold_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO.md §3: date-grain fact — orders, revenue, unique + new
    customers, avg basket size (items per order)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sale_date = F.to_date("o_orderdate")

    daily = orders.groupBy(sale_date.alias("sale_date")).agg(
        F.count(F.lit(1)).alias("order_count"),
        F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
        F.countDistinct("o_custkey").alias("unique_customers"),
    )
    firsts = (
        orders.groupBy("o_custkey")
        .agg(F.to_date(F.min("o_orderdate")).alias("first_date"))
        .groupBy(F.col("first_date").alias("sale_date"))
        .agg(F.count(F.lit(1)).alias("new_customers"))
    )
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .groupBy(F.to_date("o_orderdate").alias("sale_date"))
        .agg(F.round(F.avg("n_items"), 4).alias("avg_basket_size"))
    )
    return (
        daily.join(firsts, "sale_date", "left")
        .join(baskets, "sale_date", "left")
        .select(
            "sale_date",
            "order_count",
            "total_revenue",
            "unique_customers",
            F.coalesce("new_customers", F.lit(0)).alias("new_customers"),
            "avg_basket_size",
        )
    )


GOLD_DAILY_SALES_SQL = """
WITH daily AS (
    SELECT
        CAST(o_orderdate AS DATE) AS sale_date,
        COUNT(*) AS order_count,
        ROUND(SUM(o_totalprice), 2) AS total_revenue,
        COUNT(DISTINCT o_custkey) AS unique_customers
    FROM orders GROUP BY 1
),
firsts AS (
    SELECT first_date AS sale_date, COUNT(*) AS new_customers
    FROM (
        SELECT o_custkey, CAST(MIN(o_orderdate) AS DATE) AS first_date
        FROM orders GROUP BY o_custkey
    ) GROUP BY 1
),
baskets AS (
    SELECT
        CAST(o_orderdate AS DATE) AS sale_date,
        ROUND(AVG(n_items), 4) AS avg_basket_size
    FROM (
        SELECT l_orderkey, COUNT(*) AS n_items
        FROM lineitem GROUP BY l_orderkey
    ) items
    JOIN orders ON items.l_orderkey = o_orderkey
    GROUP BY 1
)
SELECT
    daily.sale_date,
    order_count,
    total_revenue,
    unique_customers,
    COALESCE(new_customers, 0) AS new_customers,
    avg_basket_size
FROM daily
LEFT JOIN firsts USING (sale_date)
LEFT JOIN baskets USING (sale_date)
"""


def gold_orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO.md gold.orders_enriched: orders × customer demographics ×
    nation/region dims (all dims broadcast)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_orderstatus").alias("status"),
            F.round("o_totalprice", 2).alias("total_price"),
            "c_custkey",
            "c_name",
            F.col("c_mktsegment").alias("segment"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


GOLD_ORDERS_ENRICHED_SQL = """
SELECT
    o_orderkey,
    CAST(o_orderdate AS DATE) AS order_date,
    o_orderstatus AS status,
    ROUND(o_totalprice, 2) AS total_price,
    c_custkey,
    c_name,
    c_mktsegment AS segment,
    n_name AS nation,
    r_name AS region
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


def currency_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO.md §4: price normalization to USD. Currency is derived
    deterministically from the key (the driver tables carry no currency
    column); conversion itself is the broadcast rate join."""
    orders = load_table(spark, sf_dir, "orders")
    currency = (
        F.when(F.col("o_orderkey") % 4 == 0, "USD")
        .when(F.col("o_orderkey") % 4 == 1, "EUR")
        .when(F.col("o_orderkey") % 4 == 2, "GBP")
        .otherwise("JPY")
    )
    df = orders.withColumn("price_currency", currency)
    out = convert_to_usd(spark, df, "o_totalprice", "price_currency")
    return out.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("total_price"),
        "price_currency",
        F.col("o_totalprice_usd").alias("total_price_usd"),
    )


CURRENCY_CONVERT_SQL = """
SELECT
    o_orderkey,
    ROUND(o_totalprice, 2) AS total_price,
    CASE o_orderkey % 4
        WHEN 0 THEN 'USD' WHEN 1 THEN 'EUR' WHEN 2 THEN 'GBP' ELSE 'JPY'
    END AS price_currency,
    floor(o_totalprice * CASE o_orderkey % 4
        WHEN 0 THEN 1.0 WHEN 1 THEN 1.08 WHEN 2 THEN 1.26 ELSE 0.0067
    END * 100.0 + 0.5) / 100.0 AS total_price_usd
FROM orders
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO.md §6: monthly signup cohorts × months-since-first-order
    retention counts."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    joined = orders.join(firsts, "o_custkey").select(
        "o_custkey",
        F.to_date("cohort_month").alias("cohort_month"),
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"),
    )
    return (
        joined.withColumn(
            "month_offset",
            F.round(
                F.months_between("order_month", "cohort_month"), 0
            ).cast("int"),
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.countDistinct("o_custkey").alias("retained_customers"))
    )


COHORT_RETENTION_SQL = """
WITH firsts AS (
    SELECT o_custkey,
           CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort_month
    FROM orders GROUP BY o_custkey
)
SELECT
    cohort_month,
    datediff('month', cohort_month,
             CAST(date_trunc('month', o_orderdate) AS DATE)) AS month_offset,
    COUNT(DISTINCT o_custkey) AS retained_customers
FROM orders JOIN firsts USING (o_custkey)
GROUP BY 1, 2
"""


def _order_metrics(orders: DataFrame) -> DataFrame:
    """Per-customer order rollup feeding the behavior summary."""
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("spend"),
        F.avg("o_totalprice").alias("aov"),
        F.max("o_orderdate").alias("last_order"),
    )


def behavior_summary_expr():
    """Summary-text expression over (n_orders, spend, last_order)
    columns — shared by the full profiles build and the lookalike
    target's key-filtered lookup so both produce byte-identical text.

    Money formatting must be bit-deterministic across engines: derive
    cents via explicit IEEE ops (round half-up by floor(x+0.5)) instead
    of each engine's ROUND, whose half-boundary behavior differs."""
    churned = (
        F.datediff(F.to_date(F.lit(REF_DATE)), F.to_date("last_order")) > 90
    )
    spend_r = F.round("spend", 2)
    aov = F.floor(spend_r * 100 / F.col("n_orders") + 0.5) / 100.0
    return F.concat(
        F.lit("Customer with "),
        F.col("n_orders").cast("string"),
        F.lit(" orders, total spend $"),
        F.format_string("%.2f", spend_r),
        F.lit(", avg order $"),
        F.format_string("%.2f", aov),
        F.lit(", "),
        F.when(churned, "churned").otherwise("active"),
    )


def customer_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO.md §7: behavior-summary text per customer (embedding input
    for lookalike search). DECIMAL casts keep number formatting
    identical across engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    m = _order_metrics(orders)
    return (
        cust.join(m, cust.c_custkey == m.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            behavior_summary_expr().alias("behavior_summary"),
        )
    )


CUSTOMER_PROFILES_SQL = f"""
SELECT
    c_custkey,
    c_name,
    'Customer with ' || CAST(n_orders AS VARCHAR)
        || ' orders, total spend $'
        || printf('%.2f', ROUND(spend, 2))
        || ', avg order $'
        || printf('%.2f', floor(ROUND(spend, 2) * 100 / n_orders + 0.5) / 100.0)
        || ', '
        || CASE WHEN datediff('day', CAST(last_order AS DATE),
                              DATE '{REF_DATE}') > 90
                THEN 'churned' ELSE 'active' END
    AS behavior_summary
FROM customer
JOIN (
    SELECT o_custkey, COUNT(*) AS n_orders, SUM(o_totalprice) AS spend,
           AVG(o_totalprice) AS aov, MAX(o_orderdate) AS last_order
    FROM orders GROUP BY o_custkey
) m ON c_custkey = m.o_custkey
"""


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (gold-layer marketing rollup): quartile-score
    customers on Recency / Frequency / Monetary, report segment sizes.

    Quartiles are ntile(4) over a TOTAL deterministic order (metric,
    then custkey) — integer bucketing, no float boundary comparisons,
    so the DuckDB oracle lands on identical buckets. The ranking
    window runs on the customer-grained aggregate (3 global ntiles),
    fine up to ~100 M customers; past that swap ntile for
    approx_percentile boundary bucketing (documented scale path) —
    the fact-table pass (one shuffle on custkey) is unchanged."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    r_w = Window.orderBy(F.desc("last_order"), F.asc("o_custkey"))
    f_w = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    m_w = Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))
    scored = per_cust.select(
        F.ntile(4).over(r_w).alias("r_score"),
        F.ntile(4).over(f_w).alias("f_score"),
        F.ntile(4).over(m_w).alias("m_score"),
        "monetary",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("monetary"), 2).alias("segment_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


RFM_SEGMENTS_SQL = """
WITH per_cust AS (
    SELECT o_custkey, MAX(o_orderdate) AS last_order,
           COUNT(*) AS frequency,
           ROUND(SUM(o_totalprice), 2) AS monetary
    FROM orders GROUP BY o_custkey
),
scored AS (
    SELECT
        ntile(4) OVER (ORDER BY last_order DESC, o_custkey ASC) AS r_score,
        ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
        ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_score,
        monetary
    FROM per_cust
)
SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
       ROUND(SUM(monetary), 2) AS segment_value
FROM scored
GROUP BY r_score, f_score, m_score
ORDER BY r_score, f_score, m_score
"""


def address_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO.md §5 (AI.GENERATE_TEXT address standardization) through
    the Arrow-batched model-function seam (functions/model_fn.py).
    Addresses are planted deterministically from c_custkey (the test
    tables carry none), standardized by the batched UDF, and the
    DuckDB oracle replays the identical rule chain — pinning the
    Pandas-UDF plumbing, not just the rules."""
    from biglake_iceberg_pipeline_spark.functions.model_fn import (
        standardize_address_col,
    )

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    suffix = F.element_at(
        F.array(F.lit("st."), F.lit("ave"), F.lit("rd"), F.lit("blvd")),
        (F.col("c_custkey") % 4 + 1).cast("int"),
    )
    addr = F.concat(
        (F.col("c_custkey") % 999).cast("string"),
        F.lit(" Main "),
        suffix,
        F.lit(" apt "),
        (F.col("c_custkey") % 10).cast("string"),
        F.lit(" springfield ma"),
    )
    return cust.select(
        "c_custkey",
        addr.alias("raw_address"),
        standardize_address_col(addr).alias("standardized_address"),
    ).orderBy("c_custkey")


ADDRESS_STANDARDIZE_SQL = r"""
WITH planted AS (
    SELECT c_custkey,
        CAST(c_custkey % 999 AS VARCHAR) || ' Main ' ||
        CASE c_custkey % 4 WHEN 0 THEN 'st.' WHEN 1 THEN 'ave'
                           WHEN 2 THEN 'rd' ELSE 'blvd' END ||
        ' apt ' || CAST(c_custkey % 10 AS VARCHAR) || ' springfield ma'
          AS raw_address
    FROM customer
)
SELECT c_custkey, raw_address,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(raw_address), ' st\. ', ' street ', 'g'),
            ' ave ', ' avenue ', 'g'),
          ' rd ', ' road ', 'g'),
        ' blvd ', ' boulevard ', 'g'),
      ' ma$', ' MA', 'g') AS standardized_address
FROM planted
ORDER BY c_custkey
"""


def users_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMO.md medallion table `gold.users_enriched`: users + the
    AI-standardized address (Arrow-batched model seam, same planted
    address as `address_standardize`) + churn risk from order recency.
    One shuffle (orders agg on custkey); customer side joins broadcast
    -free on the same key, address UDF runs post-join on the slim
    projection."""
    from biglake_iceberg_pipeline_spark.functions.model_fn import (
        standardize_address_col,
    )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("pc_custkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_round(F.sum("o_totalprice"), 2).alias("total_spend"),
        F.max("o_orderdate").alias("last_order_at"),
    )
    suffix = F.element_at(
        F.array(F.lit("st."), F.lit("ave"), F.lit("rd"), F.lit("blvd")),
        (F.col("c_custkey") % 4 + 1).cast("int"),
    )
    addr = F.concat(
        (F.col("c_custkey") % 999).cast("string"),
        F.lit(" Main "),
        suffix,
        F.lit(" apt "),
        (F.col("c_custkey") % 10).cast("string"),
        F.lit(" springfield ma"),
    )
    days_idle = F.datediff(
        F.to_date(F.lit(REF_DATE)), F.to_date("last_order_at")
    )
    churn_risk = (
        F.when(F.col("last_order_at").isNull(), "never_ordered")
        .when(days_idle > 180, "high")
        .when(days_idle > 90, "medium")
        .otherwise("low")
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.pc_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.col("c_mktsegment").alias("segment"),
            standardize_address_col(addr).alias("standardized_address"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
            "last_order_at",
            churn_risk.alias("churn_risk"),
        )
    )


USERS_ENRICHED_SQL = rf"""
WITH per_cust AS (
    SELECT o_custkey, COUNT(*) AS n_orders,
           floor(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS total_spend,
           MAX(o_orderdate) AS last_order_at
    FROM orders GROUP BY o_custkey
),
planted AS (
    SELECT c_custkey, c_name, c_mktsegment,
        CAST(c_custkey % 999 AS VARCHAR) || ' Main ' ||
        CASE c_custkey % 4 WHEN 0 THEN 'st.' WHEN 1 THEN 'ave'
                           WHEN 2 THEN 'rd' ELSE 'blvd' END ||
        ' apt ' || CAST(c_custkey % 10 AS VARCHAR) || ' springfield ma'
          AS raw_address
    FROM customer
)
SELECT
    c_custkey,
    c_name,
    c_mktsegment AS segment,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(raw_address), ' st\. ', ' street ', 'g'),
            ' ave ', ' avenue ', 'g'),
          ' rd ', ' road ', 'g'),
        ' blvd ', ' boulevard ', 'g'),
      ' ma$', ' MA', 'g') AS standardized_address,
    COALESCE(n_orders, 0) AS n_orders,
    COALESCE(total_spend, 0.0) AS total_spend,
    last_order_at,
    CASE
        WHEN last_order_at IS NULL THEN 'never_ordered'
        WHEN datediff('day', CAST(last_order_at AS DATE),
                      DATE '{REF_DATE}') > 180 THEN 'high'
        WHEN datediff('day', CAST(last_order_at AS DATE),
                      DATE '{REF_DATE}') > 90 THEN 'medium'
        ELSE 'low'
    END AS churn_risk
FROM planted
LEFT JOIN per_cust ON c_custkey = o_custkey
"""


QUERIES = {
    "silver_dedup_events": silver_dedup_events,
    "silver_orders": silver_orders,
    "clean_customer": clean_customer,
    "gold_customer_metrics": gold_customer_metrics,
    "gold_product_performance": gold_product_performance,
    "gold_daily_sales": gold_daily_sales,
    "gold_orders_enriched": gold_orders_enriched,
    "currency_convert": currency_convert,
    "cohort_retention": cohort_retention,
    "customer_profiles": customer_profiles,
    "rfm_segments": rfm_segments,
    "address_standardize": address_standardize,
    "users_enriched": users_enriched,
}

ORACLE = {
    "silver_dedup_events": SILVER_DEDUP_EVENTS_SQL,
    "silver_orders": SILVER_ORDERS_SQL,
    "clean_customer": CLEAN_CUSTOMER_SQL,
    "gold_customer_metrics": GOLD_CUSTOMER_METRICS_SQL,
    "gold_product_performance": GOLD_PRODUCT_PERFORMANCE_SQL,
    "gold_daily_sales": GOLD_DAILY_SALES_SQL,
    "gold_orders_enriched": GOLD_ORDERS_ENRICHED_SQL,
    "currency_convert": CURRENCY_CONVERT_SQL,
    "cohort_retention": COHORT_RETENTION_SQL,
    "customer_profiles": CUSTOMER_PROFILES_SQL,
    "rfm_segments": RFM_SEGMENTS_SQL,
    "address_standardize": ADDRESS_STANDARDIZE_SQL,
    "users_enriched": USERS_ENRICHED_SQL,
}
