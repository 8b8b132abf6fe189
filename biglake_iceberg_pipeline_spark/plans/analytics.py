"""Window / semi-anti-join / rollup / correlated-aggregate analytics.

Rounds out the warehouse query surface (the reference's gold layer is
built interactively via the Gemini data-engineering agent, DEMO.md §3
— any shape a user asks for must run). Each query is a distinct
Catalyst plan family:

- window ranking (top-n per group): one shuffle on the partition key
- EXISTS / NOT EXISTS: left-semi and left-anti joins (never a distinct
  + inner join — semi joins short-circuit on first match)
- ROLLUP: Spark expands grouping sets in one aggregation pass
- correlated scalar aggregate: de-correlated into a self-join against
  the per-key aggregate (the classic TPC-H Q17 plan)
- running totals: ordered window sum, deterministic sequential adds
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sources.catalog import load_table


def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 revenue parts within each brand (window ranking)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .join(part, F.col("l_partkey") == part.p_partkey)
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("revenue"), F.col("p_partkey")
    )
    return (
        rev.withColumn("brand_rank", F.row_number().over(w))
        .where(F.col("brand_rank") <= 3)
        .select("p_brand", "brand_rank", "p_partkey", "p_name", "revenue")
        .orderBy("p_brand", "brand_rank")
    )


TOP_PARTS_PER_BRAND_SQL = """
WITH rev AS (
    SELECT l_partkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem GROUP BY l_partkey
),
ranked AS (
    SELECT p_brand, p_partkey, p_name, revenue,
        ROW_NUMBER() OVER (
            PARTITION BY p_brand ORDER BY revenue DESC, p_partkey
        ) AS brand_rank
    FROM rev JOIN part ON l_partkey = p_partkey
)
SELECT p_brand, brand_rank, p_partkey, p_name, revenue
FROM ranked WHERE brand_rank <= 3
ORDER BY p_brand, brand_rank
"""


def orders_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority counts for orders containing a returned item
    (EXISTS → left-semi join; TPC-H Q4 shape)."""
    orders = load_table(spark, sf_dir, "orders")
    returned = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDERS_WITH_RETURNS_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment counts of customers with no orders (NOT EXISTS →
    left-anti join; TPC-H Q22 shape)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_balance"),
        )
        .orderBy("c_mktsegment")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       ROUND(AVG(c_acctbal), 4) AS avg_balance
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region → nation revenue with ROLLUP subtotals and a grand
    total (grouping-sets aggregation in one pass)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        base.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


REVENUE_ROLLUP_SQL = """
SELECT r_name, n_name,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS order_count
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue from orders below 20% of a part's mean
    quantity (correlated scalar aggregate → de-correlated self-join;
    TPC-H Q17 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("aq")
    )
    return (
        li.join(F.broadcast(avg_qty), li.l_partkey == F.col("ak"))
        .where(F.col("l_quantity") < 0.2 * F.col("aq"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN (
    SELECT l_partkey AS ak, AVG(l_quantity) AS aq
    FROM lineitem GROUP BY l_partkey
) a ON l.l_partkey = a.ak
WHERE l.l_quantity < 0.2 * a.aq
"""


def revenue_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue + running cumulative total (ordered window)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month",
        "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("cumulative_revenue"),
    ).orderBy("month")


REVENUE_RUNNING_TOTAL_SQL = """
WITH monthly AS (
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders GROUP BY 1
)
SELECT month, revenue,
    ROUND(SUM(revenue) OVER (
        ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ), 2) AS cumulative_revenue
FROM monthly
ORDER BY month
"""


def skew_safe_segment_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment event activity via an explicitly salted join.

    events.user_id is a hot-key column (each active user contributes
    thousands of events while the customer dim has one row per user) —
    the shape where one reducer drowns at 100 TB. salted_join spreads
    each user over 8 sub-keys; skew_safe_count_distinct avoids
    funneling a segment's user set through one task. Results are
    identical to the plain join+COUNT(DISTINCT) (the oracle)."""
    from biglake_iceberg_pipeline_spark.operators.skew import (
        salted_join,
        skew_safe_count_distinct,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, ["user_id"], n_salts=8)
    totals = joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    users = skew_safe_count_distinct(
        joined, ["c_mktsegment"], "user_id", "n_users"
    )
    return totals.join(F.broadcast(users), "c_mktsegment")


SKEW_SAFE_SEGMENT_ACTIVITY_SQL = """
SELECT
    c_mktsegment,
    COUNT(*) AS n_events,
    ROUND(SUM(value), 2) AS total_value,
    COUNT(DISTINCT user_id) AS n_users
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median/p90/p99 of order value per priority. Spark's
    exact percentile sorts within each group partition — fine for
    bounded groups; at unbounded group sizes switch to
    approx_percentile (t-digest sketch, mergeable map-side)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.median("o_totalprice"), 2).alias("median_value"),
            F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90_value"),
            F.round(F.percentile("o_totalprice", 0.99), 2).alias("p99_value"),
        )
        .orderBy("o_orderpriority")
    )


ORDER_VALUE_PERCENTILES_SQL = """
SELECT
    o_orderpriority,
    COUNT(*) AS n_orders,
    ROUND(MEDIAN(o_totalprice), 2) AS median_value,
    ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_value,
    ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99_value
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def revenue_pivot_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue pivoted to one column per order priority.
    pivot() with EXPLICIT values stays a single-shuffle aggregation
    (no extra pass to discover the pivot domain — essential at scale;
    an unbounded-domain pivot would need a distinct scan first)."""
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy(F.year("o_orderdate").alias("o_year"))
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    renames = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "not_specified",
        "5-LOW": "low",
    }
    for old, new in renames.items():
        pivoted = pivoted.withColumnRenamed(old, new)
    return pivoted.orderBy("o_year")


REVENUE_PIVOT_BY_PRIORITY_SQL = """
SELECT
    EXTRACT(YEAR FROM o_orderdate) AS o_year,
    ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                   THEN o_totalprice END), 2) AS urgent,
    ROUND(SUM(CASE WHEN o_orderpriority = '2-HIGH'
                   THEN o_totalprice END), 2) AS high,
    ROUND(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
                   THEN o_totalprice END), 2) AS medium,
    ROUND(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                   THEN o_totalprice END), 2) AS not_specified,
    ROUND(SUM(CASE WHEN o_orderpriority = '5-LOW'
                   THEN o_totalprice END), 2) AS low
FROM orders
GROUP BY 1
ORDER BY o_year
"""


def approx_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-based scale path for per-type event stats: HLL±±
    distinct users (approx_count_distinct) and t-digest percentiles
    (approx_percentile). Both sketches merge map-side, so the shuffle
    carries one sketch per (partition, type) instead of every
    (type, user) pair — at 100 TB this is the difference between a
    metadata-sized shuffle and rehashing the fact table. No SQL
    oracle (estimates are engine-specific); tests pin relative error
    against the exact variants."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.round(
                F.expr("approx_percentile(value, 0.5, 10000)"), 2
            ).alias("approx_p50_value"),
            F.round(
                F.expr("approx_percentile(value, 0.99, 10000)"), 2
            ).alias("approx_p99_value"),
        )
        .orderBy("event_type")
    )


# One materialized lakehouse table per (process, sf_dir) for the
# connector lookup query: building it is the ingest-time cost; the
# query itself is the read-path under test.
_LOOKUP_TABLE_PATHS: dict[str, str] = {}


def _lookup_table_path(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _LOOKUP_TABLE_PATHS:
        import hashlib
        import os
        import tempfile

        from biglake_iceberg_pipeline_spark.operators.vector_index import (
            cleanup_index_at_exit,
        )
        from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
            LakehouseTable,
        )

        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
        path = (
            f"{tempfile.gettempdir()}/lakehouse_lookup_{tag}_{os.getpid()}"
        )
        # a leftover table at this pid-scoped path (crashed prior
        # build, or a recycled pid) would be double-appended —
        # rebuild from scratch
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        table = LakehouseTable(path)
        # write SORTED in one pass (range shuffle + local sort):
        # footer o_orderkey ranges come out disjoint across the 8
        # files, so a point/range predicate prunes to ~1 file —
        # same layout compact(sort_by=...) produces, at half the
        # write cost (no append-then-rewrite)
        table.append(
            load_table(spark, sf_dir, "orders")
            .repartitionByRange(8, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
        )
        cleanup_index_at_exit(path)
        _LOOKUP_TABLE_PATHS[sf_dir] = path
    return _LOOKUP_TABLE_PATHS[sf_dir]


def lakehouse_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range lookup THROUGH the batch connector
    (``spark.read.format("lakehouse")``, streaming/source.py F35):
    Catalyst pushes the comparison filters into the Python data
    source, which turns them into manifest-stats file skipping — on
    the sort-compacted table the scan plans ~1 of 8 files (the pin in
    tests/test_batch_format.py), the same pruning a 100 TB point
    lookup needs. Rows re-filter engine-side, so results are exact
    regardless of pruning.

    The reader implements ``pushFilters``, which Spark REFUSES to
    silently ignore when ``spark.sql.python.filterPushdown.enabled``
    is off (plan_data_source_read.py raises
    DATA_SOURCE_PUSHDOWN_DISABLED) — and a vanilla session (the
    driver's environment) defaults it off. The conf is
    runtime-settable, so enable it here, NOT only in the session
    builder: the returned DataFrame is collected lazily by the
    caller, so the conf must remain set (no set-and-restore). Pinned
    by the bare-session gate in tests/test_vanilla_session.py."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseStreamSource)
    path = _lookup_table_path(spark, sf_dir)
    return (
        spark.read.format("lakehouse")
        .option("path", path)
        .load()
        .filter(
            (F.col("o_orderkey") >= 1000) & (F.col("o_orderkey") <= 1200)
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
        )
    )


LAKEHOUSE_POINT_LOOKUP_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderpriority
FROM orders
WHERE o_orderkey BETWEEN 1000 AND 1200
"""



_BLOOM_TABLE_PATHS: dict[str, str] = {}


def _bloom_table_path(spark: SparkSession, sf_dir: str) -> str:
    """Orders hash-distributed across 8 files (every file's
    o_orderkey [min, max] spans the whole key range — min/max stats
    cannot skip anything) with Bloom filters refreshed on
    o_orderkey: the point-lookup shape blooms exist for."""
    if sf_dir not in _BLOOM_TABLE_PATHS:
        import hashlib
        import os
        import tempfile

        from biglake_iceberg_pipeline_spark.operators.vector_index import (
            cleanup_index_at_exit,
        )
        from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
            LakehouseTable,
        )

        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
        path = (
            f"{tempfile.gettempdir()}/lakehouse_bloom_{tag}_{os.getpid()}"
        )
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        table = LakehouseTable(path)
        table.append(
            load_table(spark, sf_dir, "orders").repartition(
                8, "o_custkey"
            )
        )
        table.refresh_bloom_filters(spark, ["o_orderkey"])
        cleanup_index_at_exit(path)
        _BLOOM_TABLE_PATHS[sf_dir] = path
    return _BLOOM_TABLE_PATHS[sf_dir]


def lakehouse_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup THROUGH the connector on an UNSORTED column:
    every file's footer range contains the probed key, so min/max
    skipping keeps all 8 files — the per-file Bloom filters
    (operators/bloom.py, F36) are what prune the scan. The probed key
    is the corpus minimum (deterministic at every SF); results
    re-filter engine-side, so they are exact regardless of pruning.

    Enables ``spark.sql.python.filterPushdown.enabled`` at runtime —
    see lakehouse_point_lookup's docstring: the driver's vanilla
    session defaults it off and Spark raises rather than ignore a
    pushFilters implementation; lazy collection means it must stay
    set."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseStreamSource)
    path = _bloom_table_path(spark, sf_dir)
    # deterministic MID-RANGE existing key: an extreme key (min/max)
    # would be prunable by footer stats alone; a middle key sits
    # inside every file's [min, max], so only the bloom skips files
    orders = load_table(spark, sf_dir, "orders")
    mn, mx = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    key = (
        orders.where(F.col("o_orderkey") * 2 >= mn + mx)
        .agg(F.min("o_orderkey"))
        .first()[0]
    )
    return (
        spark.read.format("lakehouse")
        .option("path", path)
        .load()
        .filter(F.col("o_orderkey") == F.lit(key))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
        )
    )


LAKEHOUSE_BLOOM_LOOKUP_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderkey = (
    SELECT min(o_orderkey) FROM orders
    WHERE o_orderkey * 2 >=
        (SELECT min(o_orderkey) + max(o_orderkey) FROM orders)
)
"""


_MOR_TABLE_PATHS: dict[str, str] = {}


def _mor_table_path(spark: SparkSession, sf_dir: str) -> str:
    """Orders as a sort-laid-out lakehouse table carrying a LIVE
    merge-on-read tail: a position-delete commit (every o_orderkey ≡
    3 mod 7) followed by a MoR MERGE (equality delete + postimage
    files doubling o_totalprice and flagging o_orderstatus='U' for
    o_orderkey ≡ 2 mod 100). Deliberately NOT materialized — the
    point is reading THROUGH the tail."""
    if sf_dir not in _MOR_TABLE_PATHS:
        import hashlib
        import os
        import tempfile

        from biglake_iceberg_pipeline_spark.operators.vector_index import (
            cleanup_index_at_exit,
        )
        from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
            LakehouseTable,
        )

        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
        path = f"{tempfile.gettempdir()}/lakehouse_mor_{tag}_{os.getpid()}"
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        table = LakehouseTable(path)
        orders = load_table(spark, sf_dir, "orders")
        table.append(
            orders.repartitionByRange(8, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
        )
        table.delete_where_mor(spark, F.col("o_orderkey") % 7 == 3)
        src = (
            orders.where(F.col("o_orderkey") % 100 == 2)
            .withColumn("o_orderstatus", F.lit("U"))
            .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        )
        table.merge(
            spark, src, keys=["o_orderkey"], mode="merge-on-read"
        )
        cleanup_index_at_exit(path)
        _MOR_TABLE_PATHS[sf_dir] = path
    return _MOR_TABLE_PATHS[sf_dir]


def lakehouse_mor_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range read THROUGH the batch connector of a table with an
    UNMATERIALIZED merge-on-read delete tail (streaming/source.py
    F45): the planner ships each pruned file its own overlay —
    voided positions in the partition payload, equality-delete files
    by reference scoped by added_at watermark + footer key ranges —
    and the executor drops the rows with the NULL-safe vectorized
    is_in, mirroring the native read's broadcast anti-joins
    (sinks/lakehouse.py `_apply_deletes`). Pushed range filters
    still prune files first; the overlay composes with pruning
    rather than forcing a full scan. This is the read path a 100 TB
    table lives on between a MoR DELETE/MERGE and its next
    compaction.

    Enables ``spark.sql.python.filterPushdown.enabled`` at runtime —
    see lakehouse_point_lookup's docstring (the driver's vanilla
    session defaults it off; lazy collection means it must stay
    set)."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseStreamSource)
    path = _mor_table_path(spark, sf_dir)
    return (
        spark.read.format("lakehouse")
        .option("path", path)
        .load()
        .filter(
            (F.col("o_orderkey") >= 1) & (F.col("o_orderkey") <= 5000)
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
        )
    )


_BRANCH_TABLE_PATHS: dict[str, str] = {}


def _branch_table_path(spark: SparkSession, sf_dir: str) -> str:
    """Orders with a MoR position-delete tail (o_orderkey ≡ 5 mod
    13), then a branch 'wip' staging an append of the o_orderkey <
    100 rows re-keyed +1e9 — deterministic WAP state at every SF."""
    if sf_dir not in _BRANCH_TABLE_PATHS:
        import hashlib
        import os
        import tempfile

        from biglake_iceberg_pipeline_spark.operators.vector_index import (
            cleanup_index_at_exit,
        )
        from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
            LakehouseTable,
        )

        tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
        path = (
            f"{tempfile.gettempdir()}/lakehouse_branch_{tag}_{os.getpid()}"
        )
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path, ignore_errors=True)
        table = LakehouseTable(path)
        orders = load_table(spark, sf_dir, "orders")
        table.append(orders.repartition(4))
        table.delete_where_mor(spark, F.col("o_orderkey") % 13 == 5)
        table.create_branch("wip")
        table.append_to_branch(
            "wip",
            orders.where(F.col("o_orderkey") < 100).withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(10**9)
            ),
        )
        cleanup_index_at_exit(path)
        _BRANCH_TABLE_PATHS[sf_dir] = path
    return _BRANCH_TABLE_PATHS[sf_dir]


def lakehouse_branch_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Branch read THROUGH the batch connector (F47,
    ``.option("branch", "wip")`` + ``columns`` projection): the
    staged write-audit-publish state — base files with the base
    snapshot's outstanding MoR delete tail applied, plus the
    branch's staged append — aggregated per order priority. The
    oracle replays the branch algebra in DuckDB: orders minus the
    position-deleted keys, unioned with the re-keyed staged rows."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseStreamSource)
    path = _branch_table_path(spark, sf_dir)
    df = (
        spark.read.format("lakehouse")
        .option("path", path)
        .option("branch", "wip")
        .option("columns", "o_orderkey,o_orderpriority,o_totalprice")
        .load()
    )
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.floor(F.sum("o_totalprice") * 100.0 + 0.5).alias(
                "cents_total"
            ),
        )
        .orderBy("o_orderpriority")
    )


LAKEHOUSE_BRANCH_READ_SQL = """
WITH branch_state AS (
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders WHERE o_orderkey % 13 <> 5
    UNION ALL
    SELECT o_orderkey + 1000000000, o_orderpriority, o_totalprice
    FROM orders WHERE o_orderkey < 100
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(floor(SUM(o_totalprice) * 100.0 + 0.5) AS BIGINT)
           AS cents_total
FROM branch_state
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


_WAP_TABLE_PATHS: dict[str, str] = {}


def _wap_table_path(spark: SparkSession, sf_dir: str) -> str:
    """Orders published through the FULL write-audit-publish loop via
    the public DataSource API (F49): base append → branch 'audit' →
    connector-staged txn-stamped branch write (o_orderkey < 100
    re-keyed +2e9, totalprice ×3, priority 'X-WAP') → a REPLAY of the
    same stamped write (must no-op) → fast_forward. The fixture state
    is main AFTER the publish — deterministic at every SF."""
    if sf_dir not in _WAP_TABLE_PATHS:
        from biglake_iceberg_pipeline_spark.operators.vector_index import (
            process_scratch_root,
        )
        from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
            LakehouseTable,
        )
        from biglake_iceberg_pipeline_spark.streaming.source import (
            LakehouseStreamSource,
        )

        spark.dataSource.register(LakehouseStreamSource)

        def build(root: str) -> None:
            import os as _os

            path = _os.path.join(root, "t")
            table = LakehouseTable(path)
            orders = load_table(spark, sf_dir, "orders")
            table.append(orders.repartition(4))
            table.create_branch("audit")
            staged = orders.where(F.col("o_orderkey") < 100).select(
                (F.col("o_orderkey") + F.lit(2 * 10**9)).alias(
                    "o_orderkey"
                ),
                *[c for c in orders.columns if c != "o_orderkey"],
            ).withColumn(
                "o_totalprice", F.col("o_totalprice") * 3
            ).withColumn("o_orderpriority", F.lit("X-WAP"))

            def stamped_write():
                staged.write.format("lakehouse").option(
                    "path", path
                ).option("branch", "audit").option(
                    "txnAppId", "wap-fixture"
                ).option("txnVersion", "1").mode("append").save()

            stamped_write()
            stamped_write()  # replayed epoch: txn guard must no-op
            table.fast_forward("audit")

        root = process_scratch_root(
            _WAP_TABLE_PATHS_SCRATCH, sf_dir, "lakehouse_wap", build
        )
        import os as _os

        _WAP_TABLE_PATHS[sf_dir] = _os.path.join(root, "t")
    return _WAP_TABLE_PATHS[sf_dir]


_WAP_TABLE_PATHS_SCRATCH: dict[str, str] = {}


def lakehouse_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish THROUGH the connector end to end (F49):
    the fixture stages a txn-stamped batch write on a branch via
    ``df.write.format("lakehouse").option("branch", ...)``, REPLAYS
    the same stamped write (the no-op guard — a double-staged epoch
    would double these aggregates and fail the hash), and publishes
    with ``fast_forward``; this query aggregates MAIN after the
    publish through the connector read. The oracle replays the
    branch algebra: orders plus exactly ONE copy of the re-keyed
    staged rows."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseStreamSource)
    path = _wap_table_path(spark, sf_dir)
    df = (
        spark.read.format("lakehouse")
        .option("path", path)
        .option("columns", "o_orderkey,o_orderpriority,o_totalprice")
        .load()
    )
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.floor(F.sum("o_totalprice") * 100.0 + 0.5).alias(
                "cents_total"
            ),
        )
        .orderBy("o_orderpriority")
    )


LAKEHOUSE_WAP_PUBLISH_SQL = """
WITH published AS (
    SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
    UNION ALL
    SELECT o_orderkey + 2000000000, 'X-WAP' AS o_orderpriority,
           o_totalprice * 3 AS o_totalprice
    FROM orders WHERE o_orderkey < 100
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(floor(SUM(o_totalprice) * 100.0 + 0.5) AS BIGINT)
           AS cents_total
FROM published
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def lakehouse_batch_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch change feed THROUGH the connector (F48,
    ``.option("readChangeFeed", "true")`` + snapshot bounds): the
    classified row changes of the MoR fixture's whole history —
    the initial append as inserts, the position-delete commit as
    coordinate-read delete pre-images, the MoR MERGE as postimage
    inserts plus watermark/range-pruned eq-matched delete pre-images
    with already-voided rows masked (no double-emit) — replayed as
    one bounded batch, the CDC reconciliation read. The oracle
    replays the classification arithmetic over the same synthetic
    history in DuckDB, so the hash certifies the planner's change
    attribution, not just row counts."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseStreamSource)
    path = _mor_table_path(spark, sf_dir)
    df = (
        spark.read.format("lakehouse")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingSnapshotId", "0")
        .load()
    )
    return df.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "_change_type"
    )


LAKEHOUSE_BATCH_CDF_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       'insert' AS _change_type
FROM orders
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice, 'delete'
FROM orders WHERE o_orderkey % 7 = 3
UNION ALL
SELECT o_orderkey, 'U' AS o_orderstatus,
       o_totalprice * 2 AS o_totalprice, 'insert'
FROM orders WHERE o_orderkey % 100 = 2
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice, 'delete'
FROM orders WHERE o_orderkey % 100 = 2 AND o_orderkey % 7 <> 3
"""


LAKEHOUSE_MOR_READ_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderkey BETWEEN 1 AND 5000
  AND o_orderkey % 7 <> 3 AND o_orderkey % 100 <> 2
UNION ALL
SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
       o_totalprice * 2 AS o_totalprice
FROM orders
WHERE o_orderkey BETWEEN 1 AND 5000 AND o_orderkey % 100 = 2
"""


_DV_TABLE_PATHS: dict[str, str] = {}
_DV_TABLE_PATHS_SCRATCH: dict[str, str] = {}


def _dv_table_path(spark: SparkSession, sf_dir: str) -> str:
    """Orders with TWO MoR position-delete commits (o_orderkey ≡ 3
    mod 7, then ≡ 4 mod 11) whose tail is then consolidated into
    DELETION VECTORS (``rewrite_position_deletes(as_dv=True)``,
    F51): one blob row per affected data file, positions
    delta+deflate encoded — deterministic at every SF."""
    if sf_dir not in _DV_TABLE_PATHS:
        import os as _os

        from biglake_iceberg_pipeline_spark.operators.vector_index import (
            process_scratch_root,
        )
        from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
            LakehouseTable,
        )

        def build(root: str) -> None:
            path = _os.path.join(root, "t")
            table = LakehouseTable(path)
            orders = load_table(spark, sf_dir, "orders")
            table.append(
                orders.repartitionByRange(8, "o_orderkey")
                .sortWithinPartitions("o_orderkey")
            )
            table.delete_where_mor(
                spark, F.col("o_orderkey") % 7 == 3
            )
            table.delete_where_mor(
                spark, F.col("o_orderkey") % 11 == 4
            )
            table.rewrite_position_deletes(spark, as_dv=True)

        root = process_scratch_root(
            _DV_TABLE_PATHS_SCRATCH, sf_dir, "lakehouse_dv", build
        )
        _DV_TABLE_PATHS[sf_dir] = _os.path.join(root, "t")
    return _DV_TABLE_PATHS[sf_dir]


def lakehouse_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range read THROUGH the batch connector of a table whose
    position-delete tail was consolidated into DELETION VECTORS
    (F51, ``rewrite_position_deletes(as_dv=True)`` — Iceberg v3's
    deletion vectors re-expressed portably): the planner maps each
    planned file to its blob by the DV file's own file_path column
    (exact, metadata-sized), ships the blob path by REFERENCE, and
    the executor decodes its single delta+deflate row into a numpy
    void mask — O(1) task payloads under any tail size, composing
    with pushed-filter file pruning. The oracle replays both delete
    predicates arithmetically, so the hash certifies the decoded
    positions, not just counts."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseStreamSource)
    path = _dv_table_path(spark, sf_dir)
    return (
        spark.read.format("lakehouse")
        .option("path", path)
        .load()
        .filter(
            (F.col("o_orderkey") >= 1) & (F.col("o_orderkey") <= 5000)
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
        )
    )


LAKEHOUSE_DV_READ_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderkey BETWEEN 1 AND 5000
  AND o_orderkey % 7 <> 3 AND o_orderkey % 11 <> 4
"""


QUERIES = {
    "skew_safe_segment_activity": skew_safe_segment_activity,
    "order_value_percentiles": order_value_percentiles,
    "revenue_pivot_by_priority": revenue_pivot_by_priority,
    "top_parts_per_brand": top_parts_per_brand,
    "orders_with_returns": orders_with_returns,
    "customers_without_orders": customers_without_orders,
    "revenue_rollup": revenue_rollup,
    "small_quantity_revenue": small_quantity_revenue,
    "revenue_running_total": revenue_running_total,
    "approx_event_stats": approx_event_stats,
    "lakehouse_point_lookup": lakehouse_point_lookup,
    "lakehouse_bloom_lookup": lakehouse_bloom_lookup,
    "lakehouse_mor_read": lakehouse_mor_read,
    "lakehouse_branch_read": lakehouse_branch_read,
    "lakehouse_batch_cdf": lakehouse_batch_cdf,
    "lakehouse_wap_publish": lakehouse_wap_publish,
    "lakehouse_dv_read": lakehouse_dv_read,
}

ORACLE = {
    "skew_safe_segment_activity": SKEW_SAFE_SEGMENT_ACTIVITY_SQL,
    "order_value_percentiles": ORDER_VALUE_PERCENTILES_SQL,
    "revenue_pivot_by_priority": REVENUE_PIVOT_BY_PRIORITY_SQL,
    "top_parts_per_brand": TOP_PARTS_PER_BRAND_SQL,
    "orders_with_returns": ORDERS_WITH_RETURNS_SQL,
    "customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "revenue_rollup": REVENUE_ROLLUP_SQL,
    "small_quantity_revenue": SMALL_QUANTITY_REVENUE_SQL,
    "revenue_running_total": REVENUE_RUNNING_TOTAL_SQL,
    "lakehouse_point_lookup": LAKEHOUSE_POINT_LOOKUP_SQL,
    "lakehouse_bloom_lookup": LAKEHOUSE_BLOOM_LOOKUP_SQL,
    "lakehouse_mor_read": LAKEHOUSE_MOR_READ_SQL,
    "lakehouse_branch_read": LAKEHOUSE_BRANCH_READ_SQL,
    "lakehouse_batch_cdf": LAKEHOUSE_BATCH_CDF_SQL,
    "lakehouse_wap_publish": LAKEHOUSE_WAP_PUBLISH_SQL,
    "lakehouse_dv_read": LAKEHOUSE_DV_READ_SQL,
}
