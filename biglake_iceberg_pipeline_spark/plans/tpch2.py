"""TPC-H suite completion: the subquery-heavy query family (Q2, Q4,
Q9, Q11, Q12, Q16, Q20, Q21, Q22 shapes) adapted to the driver's
reduced star schema (no partsupp / l_shipmode / l_commitdate /
c_phone — each query keeps its canonical PLAN SHAPE on the columns
that exist).

These exercise exactly the patterns a declarative engine must
de-correlate well, and each Spark implementation is the de-correlated
form while the DuckDB oracle keeps the textbook correlated SQL — so a
hash match also validates the rewrite:

- Q2  correlated MIN subquery      → window min over the group + filter
- Q4  EXISTS with inequality       → left-semi join (equi key carries it)
- Q9  5-way profit join            → dims broadcast, one fact shuffle
- Q11 HAVING > scalar subquery     → DataFrame.scalar() ScalarSubquery
- Q12 conditional counts           → pivot-style count(when)
- Q16 NOT IN + COUNT DISTINCT      → left-anti + distinct agg
- Q20 nested IN chains             → chained left-semi joins
- Q21 EXISTS + NOT EXISTS on fact  → one two-level per-order aggregate
      ((order, supplier) grain then order grain — no countDistinct
      Expand) replaces both correlated probes — the fact table is
      scanned twice, not three times, and shuffles once on its keys
- Q22 scalar AVG + anti join       → scalar() avg, left-anti on orders

Parity anchor: the reference's gold layer builds the same shapes over
thelook_ecommerce (test_data/thelook_ecommerce/silver/transformations,
DEMO.md §3 aggregation/enrichment SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.functions.numeric import money_round
from biglake_iceberg_pipeline_spark.sources.catalog import load_table


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per qualifying part (TPC-H Q2 shape). The
    correlated MIN-per-part subquery de-correlates into a window min
    over the (part → shipping suppliers) pairs; ties all survive, as
    in the spec. Distinct pairs first: the window then runs on
    |parts × suppliers-who-shipped|, not |lineitem|."""
    shipped = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") < 10)
    )
    pairs = shipped.join(F.broadcast(sup), shipped.l_suppkey == sup.s_suppkey)
    w = Window.partitionBy("l_partkey")
    return (
        pairs.withColumn("__min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("__min_bal"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
        .orderBy("s_acctbal", "p_partkey", "s_name")
        .limit(100)
    )


Q2_SQL = """
WITH shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_partkey, p_name, s_name, s_acctbal
FROM part
JOIN shipped ON p_partkey = l_partkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE p_type = 'ECONOMY' AND p_size < 10
  AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                   FROM shipped sh2 JOIN supplier s2 ON sh2.l_suppkey = s2.s_suppkey
                   WHERE sh2.l_partkey = p_partkey)
ORDER BY s_acctbal, p_partkey, s_name
LIMIT 100
"""


def q4_priority_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority check (TPC-H Q4 shape): orders in a quarter with
    at least one line shipped >60 days after the order date. EXISTS →
    left-semi; the 60-day inequality rides the orderkey equi-join, so
    no nested-loop join appears."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit by nation and year (TPC-H Q9 shape; cost
    proxied at 60% of retail price — no partsupp table). part,
    supplier, nation broadcast; the only shuffle is lineitem⋈orders
    on orderkey, then the tiny (nation, year) agg."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").contains("gear")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Per-row amount is identical-bits across engines, but SUM(double)
    # is summation-order-dependent — Spark's partial aggregation and
    # DuckDB's sequential scan disagree at the ulp level, flipping the
    # driver hash. Cast each row to DECIMAL(18,4) first: decimal SUM is
    # exact integer arithmetic, order-independent, so both engines land
    # on the same value regardless of plan shape.
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            money_round(F.sum(amount).cast("double"), 2).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = """
SELECT nation, o_year,
       floor(CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) * 100.0
             + 0.5) / 100.0 AS sum_profit
FROM (
    SELECT n_name AS nation,
           EXTRACT(YEAR FROM o_orderdate) AS o_year,
           l_extendedprice * (1 - l_discount)
             - 0.6 * p_retailprice * l_quantity AS amount
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts representing a significant share of a nation's shipped
    value (TPC-H Q11 shape). The HAVING > scalar-subquery threshold
    uses DataFrame.scalar() (Spark 4): the global total runs as a
    genuine ScalarSubquery inside the Filter — no join, no
    nested-loop, and the filter stays pushable. The nation-filtered
    join feeds both the per-part agg and the total; at 100 TB the
    nation filter makes both passes small."""
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    li = load_table(spark, sf_dir, "lineitem")
    base = li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey).join(
        F.broadcast(nation), sup.s_nationkey == nation.n_nationkey
    )
    per_part = base.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("l_extendedprice").alias("__value")
    )
    threshold = per_part.agg(
        (F.sum("__value") * F.lit(0.001)).alias("__threshold")
    )
    return (
        per_part.where(F.col("__value") > threshold.scalar())
        .select(
            "partkey", money_round(F.col("__value"), 2).alias("total_value")
        )
        .orderBy(F.desc("total_value"), "partkey")
    )


Q11_SQL = """
SELECT l_partkey AS partkey,
       floor(SUM(l_extendedprice) * 100.0 + 0.5) / 100.0 AS total_value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
GROUP BY l_partkey
HAVING SUM(l_extendedprice) > (
    SELECT 0.001 * SUM(l_extendedprice)
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3')
ORDER BY total_value DESC, partkey
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High- vs low-priority line counts per line status in a ship
    year (TPC-H Q12 shape; l_linestatus stands in for the absent
    l_shipmode). Conditional counts fold into one map-side partial
    agg — one orderkey shuffle, then a 2-row result."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier variety per part attribute bucket (TPC-H Q16 shape):
    NOT IN excluded-supplier subquery → left-anti join (keys are
    non-null, so the semantics coincide), then COUNT DISTINCT
    suppliers per (brand, type, size)."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_sup = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_sup),
            li.l_suppkey == bad_sup.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who moved serious volume of a part family in a year,
    within a nation group (TPC-H Q20 shape): the nested IN chains
    become left-semi joins — volume qualifier first (it shrinks the
    supplier set most), nation membership second, both broadcast."""
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").startswith("small")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    movers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 50)
        .select("l_suppkey")
    )
    nations = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7"))
        .select("n_nationkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(
            F.broadcast(movers), sup.s_suppkey == movers.l_suppkey, "left_semi"
        )
        .join(
            F.broadcast(nations),
            sup.s_nationkey == nations.n_nationkey,
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, s_acctbal FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 50
)
AND s_nationkey IN (SELECT n_nationkey FROM nation
                    WHERE n_name IN ('NATION_5', 'NATION_6', 'NATION_7'))
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for returns on multi-supplier
    finalized orders (TPC-H Q21 shape). The correlated EXISTS (another
    supplier in the order) and NOT EXISTS (another supplier also
    returned) both collapse into ONE per-order aggregate: distinct
    supplier count and distinct returning-supplier count. Two scans of
    lineitem instead of three, one orderkey shuffle, no correlated
    probes — the canonical Spark rewrite for multi-EXISTS on the same
    fact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders_f = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    # The (order, supplier) grain carries the per-pair returned-row
    # count, so ONE logical lineitem aggregation feeds BOTH the
    # per-order rollup (distinct-supplier / returning-supplier counts
    # — plain aggs on the already-shuffled key, no countDistinct
    # Expand) AND the candidate rows. numwait = sum of returned-row
    # counts, identical to counting qualifying l1 line items. (The
    # physical plan still materializes the scan per consumer — runtime
    # filters on the join branch defeat exchange-reuse canonical
    # equality — but the join input drops from raw returned line items
    # to aggregated pairs, and the rollup shuffles pair-counts, not
    # rows.)
    os_level = li.groupBy(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey")
    ).agg(
        F.sum((F.col("l_returnflag") == "R").cast("int")).alias(
            "__ret_rows"
        )
    )
    per_order = os_level.groupBy(F.col("__ok").alias("__ok2")).agg(
        F.count(F.lit(1)).alias("__n_supp"),
        F.sum((F.col("__ret_rows") > 0).cast("int")).alias("__n_ret_supp"),
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        os_level.where(F.col("__ret_rows") > 0)
        .join(per_order, F.col("__ok") == F.col("__ok2"))
        .where((F.col("__n_supp") > 1) & (F.col("__n_ret_supp") == 1))
        .join(orders_f, F.col("__ok") == orders_f.o_orderkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("__ret_rows").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wealthy-but-idle customers per country code (TPC-H Q22 shape;
    code derived from nationkey — no phone column, and "idle" means no
    order since 1999 because every customer here has SOME order). The
    scalar AVG runs as a ScalarSubquery via DataFrame.scalar();
    NOT EXISTS on recent orders is a left-anti join."""
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.col("c_nationkey") % 5
    )
    eligible = cust.where(F.col("cntrycode").isin(0, 1, 2))
    avg_bal = eligible.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01"))
        .select("o_custkey")
    )
    return (
        eligible.where(F.col("c_acctbal") > avg_bal.scalar())
        .join(recent, eligible.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
SELECT cntrycode, COUNT(*) AS numcust,
       floor(SUM(c_acctbal) * 100.0 + 0.5) / 100.0 AS totacctbal
FROM (
    SELECT c_nationkey % 5 AS cntrycode, c_acctbal, c_custkey
    FROM customer
    WHERE c_nationkey % 5 IN (0, 1, 2)
      AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > 0 AND c_nationkey % 5 IN (0, 1, 2))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
) custsale
GROUP BY cntrycode
ORDER BY cntrycode
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_priority_waiting": q4_priority_waiting,
    "q9_profit_by_nation": q9_profit_by_nation,
    "q11_important_parts": q11_important_parts,
    "q12_priority_shipping": q12_priority_shipping,
    "q16_supplier_variety": q16_supplier_variety,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_idle_customers": q22_idle_customers,
}

ORACLE = {
    "q2_min_cost_supplier": Q2_SQL,
    "q4_priority_waiting": Q4_SQL,
    "q9_profit_by_nation": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q12_priority_shipping": Q12_SQL,
    "q16_supplier_variety": Q16_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q22_idle_customers": Q22_SQL,
}
