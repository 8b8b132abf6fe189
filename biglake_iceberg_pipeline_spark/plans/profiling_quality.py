"""Profiling / quality / coercion queries with DuckDB oracles.

Each query applies a generic operator (operators/profiling.py,
operators/quality.py, operators/coercion.py) to a concrete driver
table, mirroring how the reference agent runs its SQL templates
against each ingested file (datagrunt_agent/tools/profiling.py,
quality.py, ingestion.py drive the same templates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import coercion, profiling, quality
from biglake_iceberg_pipeline_spark.operators.medallion import flag_duplicates
from biglake_iceberg_pipeline_spark.sources.catalog import load_table

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def profile_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profiling.null_analysis(
        load_table(spark, sf_dir, "documents"), DOC_COLS
    )


PROFILE_NULLS_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS column_name, COUNT(*) AS total_rows,
       COUNT({c}) AS non_null_count,
       COUNT(*) - COUNT({c}) AS null_count,
       ROUND((COUNT(*) - COUNT({c})) * 100.0 / COUNT(*), 2) AS null_percentage
FROM documents"""
    for c in DOC_COLS
)


def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return profiling.column_stats(ev)


def _stats_piece(col: str, sql_type: str, numeric: bool) -> str:
    if numeric:
        return f"""
SELECT '{col}' AS column_name, '{sql_type}' AS column_type,
       COUNT(DISTINCT {col}) AS distinct_count,
       ROUND((COUNT(*) - COUNT({col})) * 100.0 / COUNT(*), 2) AS null_percentage,
       ROUND(CAST(MIN({col}) AS DOUBLE), 4) AS min_num,
       ROUND(CAST(MAX({col}) AS DOUBLE), 4) AS max_num,
       ROUND(AVG(CAST({col} AS DOUBLE)), 4) AS avg_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM events"""
    return f"""
SELECT '{col}' AS column_name, '{sql_type}' AS column_type,
       COUNT(DISTINCT {col}) AS distinct_count,
       ROUND((COUNT(*) - COUNT({col})) * 100.0 / COUNT(*), 2) AS null_percentage,
       CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
       CAST(NULL AS DOUBLE) AS avg_num,
       MIN(CAST({col} AS VARCHAR)) AS min_str,
       MAX(CAST({col} AS VARCHAR)) AS max_str
FROM events"""


PROFILE_COLUMN_STATS_SQL = "\nUNION ALL\n".join(
    [
        _stats_piece("event_id", "bigint", True),
        _stats_piece("user_id", "bigint", True),
        _stats_piece("event_type", "string", False),
        _stats_piece("value", "double", True),
    ]
)


def profile_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "k_value", F.get_json_object("props", "$.k")
    )
    return profiling.type_distribution(ev, "k_value")


PROFILE_TYPE_DISTRIBUTION_SQL = """
WITH vals AS (
    SELECT json_extract_string(props, '$.k') AS k_value FROM events
),
classified AS (
    SELECT CASE
        WHEN regexp_matches(trim(k_value), '^-?[0-9]+$') THEN 'integer'
        WHEN regexp_matches(trim(k_value), '^-?[0-9]*\\.[0-9]+([eE][+-]?[0-9]+)?$') THEN 'float'
        WHEN lower(trim(k_value)) IN ('true','false') THEN 'boolean'
        ELSE 'varchar' END AS detected_type
    FROM vals WHERE k_value IS NOT NULL
)
SELECT detected_type, COUNT(*) AS row_count,
       ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 2) AS percentage
FROM classified GROUP BY detected_type
"""


def profile_date_potential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty date strings derived from o_orderdate (half ISO, half
    m/d/Y — same variant trick as generate.py's 7 date formats)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "date_str",
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        ).otherwise(F.date_format("o_orderdate", "MM/dd/yyyy")),
    )
    return profiling.date_potential(o, "date_str")


PROFILE_DATE_POTENTIAL_SQL = """
WITH raw AS (
    SELECT CASE WHEN o_orderkey % 2 = 0
        THEN strftime(o_orderdate, '%Y-%m-%d')
        ELSE strftime(o_orderdate, '%m/%d/%Y') END AS date_str
    FROM orders
)
SELECT COUNT(*) FILTER (
    WHERE try_cast(trim(date_str) AS DATE) IS NOT NULL
       OR try_strptime(trim(date_str), '%m/%d/%Y') IS NOT NULL
) AS date_parseable_count
FROM raw
"""


def profile_number_potential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency-formatted price strings ('$1,234.56') — counts how many
    parse after stripping $ % , (number_potential.sql)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "price_str",
        F.concat(
            F.lit("$"),
            F.format_string("%.2f", F.round("o_totalprice", 2)),
            F.lit("%"),
        ),
    )
    return profiling.number_potential(o, "price_str")


PROFILE_NUMBER_POTENTIAL_SQL = """
WITH raw AS (
    SELECT '$' || printf('%.2f', ROUND(o_totalprice, 2)) || '%' AS price_str
    FROM orders
)
SELECT COUNT(*) FILTER (
    WHERE try_cast(regexp_replace(price_str, '[\\$%,]', '', 'g') AS DOUBLE)
          IS NOT NULL
      AND price_str IS NOT NULL
) AS number_parseable_count
FROM raw
"""


def quality_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate (partkey, suppkey) pairs in lineitem — the reference
    template with an explicit column_list."""
    li = load_table(spark, sf_dir, "lineitem")
    return quality.duplicate_detection(li, ["l_partkey", "l_suppkey"])


QUALITY_DUPLICATES_SQL = """
SELECT l_partkey, l_suppkey, COUNT(*) AS duplicate_count
FROM lineitem
GROUP BY l_partkey, l_suppkey
HAVING COUNT(*) > 1
ORDER BY duplicate_count DESC, l_partkey, l_suppkey
LIMIT 50
"""


def quality_approx_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.approximate_duplicates(
        load_table(spark, sf_dir, "documents")
    )


QUALITY_APPROX_DUPLICATES_SQL = """
SELECT COUNT(*) - COUNT(DISTINCT md5(
    CAST(doc_id AS VARCHAR) || chr(31) || text || chr(31) || lang
    || chr(31) || source || chr(31) || CAST(n_chars AS VARCHAR)
)) AS approximate_duplicates
FROM documents
"""


def quality_type_pollution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.type_pollution(
        load_table(spark, sf_dir, "documents"), "source"
    )


QUALITY_TYPE_POLLUTION_SQL = """
SELECT source AS value, COUNT(*) AS occurrence_count
FROM documents
WHERE try_cast(source AS DOUBLE) IS NULL AND source IS NOT NULL
GROUP BY source
ORDER BY occurrence_count DESC, value
LIMIT 10
"""


def quality_null_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality.null_like_values(
        load_table(spark, sf_dir, "documents"), "lang"
    )


QUALITY_NULL_LIKE_SQL = """
SELECT lang AS value, COUNT(*) AS occurrence_count
FROM documents
WHERE lower(trim(lang)) IN
    ('null','none','n/a','na','-','--','','#n/a','nan','missing')
GROUP BY lang
ORDER BY occurrence_count DESC, value
"""


def safe_type_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders re-read as all-string (a CSV-shaped bronze frame) →
    which columns can be safely coerced."""
    o = load_table(spark, sf_dir, "orders")
    as_str = o.select(
        F.col("o_orderkey").cast("string").alias("order_key"),
        F.col("o_totalprice").cast("string").alias("total_price"),
        F.col("o_orderstatus").alias("status"),
    )
    return coercion.recommend_types(as_str)


SAFE_TYPE_COERCION_SQL = """
WITH raw AS (
    SELECT CAST(o_orderkey AS VARCHAR) AS order_key,
           CAST(o_totalprice AS VARCHAR) AS total_price,
           o_orderstatus AS status
    FROM orders
),
analysis AS (
    SELECT 'order_key' AS column_name,
        COUNT(*) FILTER (WHERE order_key IS NOT NULL AND trim(order_key) != '') AS nn,
        COUNT(*) FILTER (WHERE regexp_matches(trim(order_key), '^-?[0-9]+$')) AS ints,
        COUNT(*) FILTER (WHERE regexp_matches(trim(order_key), '^-?[0-9]*\\.?[0-9]+([eE][+-]?[0-9]+)?$')) AS flts,
        COUNT(*) FILTER (WHERE lower(trim(order_key)) IN ('true','false')) AS bools,
        COUNT(*) FILTER (WHERE regexp_matches(trim(order_key), '^-?0[0-9]+')) AS lz
    FROM raw
    UNION ALL
    SELECT 'total_price',
        COUNT(*) FILTER (WHERE total_price IS NOT NULL AND trim(total_price) != ''),
        COUNT(*) FILTER (WHERE regexp_matches(trim(total_price), '^-?[0-9]+$')),
        COUNT(*) FILTER (WHERE regexp_matches(trim(total_price), '^-?[0-9]*\\.?[0-9]+([eE][+-]?[0-9]+)?$')),
        COUNT(*) FILTER (WHERE lower(trim(total_price)) IN ('true','false')),
        COUNT(*) FILTER (WHERE regexp_matches(trim(total_price), '^-?0[0-9]+'))
    FROM raw
    UNION ALL
    SELECT 'status',
        COUNT(*) FILTER (WHERE status IS NOT NULL AND trim(status) != ''),
        COUNT(*) FILTER (WHERE regexp_matches(trim(status), '^-?[0-9]+$')),
        COUNT(*) FILTER (WHERE regexp_matches(trim(status), '^-?[0-9]*\\.?[0-9]+([eE][+-]?[0-9]+)?$')),
        COUNT(*) FILTER (WHERE lower(trim(status)) IN ('true','false')),
        COUNT(*) FILTER (WHERE regexp_matches(trim(status), '^-?0[0-9]+'))
    FROM raw
)
SELECT column_name,
    CASE WHEN nn > 0 AND nn = bools THEN 'BOOLEAN'
         WHEN nn > 0 AND nn = ints AND lz = 0 THEN 'BIGINT'
         WHEN nn > 0 AND nn = flts AND lz = 0 THEN 'DOUBLE'
         ELSE NULL END AS recommended_type
FROM analysis
WHERE CASE WHEN nn > 0 AND nn = bools THEN 'BOOLEAN'
           WHEN nn > 0 AND nn = ints AND lz = 0 THEN 'BIGINT'
           WHEN nn > 0 AND nn = flts AND lz = 0 THEN 'DOUBLE'
           ELSE NULL END IS NOT NULL
"""


def flag_duplicates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-file duplicate flagging on a key subset, summarized."""
    li = load_table(spark, sf_dir, "lineitem")
    flagged = flag_duplicates(li, ["l_partkey", "l_suppkey"])
    return flagged.groupBy("is_duplicate_in_file").agg(
        F.count(F.lit(1)).alias("row_count")
    )


FLAG_DUPLICATES_SQL = """
WITH flagged AS (
    SELECT *,
        COUNT(*) OVER (PARTITION BY l_partkey, l_suppkey) AS grp_count,
        ROW_NUMBER() OVER (
            PARTITION BY l_partkey, l_suppkey ORDER BY l_partkey, l_suppkey
        ) AS rn
    FROM lineitem
)
SELECT (grp_count > 1 AND rn > 1) AS is_duplicate_in_file,
       COUNT(*) AS row_count
FROM flagged
GROUP BY 1
"""


def extract_currency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the agent's currency-symbol extraction: build
    '$1234.56' / 'EUR 1234.56' style strings, split back into numeric +
    value_type companion (DEMO.md §1 step 4)."""
    from biglake_iceberg_pipeline_spark.operators.cleaning import (
        extract_currency,
    )

    o = load_table(spark, sf_dir, "orders")
    price = F.format_string("%.2f", F.round("o_totalprice", 2))
    raw = (
        F.when(F.col("o_orderkey") % 4 == 0, F.concat(F.lit("$"), price))
        .when(F.col("o_orderkey") % 4 == 1, F.concat(F.lit("EUR "), price))
        .when(F.col("o_orderkey") % 4 == 2, F.concat(F.lit("£"), price))
        .otherwise(F.concat(F.lit("¥"), price))
    )
    df = o.withColumn("sale_price", raw)
    out = extract_currency(df, "sale_price")
    return out.select(
        "o_orderkey",
        "sale_price",
        F.col("sale_price_value_type").alias("value_type"),
        F.col("sale_price_clean").alias("price_value"),
    )


EXTRACT_CURRENCY_SQL = """
WITH raw AS (
    SELECT o_orderkey,
        CASE o_orderkey % 4
            WHEN 0 THEN '$' || printf('%.2f', ROUND(o_totalprice, 2))
            WHEN 1 THEN 'EUR ' || printf('%.2f', ROUND(o_totalprice, 2))
            WHEN 2 THEN '£' || printf('%.2f', ROUND(o_totalprice, 2))
            ELSE '¥' || printf('%.2f', ROUND(o_totalprice, 2))
        END AS sale_price
    FROM orders
)
SELECT o_orderkey, sale_price,
    CASE
        WHEN sale_price LIKE '$%' THEN 'dollars'
        WHEN sale_price LIKE 'EUR%' THEN 'euros'
        WHEN sale_price LIKE '£%' THEN 'pounds'
        WHEN sale_price LIKE '¥%' THEN 'yen'
        ELSE NULL END AS value_type,
    try_cast(regexp_replace(regexp_replace(trim(sale_price),
        '^(\\$|€|£|¥|EUR)\\s*', ''), ',', '', 'g') AS DOUBLE) AS price_value
FROM raw
"""


def clean_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite agent cleaning pass on documents: trim + sentinel-null
    + empty-string-null + unknown-char removal (B1-B3, B6)."""
    from biglake_iceberg_pipeline_spark.operators.cleaning import (
        clean_string,
        replace_unknown_chars,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        replace_unknown_chars(clean_string("text")).alias("text_clean"),
        clean_string("lang", case="lower").alias("lang_clean"),
        clean_string("source", case="lower").alias("source_clean"),
        "n_chars",
    )


CLEAN_DOCUMENTS_SQL = """
SELECT
    doc_id,
    replace(
        CASE WHEN lower(trim(text)) IN
            ('null','none','n/a','na','-','--','','#n/a','nan','missing')
        THEN NULL ELSE trim(text) END,
        chr(65533), '') AS text_clean,
    CASE WHEN lower(trim(lang)) IN
        ('null','none','n/a','na','-','--','','#n/a','nan','missing')
    THEN NULL ELSE lower(trim(lang)) END AS lang_clean,
    CASE WHEN lower(trim(source)) IN
        ('null','none','n/a','na','-','--','','#n/a','nan','missing')
    THEN NULL ELSE lower(trim(source)) END AS source_clean,
    n_chars
FROM documents
"""


def drop_empty_rows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empty-row elimination on documents (count retained)."""
    from biglake_iceberg_pipeline_spark.operators.cleaning import (
        drop_empty_rows,
    )

    docs = load_table(spark, sf_dir, "documents")
    return drop_empty_rows(docs, ["text", "lang", "source"]).agg(
        F.count(F.lit(1)).alias("non_empty_rows")
    )


DROP_EMPTY_ROWS_SQL = """
SELECT COUNT(*) AS non_empty_rows
FROM documents
WHERE (text IS NOT NULL AND trim(text) != '')
   OR (lang IS NOT NULL AND trim(lang) != '')
   OR (source IS NOT NULL AND trim(source) != '')
"""


QUERIES = {
    "profile_nulls": profile_nulls,
    "profile_column_stats": profile_column_stats,
    "profile_type_distribution": profile_type_distribution,
    "profile_date_potential": profile_date_potential,
    "profile_number_potential": profile_number_potential,
    "quality_duplicates": quality_duplicates,
    "quality_approx_duplicates": quality_approx_duplicates,
    "quality_type_pollution": quality_type_pollution,
    "quality_null_like": quality_null_like,
    "safe_type_coercion": safe_type_coercion,
    "flag_duplicates": flag_duplicates_q,
    "extract_currency": extract_currency_q,
    "clean_documents": clean_documents,
    "drop_empty_rows": drop_empty_rows_q,
}

ORACLE = {
    "profile_nulls": PROFILE_NULLS_SQL,
    "profile_column_stats": PROFILE_COLUMN_STATS_SQL,
    "profile_type_distribution": PROFILE_TYPE_DISTRIBUTION_SQL,
    "profile_date_potential": PROFILE_DATE_POTENTIAL_SQL,
    "profile_number_potential": PROFILE_NUMBER_POTENTIAL_SQL,
    "quality_duplicates": QUALITY_DUPLICATES_SQL,
    "quality_approx_duplicates": QUALITY_APPROX_DUPLICATES_SQL,
    "quality_type_pollution": QUALITY_TYPE_POLLUTION_SQL,
    "quality_null_like": QUALITY_NULL_LIKE_SQL,
    "safe_type_coercion": SAFE_TYPE_COERCION_SQL,
    "flag_duplicates": FLAG_DUPLICATES_SQL,
    "extract_currency": EXTRACT_CURRENCY_SQL,
    "clean_documents": CLEAN_DOCUMENTS_SQL,
    "drop_empty_rows": DROP_EMPTY_ROWS_SQL,
}
