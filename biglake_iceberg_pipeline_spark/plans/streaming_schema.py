"""Event-stream analytics (batch-equivalent of the streaming plans)
and schema-management queries.

events_windowed / events_sessions run the exact same DataFrame code a
readStream would (streaming/aggregations.py) — batch mode here so the
driver's oracle can check the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.schema_evolution import (
    compare_schemas,
)
from biglake_iceberg_pipeline_spark.sources.catalog import load_table
from biglake_iceberg_pipeline_spark.streaming.aggregations import (
    user_session_summary,
    windowed_event_counts,
)


def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return windowed_event_counts(ev, "ts", "event_type", "1 hour")


EVENTS_WINDOWED_SQL = """
SELECT
    CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
    event_type,
    COUNT(*) AS n_events,
    ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return user_session_summary(ev, "ts", "user_id", "30 minutes")


EVENTS_SESSIONS_SQL = """
WITH ordered AS (
    SELECT user_id, ts,
        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                  >= INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS brk
    FROM events
),
sessions AS (
    SELECT user_id,
        CAST(SUM(brk) OVER (
            PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
        ) AS BIGINT) AS sid
    FROM ordered
),
per_session AS (
    SELECT user_id, sid, COUNT(*) AS n FROM sessions GROUP BY 1, 2
)
SELECT user_id,
    COUNT(*) AS n_sessions,
    MAX(n) AS max_session_events,
    CAST(SUM(n) AS BIGINT) AS total_events
FROM per_session
GROUP BY user_id
"""


def compare_schemas_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema drift between the current customer table and an evolved
    incoming batch (acctbal restringified + a new column) — the
    loader's pre-append check (compare_schemas.sql)."""
    cust = load_table(spark, sf_dir, "customer")
    incoming = cust.withColumn(
        "c_acctbal", F.col("c_acctbal").cast("string")
    ).withColumn("loyalty_tier", F.lit(42).cast("long"))
    return compare_schemas(spark, cust, incoming)


COMPARE_SCHEMAS_SQL = """
WITH schema_a AS (
    SELECT column_name, column_type FROM (DESCRIBE SELECT * FROM customer)
),
schema_b AS (
    SELECT column_name, column_type FROM (
        DESCRIBE SELECT * REPLACE (CAST(c_acctbal AS VARCHAR) AS c_acctbal),
                 CAST(42 AS BIGINT) AS loyalty_tier
        FROM customer
    )
)
SELECT
    COALESCE(a.column_name, b.column_name) AS column_name,
    a.column_type AS type_in_a,
    b.column_type AS type_in_b,
    CASE
        WHEN a.column_name IS NULL THEN 'added'
        WHEN b.column_name IS NULL THEN 'removed'
        WHEN a.column_type != b.column_type THEN 'type_changed'
        ELSE 'unchanged'
    END AS change_type
FROM schema_a a
FULL OUTER JOIN schema_b b ON a.column_name = b.column_name
WHERE a.column_name IS NULL OR b.column_name IS NULL
   OR a.column_type != b.column_type
ORDER BY change_type, column_name
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the semi-structured props JSON column
    (the agent's JSON-ingestion role on nested payloads). from_json
    with an explicit schema is JVM-side and codegen'd — no Python in
    the path; at 100 TB the parse cost is the scan cost."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k INT").getField("k").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n_with_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


EVENTS_JSON_EXTRACT_SQL = """
SELECT
    event_type,
    COUNT(json_extract(props, '$.k')) AS n_with_k,
    ROUND(AVG(json_extract(props, '$.k')::INT), 4) AS avg_k,
    MAX(json_extract(props, '$.k')::INT) AS max_k
FROM events
GROUP BY event_type
"""


def describe_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema description of the customer table (reference
    sql/schema/describe_table.sql) — pure metadata, no scan."""
    from biglake_iceberg_pipeline_spark.operators.schema_evolution import (
        describe_table,
    )

    return describe_table(spark, load_table(spark, sf_dir, "customer"))


DESCRIBE_CUSTOMER_SQL = """
SELECT
    column_name,
    column_type,
    CASE WHEN "null" = 'YES' THEN true ELSE false END AS is_nullable
FROM (DESCRIBE SELECT * FROM customer)
"""


QUERIES = {
    "events_windowed": events_windowed,
    "events_sessions": events_sessions,
    "compare_schemas": compare_schemas_q,
    "describe_customer": describe_customer,
    "events_json_extract": events_json_extract,
}

ORACLE = {
    "events_windowed": EVENTS_WINDOWED_SQL,
    "events_sessions": EVENTS_SESSIONS_SQL,
    "compare_schemas": COMPARE_SCHEMAS_SQL,
    "describe_customer": DESCRIBE_CUSTOMER_SQL,
    "events_json_extract": EVENTS_JSON_EXTRACT_SQL,
}
