"""Temporal analytics over the events stream: as-of join, interval
(range) join, multi-granularity hypertable rollup.

These exercise the custom operators in operators/temporal.py against
the driver tables with independent DuckDB oracles (native ASOF JOIN /
theta join / UNION-of-groupbys — different algorithms than our
distributed plans, so agreement is a real check, not an echo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.temporal import (
    asof_join,
    hypertable_rollup,
    range_join,
)
from biglake_iceberg_pipeline_spark.sources.catalog import load_table


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach each user's most recent at-or-before purchase to every
    event (state-as-of lookup). One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts_asof").alias("last_purchase_ts"),
        F.col("value_asof").alias("last_purchase_value"),
    )


ASOF_LAST_PURCHASE_SQL = """
SELECT
    e.event_id,
    e.user_id,
    e.event_type,
    CAST(p.ts AS TIMESTAMP) AS last_purchase_ts,
    p.value AS last_purchase_value
FROM events e
ASOF LEFT JOIN (
    SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def range_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity inside each error-incident window (error ts ± 10 min),
    across ALL users — a genuinely non-equi interval join. Bucketized
    to a hash join (bucket = window width) instead of the
    nested-loop plan a raw BETWEEN join would produce."""
    ev = load_table(spark, sf_dir, "events")
    incidents = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        (F.col("ts") - F.expr("INTERVAL 10 MINUTES")).alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    points = ev.select("ts", "value")
    joined = range_join(
        points, incidents, "ts", "w_start", "w_end", bucket_width_sec=600
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


RANGE_JOIN_INCIDENTS_SQL = """
WITH incidents AS (
    SELECT event_id AS incident_id,
           ts - INTERVAL 10 MINUTE AS w_start,
           ts + INTERVAL 10 MINUTE AS w_end
    FROM events WHERE event_type = 'error'
)
SELECT
    incident_id,
    COUNT(*) AS n_events,
    ROUND(SUM(e.value), 2) AS total_value
FROM incidents i
JOIN events e ON e.ts >= i.w_start AND e.ts <= i.w_end
GROUP BY incident_id
"""


def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour + day + week rollups of the event stream per event_type in
    one shuffle (continuous-aggregate shape)."""
    ev = load_table(spark, sf_dir, "events")
    return hypertable_rollup(
        ev,
        "ts",
        ["hour", "day", "week"],
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        ],
        keys=["event_type"],
    )


EVENTS_HYPERTABLE_ROLLUP_SQL = """
SELECT 'hour' AS granularity,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
       event_type, COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day', CAST(date_trunc('day', ts) AS TIMESTAMP), event_type,
       COUNT(*), ROUND(SUM(value), 2)
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'week', CAST(date_trunc('week', ts) AS TIMESTAMP), event_type,
       COUNT(*), ROUND(SUM(value), 2)
FROM events GROUP BY 2, 3
"""


QUERIES = {
    "asof_last_purchase": asof_last_purchase,
    "range_join_incidents": range_join_incidents,
    "events_hypertable_rollup": events_hypertable_rollup,
}

ORACLE = {
    "asof_last_purchase": ASOF_LAST_PURCHASE_SQL,
    "range_join_incidents": RANGE_JOIN_INCIDENTS_SQL,
    "events_hypertable_rollup": EVENTS_HYPERTABLE_ROLLUP_SQL,
}
