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
    hypertable_gapfill,
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


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase on first-occurrence
    times: a user reaches step k only if their first step-k event is
    at-or-after their first step-(k−1) event. ONE shuffle (user_id),
    conditional-min partial aggs map-side, then a 3-row unpivot —
    the per-user event timeline never materializes."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t2"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t3"
        ),
    )
    r1 = F.col("t1").isNotNull()
    r2 = r1 & F.col("t2").isNotNull() & (F.col("t2") >= F.col("t1"))
    r3 = r2 & F.col("t3").isNotNull() & (F.col("t3") >= F.col("t2"))
    flags = per_user.select(
        r1.cast("long").alias("s1"),
        r2.cast("long").alias("s2"),
        r3.cast("long").alias("s3"),
    ).agg(
        F.sum("s1").alias("view"),
        F.sum("s2").alias("click"),
        F.sum("s3").alias("purchase"),
    )
    return flags.selectExpr(
        "stack(3, 'view', view, 'click', click, 'purchase', purchase) "
        "as (step, n_users)"
    )


EVENTS_FUNNEL_SQL = """
WITH per_user AS (
    SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
        MIN(CASE WHEN event_type = 'click' THEN ts END) AS t2,
        MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
    FROM events GROUP BY user_id
),
flags AS (
    SELECT
        (t1 IS NOT NULL) AS r1,
        (t1 IS NOT NULL AND t2 IS NOT NULL AND t2 >= t1) AS r2,
        (t1 IS NOT NULL AND t2 IS NOT NULL AND t2 >= t1
         AND t3 IS NOT NULL AND t3 >= t2) AS r3
    FROM per_user
)
SELECT 'view' AS step, COUNT(CASE WHEN r1 THEN 1 END) AS n_users FROM flags
UNION ALL
SELECT 'click', COUNT(CASE WHEN r2 THEN 1 END) FROM flags
UNION ALL
SELECT 'purchase', COUNT(CASE WHEN r3 THEN 1 END) FROM flags
"""


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-type event value series with gaps filled and LOCF —
    the continuous-aggregate read path a dashboard would hit."""
    ev = load_table(spark, sf_dir, "events")
    return hypertable_gapfill(
        ev, "ts", "event_type", "value", "1 hour"
    ).orderBy("key", "bucket")


EVENTS_GAPFILL_SQL = """
WITH rollup AS (
    SELECT event_type AS key, date_trunc('hour', ts) AS bucket,
           ROUND(SUM(value), 2) AS value, COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
),
spine AS (
    SELECT key, unnest(generate_series(MIN(bucket), MAX(bucket),
                                       INTERVAL 1 HOUR)) AS bucket
    FROM rollup GROUP BY key
)
SELECT spine.key AS key, spine.bucket AS bucket,
    last_value(rollup.value IGNORE NULLS) OVER (
        PARTITION BY spine.key ORDER BY spine.bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS value_filled,
    COALESCE(rollup.n_events, 0) AS n_events,
    rollup.value IS NULL AS is_gap
FROM spine
LEFT JOIN rollup ON spine.key = rollup.key AND spine.bucket = rollup.bucket
ORDER BY key, bucket
"""


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of the stream-stream attribution join
    (streaming/joins.py): per user, how many view→purchase pairs
    land within an hour, over how many distinct purchases."""
    from biglake_iceberg_pipeline_spark.streaming.joins import (
        attribute_purchases,
    )

    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view")
    purchases = ev.where(F.col("event_type") == "purchase")
    pairs = attribute_purchases(views, purchases, "1 hour")
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("purchase_ts").alias("n_purchases"),
            F.round(F.sum("purchase_value"), 2).alias("paired_value"),
        )
        .orderBy("user_id")
    )


EVENTS_ATTRIBUTION_SQL = """
SELECT v.user_id AS user_id, COUNT(*) AS n_pairs,
       COUNT(DISTINCT p.ts) AS n_purchases,
       ROUND(SUM(p.value), 2) AS paired_value
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
GROUP BY v.user_id
ORDER BY user_id
"""


QUERIES = {
    "asof_last_purchase": asof_last_purchase,
    "range_join_incidents": range_join_incidents,
    "events_hypertable_rollup": events_hypertable_rollup,
    "events_funnel": events_funnel,
    "events_gapfill": events_gapfill,
    "events_attribution": events_attribution,
}

ORACLE = {
    "asof_last_purchase": ASOF_LAST_PURCHASE_SQL,
    "range_join_incidents": RANGE_JOIN_INCIDENTS_SQL,
    "events_hypertable_rollup": EVENTS_HYPERTABLE_ROLLUP_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_gapfill": EVENTS_GAPFILL_SQL,
    "events_attribution": EVENTS_ATTRIBUTION_SQL,
}
