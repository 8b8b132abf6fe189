"""Windowed event aggregations (batch + Structured Streaming).

Parity: the reference's event flow (Eventarc → Pub/Sub → logger) and
the gold daily_sales date-grain rollup, re-expressed as Spark windowed
aggregation. The same plan runs in batch (driver tables) and streaming
(readStream) mode — that symmetry is the point of Structured
Streaming.

Scale: tumbling windows are a single shuffle keyed on (window, key);
the watermark bounds state so a 100 TB/day stream holds only
(watermark / window) * |keys| aggregation state per executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts + value sums per key. Pass ``watermark``
    when ``df`` is streaming (bounds late-data state)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessions per user via native session_window (merges
    events whose timestamps are within ``gap`` of the running window).

    Works unchanged on a streaming frame (add a watermark first). One
    shuffle on (user, session-window merge key).
    """
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("last_event"),
        )
        .select(
            user_col, "session_start", "last_event", "n_events"
        )
    )


def user_session_summary(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-user session rollup (sessions count, busiest session)."""
    s = sessionize(df, ts_col, user_col, gap)
    return s.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("total_events"),
    )
