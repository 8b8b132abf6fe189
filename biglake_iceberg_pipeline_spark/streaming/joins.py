"""Stream-stream joins: interval-bounded event attribution.

The reference's event flow correlates pipeline events after the fact
(logger service queries); the Spark-native form is a stream-stream
join — and because Spark unifies batch and streaming plans, the SAME
function serves both: batch DataFrames replay history, streaming
DataFrames run live.

Scale/state notes (the part that matters at 100 TB/day): an
unbounded stream-stream join would buffer both sides forever. The
interval condition (purchase within ``gap`` after view) plus
watermarks on BOTH inputs lets Spark bound the join state: each
side's buffer holds only rows inside watermark + gap, evicted as the
watermark advances. Callers attach ``withWatermark`` before calling
(streaming only); the time-bound predicate here is what makes that
eviction legal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    views: DataFrame,
    purchases: DataFrame,
    gap: str = "1 hour",
) -> DataFrame:
    """Pair each purchase with every view by the same user in the
    ``gap`` window before it (marketing attribution shape). Returns
    (user_id, view_ts, purchase_ts, value) pairs; aggregate
    downstream as needed. Equi-key on user_id carries the join —
    the interval bound is a post-filter on the matched pairs, so the
    plan is a hash join, never a nested loop."""
    v = views.select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (v.v_user == p.p_user)
        & (p.purchase_ts >= v.view_ts)
        & (p.purchase_ts <= v.view_ts + F.expr(f"INTERVAL {gap}"))
    )
    return v.join(p, cond).select(
        F.col("v_user").alias("user_id"),
        "view_ts",
        "purchase_ts",
        "purchase_value",
    )
