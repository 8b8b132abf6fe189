"""Temporal join operators Spark lacks natively: as-of join, range
(interval) join, hypertable rollup.

The reference pipeline stores event streams (pipeline logger) and
time-stamped lakehouse tables; joining "latest state as of" and
"points within windows" are the two temporal shapes its SQL layers
reach for. Spark has no ASOF JOIN or interval join operator, and the
naive formulations (correlated subquery / non-equi theta join) plan as
BroadcastNestedLoopJoin — O(n·m) and a non-starter at 100 TB. These
implementations are compositions of shuffle-friendly primitives:

- ``asof_join``: union + last-observation-carried-forward window.
  ONE shuffle on the key; never materializes candidate pairs. The
  classic scalable as-of plan (same idea as pandas merge_asof, but
  distributed: partition by key, sort by time within partition).
- ``range_join``: bucketize time into fixed-width buckets, explode
  each interval to the buckets it covers, hash-join point-bucket to
  interval-bucket, then exact-filter. Candidate pairs ≈ matches when
  bucket width ≈ interval width, vs n·m for the nested-loop plan.
- ``hypertable_rollup``: multi-granularity time-bucketed aggregation
  in ONE shuffle (explode the granularity list per row, then a single
  partial-agg-friendly groupBy) — the TimescaleDB continuous-
  aggregate / materialized-rollup shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_side"
_SEQ = "__asof_seq"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with the same
    key whose ``right_ts`` <= ``left_ts`` (backward as-of, inclusive —
    DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts`` semantics).

    Plan: tag both sides, union, then per-key time-ordered window with
    ``last(payload, ignorenulls=True)`` carries the most recent right
    payload forward onto each left row. One hash shuffle on ``on``;
    within-partition sort; no pairwise candidate blowup. At 100 TB the
    key (user/entity id) is high-cardinality, so partitions stay
    balanced; a hot key would be handled by AQE skew splitting of the
    window sort's range partitions.

    Right rows sort BEFORE left rows at equal timestamps (inclusive
    match); ties among right rows at the same (key, ts) resolve to the
    row with the greatest payload struct (deterministic).
    """
    payload_cols = right_payload or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    payload = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_TAG),
        payload.alias("__payload"),
    )
    left_cols = left.columns
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_TAG),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__left"),
    )
    r = r.withColumn("__left", F.lit(None).cast(l.schema["__left"].dataType))
    unioned = r.unionByName(l)
    # right rows first on ts ties (_TAG 0 < 1); "__payload" max as the
    # final tiebreak keeps duplicate right timestamps deterministic.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col(_TAG), F.col("__payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).where(F.col(_TAG) == 1)
    out = carried.select(
        *[F.col(f"__left.{c}").alias(c) for c in left_cols],
        F.col(f"__match.{right_ts}").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_sec: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_ts <= point_ts <= end_ts`` (no equi-key required).

    Plan: quantize time into ``bucket_width_sec`` buckets; explode each
    interval onto the bucket range it covers (sequence() — JVM-side,
    no Python); hash-join on the bucket id; exact-filter the bounds.
    This turns a BroadcastNestedLoopJoin (O(points × intervals)) into
    one hash shuffle whose candidate count is |matches| + edge slop.
    Pick bucket_width ≈ typical interval length: shorter multiplies
    the interval explode factor, longer multiplies false candidates.
    Intervals spanning many buckets amortize: the explode is linear in
    covered buckets, and AQE rebalances any hot bucket.
    """
    pb = F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_width_sec)
    ib0 = F.floor(F.unix_timestamp(F.col(start_ts)) / bucket_width_sec)
    ib1 = F.floor(F.unix_timestamp(F.col(end_ts)) / bucket_width_sec)
    p = points.withColumn("__bucket", pb)
    i = intervals.withColumn(
        "__bucket", F.explode(F.sequence(ib0, ib1))
    )
    cond = (
        (p["__bucket"] == i["__bucket"])
        & (p[point_ts] >= i[start_ts])
        & (p[point_ts] <= i[end_ts])
    )
    joined = p.join(i, cond, how)
    return joined.drop(p["__bucket"]).drop(i["__bucket"])


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    granularities: list[str],
    aggs: list,
    keys: list[str] | None = None,
) -> DataFrame:
    """Aggregate at several time granularities in one pass (the
    hypertable / continuous-aggregate rollup: minute+hour+day rollups
    of the same stream).

    Plan: each row explodes to |granularities| (granularity,
    date_trunc(granularity, ts)) pairs, then a single groupBy. Spark
    applies map-side partial aggregation AFTER the explode, so the
    shuffle carries one partial row per (granularity, bucket, keys)
    per task — NOT |granularities| × |rows|. One shuffle total vs one
    per granularity for the UNION-of-groupBys plan.
    """
    gran_buckets = F.array(
        *[
            F.struct(
                F.lit(g).alias("granularity"),
                F.date_trunc(g, F.col(ts_col)).alias("bucket"),
            )
            for g in granularities
        ]
    )
    exploded = df.withColumn("__gb", F.explode(gran_buckets))
    group = [
        F.col("__gb.granularity").alias("granularity"),
        F.col("__gb.bucket").alias("bucket"),
    ] + [F.col(k) for k in (keys or [])]
    return exploded.groupBy(*group).agg(*aggs)


def hypertable_gapfill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Gap-filled per-key time buckets with LOCF — TimescaleDB's
    ``time_bucket_gapfill(...) + locf(...)`` as a composition of
    DataFrame ops (no generator UDF):

    1. bucket + aggregate (ONE fact shuffle on (key, bucket),
       map-side combined);
    2. per-key [min, max] bucket range (tiny agg on the already-small
       rollup) → ``sequence()`` + ``explode`` builds the dense spine
       JVM-side — spine size is range/bucket per key, independent of
       fact cardinality;
    3. left join rollup onto spine on (key, bucket) — both sides are
       bucket-grained, so this join is rollup-sized, never fact-sized;
    4. LOCF via ``last(value, ignorenulls=True)`` over the per-key
       ordered window; ``is_gap`` marks synthesized rows.

    The only window runs per key over bucket counts (bounded), not
    over raw events."""
    unit = bucket.split()[-1].rstrip("s")  # "1 hour" → "hour"
    b = F.date_trunc(unit, F.col(ts_col))
    rollup = (
        df.groupBy(F.col(key_col).alias("key"), b.alias("bucket"))
        .agg(
            F.round(F.sum(value_col), 2).alias("value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    spine = (
        rollup.groupBy("key")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {bucket}"))
            ).alias("bucket"),
        )
    )
    joined = spine.join(rollup, ["key", "bucket"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "key",
        "bucket",
        F.last("value", ignorenulls=True).over(w).alias("value_filled"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("value").isNull().alias("is_gap"),
    )
