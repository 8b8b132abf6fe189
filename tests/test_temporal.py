"""Edge cases for the temporal operators (as-of, range join, rollup).

The oracle queries (tests/test_entry.py) check bulk agreement with
DuckDB; these pin the semantics the bulk data doesn't exercise:
boundary inclusivity, ties, empty match sets, multi-bucket intervals.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.temporal import (
    asof_join,
    hypertable_rollup,
    range_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_basic_and_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 12:00:00"), "b"),
            (2, _ts("2024-01-01 09:00:00"), "c"),
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),  # equal ts: matches "a"
            (1, _ts("2024-01-01 11:00:00"), 200.0),
            (2, _ts("2024-01-01 09:30:00"), 300.0),  # after left: no match
        ],
        "k long, ts timestamp, v double",
    )
    rows = {
        r["tag"]: r
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts"
        ).collect()
    }
    assert rows["a"]["v_asof"] == 100.0  # inclusive: ts == ts matches
    assert rows["b"]["v_asof"] == 200.0  # latest at-or-before wins
    assert rows["c"]["v_asof"] is None  # only future right rows
    assert rows["b"]["ts_asof"] == _ts("2024-01-01 11:00:00")


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"))], "k long, ts timestamp"
    )
    right = spark.createDataFrame([], "k long, ts timestamp, v double")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts")
    row = out.collect()[0]
    assert row["v_asof"] is None
    assert out.count() == 1  # left rows always survive


def test_range_join_boundaries_and_multibucket(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),  # == start: in
            (2, _ts("2024-01-01 10:30:00")),  # inside
            (3, _ts("2024-01-01 11:00:00")),  # == end: in
            (4, _ts("2024-01-01 11:00:01")),  # one past end: out
            (5, _ts("2024-01-01 09:59:59")),  # one before start: out
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"))],
        "iid long, w_start timestamp, w_end timestamp",
    )
    # bucket (60s) much smaller than the interval => multi-bucket explode
    out = range_join(points, intervals, "ts", "w_start", "w_end", 60)
    assert sorted(r["pid"] for r in out.collect()) == [1, 2, 3]
    # bucket much larger than the interval => single-bucket path
    out2 = range_join(points, intervals, "ts", "w_start", "w_end", 86400)
    assert sorted(r["pid"] for r in out2.collect()) == [1, 2, 3]


def test_range_join_no_match_inner_empty(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-06-01 00:00:00"))], "pid long, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [(7, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "iid long, w_start timestamp, w_end timestamp",
    )
    assert range_join(points, intervals, "ts", "w_start", "w_end", 3600).count() == 0


def test_hypertable_rollup_counts(spark):
    df = spark.createDataFrame(
        [
            (_ts("2024-01-01 10:15:00"), 1.0),
            (_ts("2024-01-01 10:45:00"), 2.0),
            (_ts("2024-01-01 23:45:00"), 4.0),
            (_ts("2024-01-02 00:15:00"), 8.0),
        ],
        "ts timestamp, v double",
    )
    out = hypertable_rollup(
        df, "ts", ["hour", "day"], [F.sum("v").alias("s")]
    )
    rows = {
        (r["granularity"], r["bucket"]): r["s"] for r in out.collect()
    }
    assert rows[("hour", _ts("2024-01-01 10:00:00"))] == 3.0
    assert rows[("day", _ts("2024-01-01 00:00:00"))] == 7.0
    assert rows[("day", _ts("2024-01-02 00:00:00"))] == 8.0
    assert len([k for k in rows if k[0] == "hour"]) == 3


def test_gapfill_fills_missing_buckets_with_locf(spark):
    from datetime import datetime

    from biglake_iceberg_pipeline_spark.operators.temporal import (
        hypertable_gapfill,
    )

    rows = [
        ("a", datetime(2024, 1, 1, 0, 30), 10.0),
        ("a", datetime(2024, 1, 1, 3, 10), 40.0),  # hours 1,2 missing
        ("b", datetime(2024, 1, 1, 5, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = hypertable_gapfill(df, "ts", "k", "value", "1 hour")
    got = {
        (r.key, r.bucket.hour): (r.value_filled, r.n_events, r.is_gap)
        for r in out.collect()
    }
    assert len(got) == 5  # a: hours 0-3 dense, b: hour 5 only
    assert got[("a", 0)] == (10.0, 1, False)
    assert got[("a", 1)] == (10.0, 0, True)  # LOCF carries hour 0
    assert got[("a", 2)] == (10.0, 0, True)
    assert got[("a", 3)] == (40.0, 1, False)
    assert got[("b", 5)] == (7.0, 1, False)
