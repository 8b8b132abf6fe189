"""applyInPandasWithState custom stateful streaming operator test."""

from __future__ import annotations

from biglake_iceberg_pipeline_spark.streaming.stateful import (
    running_user_stats,
)


def test_running_user_stats_stream(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    df1 = spark.createDataFrame(
        [
            (1, "2020-01-01 00:00:00", 10.0),
            (1, "2020-01-01 00:05:00", 5.0),
            (2, "2020-01-01 00:01:00", 7.0),
        ],
        "user_id long, ts string, value double",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "value")
    df1.coalesce(1).write.parquet(str(src / "b1"))
    # second micro-batch exercises the state.exists continuation path
    df2 = spark.createDataFrame(
        [(1, "2020-01-01 00:10:00", 2.5), (2, "2020-01-01 00:12:00", None)],
        "user_id long, ts string, value double",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "value")
    df2.coalesce(1).write.parquet(str(src / "b2"))
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = running_user_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # ProcessingTimeTimeout makes the stateful operator report
    # "should run another batch" on every poll (pending timers), so
    # an availableNow query NEVER self-terminates — measured: batch
    # ids climb ~1.4/s indefinitely on empty input. The old
    # awaitTermination(180) burned its full timeout and then LEAKED
    # the still-active query, spinning empty micro-batches through
    # every later test in the suite. processAllAvailable cannot
    # latch either (each timer batch counts as progress). Poll the
    # sink for the final state instead, then stop explicitly.
    import time as _time

    def _snapshot():
        return {
            r["user_id"]: r
            for r in spark.sql(
                """SELECT * FROM (
                     SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY n_events DESC) rn
                     FROM user_stats WHERE status = 'active') WHERE rn = 1"""
            ).collect()
        }

    try:
        deadline = _time.time() + 120
        rows = _snapshot()
        while _time.time() < deadline and not (
            rows.get(1)
            and rows[1]["n_events"] == 3
            and rows.get(2)
            and rows[2]["n_events"] == 2
        ):
            _time.sleep(0.5)
            rows = _snapshot()
        assert rows[1]["n_events"] == 3
        assert rows[1]["total_value"] == 17.5
        assert rows[2]["n_events"] == 2
        assert rows[2]["total_value"] == 7.0  # NULL value treated as 0
        assert rows[1]["last_seen"].minute == 10
    finally:
        q.stop()


def test_orc_roundtrip(spark, tmp_path):
    from biglake_iceberg_pipeline_spark.sinks import export
    from biglake_iceberg_pipeline_spark.sources import readers

    df = spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) * 1.5 AS v")
    export.to_orc(df, str(tmp_path / "o"))
    back = readers.read_orc(spark, str(tmp_path / "o"))
    assert back.count() == 10
    assert dict(back.dtypes) == {"id": "bigint", "v": "double"}
