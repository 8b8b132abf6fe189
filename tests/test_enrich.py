"""Stream enrichment against lakehouse dims (current + SCD2 as-of)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks import scd
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable
from biglake_iceberg_pipeline_spark.streaming.enrich import (
    start_enriched_sink,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def test_enrichment_sees_dim_updates_between_runs(spark, tmp_path):
    import datetime as dt

    d = str(tmp_path)
    dim = LakehouseTable(d + "/dim")
    scd.scd2_merge(
        spark,
        dim,
        spark.createDataFrame(
            [(1, "bronze"), (2, "gold")], "user_id long, tier string"
        ),
        ["user_id"],
        "2024-01-01 00:00:00",
    )

    inbox = d + "/inbox"
    os.makedirs(inbox)
    t = dt.datetime(2024, 3, 1)
    _write_batch(spark, inbox, [(1, 1, t, 5.0), (2, 2, t, 7.0)])

    events = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    q = start_enriched_sink(
        spark, events, dim, "user_id", "user_id",
        d + "/out", d + "/ckpt",
    )
    q.awaitTermination(180)
    out = LakehouseTable(d + "/out")
    tiers = {r["event_id"]: r["tier"] for r in out.read(spark).collect()}
    assert tiers == {1: "bronze", 2: "gold"}

    # dim changes; NEW events in a second run see the new version
    scd.scd2_merge(
        spark,
        dim,
        spark.createDataFrame([(1, "silver")], "user_id long, tier string"),
        ["user_id"],
        "2024-06-01 00:00:00",
    )
    t2 = dt.datetime(2024, 7, 1)
    _write_batch(spark, inbox, [(3, 1, t2, 9.0)])
    events2 = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(inbox)
    )
    q2 = start_enriched_sink(
        spark, events2, dim, "user_id", "user_id",
        d + "/out", d + "/ckpt",
    )
    q2.awaitTermination(180)
    tiers = {r["event_id"]: r["tier"] for r in out.read(spark).collect()}
    assert tiers == {1: "bronze", 2: "gold", 3: "silver"}


def test_enrichment_keeps_event_key_column(spark, tmp_path):
    """When event_key == join_key (the common case), the enriched
    output must keep the EVENT's key column — a name-based drop would
    remove both sides' columns."""
    import datetime as dt

    import pytest

    from biglake_iceberg_pipeline_spark.streaming.enrich import (
        enrich_stream_with_dim,
    )

    d = str(tmp_path)
    dim = LakehouseTable(d + "/dim")
    scd.scd2_merge(
        spark,
        dim,
        spark.createDataFrame([(1, "bronze")], "user_id long, tier string"),
        ["user_id"],
        "2024-01-01 00:00:00",
    )
    events = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 3, 1), 5.0), (2, 9, dt.datetime(2024, 3, 1), 7.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    enriched = enrich_stream_with_dim(
        events, spark, dim, "user_id", "user_id"
    )
    assert enriched.columns.count("user_id") == 1
    rows = {r["event_id"]: r for r in enriched.collect()}
    assert rows[1]["user_id"] == 1 and rows[1]["tier"] == "bronze"
    # unmatched event keeps its own key (left join), dim cols null
    assert rows[2]["user_id"] == 9 and rows[2]["tier"] is None

    # as-of path also keeps exactly one key column
    asof = enrich_stream_with_dim(
        events, spark, dim, "user_id", "user_id", event_ts_col="ts"
    )
    assert asof.columns.count("user_id") == 1
    assert {r["event_id"]: r["user_id"] for r in asof.collect()} == {1: 1, 2: 9}

    # as-of against a non-SCD2 dim is a usage error, not an
    # AttributeError deep in the join-condition build
    plain = LakehouseTable(d + "/plain")
    plain.append(
        spark.createDataFrame([(1, "x")], "user_id long, tier string")
    )
    with pytest.raises(ValueError, match="SCD2"):
        enrich_stream_with_dim(
            events, spark, plain, "user_id", "user_id", event_ts_col="ts"
        )


def test_enrichment_asof_event_time(spark, tmp_path):
    import datetime as dt

    d = str(tmp_path)
    dim = LakehouseTable(d + "/dim")
    scd.scd2_merge(
        spark,
        dim,
        spark.createDataFrame([(1, "bronze")], "user_id long, tier string"),
        ["user_id"],
        "2024-01-01 00:00:00",
    )
    scd.scd2_merge(
        spark,
        dim,
        spark.createDataFrame([(1, "silver")], "user_id long, tier string"),
        ["user_id"],
        "2024-06-01 00:00:00",
    )

    inbox = d + "/inbox"
    os.makedirs(inbox)
    # one event BEFORE the tier change, one after
    _write_batch(
        spark,
        inbox,
        [
            (1, 1, dt.datetime(2024, 3, 1), 1.0),
            (2, 1, dt.datetime(2024, 7, 1), 2.0),
        ],
    )
    events = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        )
        .parquet(inbox)
    )
    q = start_enriched_sink(
        spark, events, dim, "user_id", "user_id",
        d + "/out", d + "/ckpt",
        event_ts_col="ts",
    )
    q.awaitTermination(180)
    out = {r["event_id"]: r["tier"]
           for r in LakehouseTable(d + "/out").read(spark).collect()}
    # event-time-correct: March event sees bronze, July sees silver
    assert out == {1: "bronze", 2: "silver"}
