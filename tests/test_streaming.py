"""Structured Streaming tests: file-source ingest end-to-end, streaming
windowed aggregation, and watermark dedup."""

from __future__ import annotations

import os

from biglake_iceberg_pipeline_spark.streaming import aggregations, ingest


def test_streaming_ingest_end_to_end(spark, tmp_path):
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    inbox.mkdir()
    (inbox / "batch1.csv").write_text(
        "Order ID,Customer Name,amount\n1,  alice  ,10.5\n2,N/A,20.0\n"
    )
    (inbox / "batch2.csv").write_text(
        "Order ID,Customer Name,amount\n3,bob,30.0\n"
    )
    q = ingest.start_ingest(
        spark,
        str(inbox),
        str(out),
        str(ckpt),
        schema="`Order ID` long, `Customer Name` string, amount double",
    )
    q.awaitTermination(120)
    result = spark.read.parquet(str(out))
    rows = {r["order_id"]: r for r in result.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["customer_name"] == "alice"  # trimmed
    assert rows[2]["customer_name"] is None  # sentinel → NULL
    assert "processed_at" in result.columns


def test_streaming_ingest_auto_refreshes_gold_view(spark, tmp_path):
    """Fully event-driven gold: streaming ingest commits to a
    lakehouse table whose post-commit hook refreshes a materialized
    view — after the stream drains, gold reflects every micro-batch
    with NO explicit refresh call."""
    from pyspark.sql import functions as F

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )
    from biglake_iceberg_pipeline_spark.sinks.matview import (
        MaterializedView,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "b1.csv").write_text(
        "Order ID,Amount\n1,10.0\n2,20.0\n"
    )
    (inbox / "b2.csv").write_text("Order ID,Amount\n3,30.0\n")
    table = LakehouseTable(str(tmp_path / "bronze"))
    mv = MaterializedView(
        spark,
        "revenue",
        table,
        lambda df: df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amount").alias("revenue"),
        ),
        str(tmp_path / "gold_revenue"),
    ).auto_refresh_on_commit()
    q = ingest.start_ingest_to_lakehouse(
        spark,
        str(inbox),
        str(tmp_path / "bronze"),
        str(tmp_path / "ckpt"),
        schema="`Order ID` long, Amount double",
        table=table,
    )
    q.awaitTermination(120)
    assert mv.is_fresh()
    row = mv.read().collect()[0]
    assert row["n"] == 3 and row["revenue"] == 60.0


def test_streaming_windowed_agg_matches_batch(spark, tmp_path, sf_dir):
    """The same windowed plan over a stream of the events table must
    equal the batch result (exactly-once, availableNow drain)."""
    from biglake_iceberg_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    src = tmp_path / "events_parquet"
    ev.write.parquet(str(src))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = aggregations.windowed_event_counts(
        stream, "ts", "event_type", "1 hour", watermark="2 hours"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in aggregations.windowed_event_counts(ev).collect()
    }
    assert got == want


def test_dedup_within_watermark_batch_fallback(spark):
    df = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00"), (1, "2020-01-01 00:10:00")],
        "id long, ts string",
    ).selectExpr("id", "CAST(ts AS TIMESTAMP) ts")
    out = ingest.dedup_within_watermark(df, ["id"], "ts")
    assert out.count() == 1


def test_pipeline_log(spark):
    df = spark.range(5)
    log = ingest.pipeline_log(df, "LOAD_REQUEST").collect()[0]
    assert log["event"] == "LOAD_REQUEST"
    assert log["n_rows"] == 5


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """session_window in append-mode streaming (watermark-flushed)
    produces the same sessions as the batch plan."""
    from biglake_iceberg_pipeline_spark.streaming.aggregations import (
        sessionize,
    )

    rows = [
        # user 1: two sessions separated by a 2-hour gap
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:05:00", 1.0),
        (1, "2024-01-01 12:30:00", 1.0),
        # sentinel far in the future advances the watermark so the
        # real sessions flush in append mode
        (99, "2025-01-01 00:00:00", 0.0),
    ]
    src = tmp_path / "sess_src"
    src.mkdir()
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "value")
    df.coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(str(src / "*"))
    out = sessionize(
        stream.withWatermark("ts", "1 minute"), "ts", "user_id", "30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["last_event"], r["n_events"])
        for r in spark.sql(
            "SELECT * FROM sess_stream WHERE user_id = 1"
        ).collect()
    }
    batch = {
        (r["user_id"], r["session_start"], r["last_event"], r["n_events"])
        for r in sessionize(df.where("user_id = 1"), "ts", "user_id", "30 minutes").collect()
    }
    assert got == batch
    assert len(got) == 2


def test_stream_stream_attribution_matches_batch(spark, tmp_path, sf_dir):
    """The SAME attribute_purchases() plan as a watermarked
    stream-stream join over file streams must produce exactly the
    batch pairs (availableNow drain; 2 files per side so the join
    crosses micro-batches)."""
    from pyspark.sql import functions as F

    from biglake_iceberg_pipeline_spark.sources.catalog import load_table
    from biglake_iceberg_pipeline_spark.streaming.joins import (
        attribute_purchases,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id", "event_type", "value")
    views_dir, buys_dir = str(tmp_path / "views"), str(tmp_path / "buys")
    views_b = ev.where(F.col("event_type") == "view")
    buys_b = ev.where(F.col("event_type") == "purchase")
    views_b.repartition(2).write.parquet(views_dir)
    buys_b.repartition(2).write.parquet(buys_dir)

    schema = "ts timestamp, user_id long, event_type string, value double"

    def stream(d):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .withWatermark("ts", "2 hours")
        )

    pairs = attribute_purchases(stream(views_dir), stream(buys_dir), "1 hour")
    q = (
        pairs.writeStream.format("memory")
        .queryName("attr_pairs")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(240)
    got = spark.sql(
        "select user_id, view_ts, purchase_ts from attr_pairs"
    ).collect()
    want = attribute_purchases(views_b, buys_b, "1 hour").select(
        "user_id", "view_ts", "purchase_ts"
    ).collect()
    key = lambda r: (r.user_id, r.view_ts, r.purchase_ts)
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(want) > 0


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    """Exactly-once across restarts: drain a file stream with
    availableNow, add more input, restart from the SAME checkpoint —
    the sink must contain every row exactly once (no replay of batch
    1, no loss of batch 2). This is the recovery contract the
    reference delegates to its Firestore duplicate registry; here the
    streaming checkpoint carries it."""
    import pyspark.sql.functions as F

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def run_once():
        stream = (
            spark.readStream.schema("id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            stream.withColumn("doubled", F.col("id") * 2)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    import pandas as pd

    pd.DataFrame({"id": range(0, 5)}).to_parquet(src / "a.parquet")
    run_once()
    first = spark.read.parquet(str(out)).count()
    assert first == 5
    pd.DataFrame({"id": range(5, 12)}).to_parquet(src / "b.parquet")
    run_once()
    rows = sorted(r.id for r in spark.read.parquet(str(out)).collect())
    assert rows == list(range(12))  # each exactly once, none replayed
