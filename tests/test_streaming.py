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
