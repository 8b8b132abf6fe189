"""Kafka-shaped source: schema parity, produce/consume round-trip,
JSON value decoding, streaming consumption across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sources.catalog import load_table
from biglake_iceberg_pipeline_spark.sources.kafka import (
    KAFKA_SCHEMA,
    kafka_shaped_stream,
    kafka_stream,
    parse_json_values,
    write_kafka_shaped_batch,
)


def test_kafka_stream_raises_without_connector(spark):
    with pytest.raises(RuntimeError, match="kafka_shaped_stream"):
        kafka_stream(spark, "localhost:9092", "events")


def test_round_trip_preserves_rows_and_schema(spark, tmp_path, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).limit(200)
    topic_dir = str(tmp_path / "topic")
    write_kafka_shaped_batch(ev, topic_dir, "events", key_col="event_id")

    raw = spark.read.parquet(topic_dir)
    assert raw.schema == KAFKA_SCHEMA
    assert raw.count() == 200
    # partitions look like Kafka's default partitioner output
    parts = [r.partition for r in raw.select("partition").distinct().collect()]
    assert all(0 <= p < 4 for p in parts)
    # offsets are dense per partition starting at 0
    per_part = (
        raw.groupBy("partition")
        .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"),
             F.count("*").alias("n"))
        .collect()
    )
    for r in per_part:
        assert r.lo == 0 and r.n == r.hi + 1

    decoded = parse_json_values(
        raw, "event_id long, event_type string, value double"
    )
    got = {r.event_id: (r.event_type, r.value) for r in decoded.collect()}
    want = {r.event_id: (r.event_type, r.value) for r in ev.collect()}
    assert got == want


def test_streaming_consume_across_micro_batches(spark, tmp_path, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    topic_dir = str(tmp_path / "topic")
    # two produced batches → two files → two micro-batches
    write_kafka_shaped_batch(ev.limit(100), topic_dir, "events", "event_id")
    write_kafka_shaped_batch(
        ev.orderBy(F.desc("event_id")).limit(100), topic_dir, "events",
        "event_id",
    )
    stream = kafka_shaped_stream(spark, topic_dir, max_files_per_trigger=1)
    counts = parse_json_values(
        stream, "event_id long, event_type string, value double"
    ).groupBy("event_type").agg(F.count("*").alias("n"))
    q = (
        counts.writeStream.format("memory")
        .queryName("kafka_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = {
        r.event_type: r.n
        for r in spark.sql("select * from kafka_counts").collect()
    }
    assert sum(got.values()) == 200 and len(got) > 1
