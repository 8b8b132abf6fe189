"""Kafka-shaped streaming source.

The reference's event flow is push-based (GCS event → Eventarc →
Cloud Run, reference README architecture diagram); the Spark-native
equivalent at cluster scale is a Kafka topic read by Structured
Streaming. This container has no Kafka broker and no
spark-sql-kafka connector jar, so this module gives:

- ``kafka_stream``: the real connector call, gated behind a clear
  error when the jar is absent. On a cluster with the connector on
  the classpath it works as-is.
- ``kafka_shaped_stream``: a drop-in local simulator — a file stream
  whose schema is EXACTLY the Kafka source schema (key/value binary,
  topic, partition, offset, timestamp, timestampType). Pipelines are
  written against that schema once and swap constructors to go live.
- ``parse_json_values``: value bytes → typed columns via from_json,
  keeping (topic, partition, offset) for provenance/exactly-once
  bookkeeping downstream.

Scale notes: one Spark input partition per (topic-partition) — the
parallelism knob is the topic's partition count, not Spark conf;
``maxOffsetsPerTrigger`` bounds micro-batch size the way
``maxFilesPerTrigger`` does for file sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The exact schema Spark's Kafka source produces (column order kept).
KAFKA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Real Kafka source. Requires the spark-sql-kafka connector on
    the classpath (absent in this container — raises with guidance)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    try:
        return reader.load()
    except Exception as exc:  # connector jar absent
        raise RuntimeError(
            "Kafka connector not on classpath. Submit with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "or use kafka_shaped_stream() for a local file-backed stand-in."
        ) from exc


def kafka_shaped_stream(
    spark: SparkSession,
    dir_path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-backed stream with the Kafka source schema: each parquet
    file in ``dir_path`` plays one fetched batch of records."""
    return (
        spark.readStream.schema(KAFKA_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def write_kafka_shaped_batch(
    df: DataFrame,
    dir_path: str,
    topic: str,
    key_col: str,
    partitions: int = 4,
) -> None:
    """Encode a DataFrame as a Kafka-shaped parquet batch (test/demo
    producer): value = JSON bytes of the row, partition = hash(key) %
    partitions (Kafka's default partitioner shape), offset = row
    number within partition."""
    from pyspark.sql import Window

    w = Window.partitionBy("partition").orderBy("key")
    shaped = (
        df.select(
            F.col(key_col).cast("string").cast("binary").alias("key"),
            F.to_json(F.struct(*df.columns)).cast("binary").alias("value"),
        )
        .withColumn("topic", F.lit(topic))
        .withColumn(
            "partition",
            F.pmod(F.xxhash64("key"), F.lit(partitions)).cast("int"),
        )
        .withColumn("offset", F.row_number().over(w).cast("long") - 1)
        .withColumn("timestamp", F.current_timestamp())
        .withColumn("timestampType", F.lit(0))
    )
    shaped.select(*[f.name for f in KAFKA_SCHEMA.fields]).write.mode(
        "append"
    ).parquet(dir_path)


def parse_json_values(df: DataFrame, value_schema: str | T.StructType) -> DataFrame:
    """Decode Kafka value bytes as JSON into typed columns, keeping
    (topic, partition, offset, timestamp) for provenance."""
    parsed = df.withColumn(
        "__payload", F.from_json(F.col("value").cast("string"), value_schema)
    )
    return parsed.select(
        "topic", "partition", "offset", "timestamp", "__payload.*"
    )
