"""Test-catalog loader for the driver's TPC-H-ish star schema.

Mirrors the reference's bronze-layer table registry (the loader service
creates one Iceberg table per inbox prefix; cf. reference
services/loader/bigquery_manager.py). Here each table is a parquet
dataset under a scale-factor directory.

Scan-side scale notes: parquet readers get filter/column pushdown for
free as long as callers keep plans declarative — operators in this repo
never call ``.collect()`` or ``.rdd`` on these frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H
# region/nation are constant-size; part/supplier/customer grow with SF but
# remain orders of magnitude below the fact tables — whether they are
# broadcast is left to AQE + autoBroadcastJoinThreshold, while the
# constant-size dims are force-broadcast by the plans that join them).
CONSTANT_DIMS = ("region", "nation")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet has shipped with two vintages of the ts column:
        # TIMESTAMP(MICROS) (current) and TIMESTAMP(NANOS) (legacy — the
        # Spark vectorized reader rejects nanos unless nanosAsLong is on).
        # Branch on the schema actually read so either layout works.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type.startswith("timestamp"):
            # Already a timestamp (micros vintage); normalize NTZ→TIMESTAMP
            # for oracle parity.
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        # Legacy nanos-as-long vintage: truncate to micros via integer DIV
        # (no double round-trip, so no precision loss on ~1.7e18 epochs).
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so plans can use spark.sql."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def corpus_cache_key(sf_dir: str, name: str = "documents"):
    """Process-local cache key for per-corpus artifacts (the shared
    pair-artifact / trained-model convention): identity is the
    corpus file's (abspath, mtime) so a changed corpus recomputes
    and two processes never share a stale artifact. Returns None
    when the file is unreadable — callers then skip caching. One
    implementation so the artifact caches can never drift on what
    'same corpus' means (r12 review)."""
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        return (os.path.abspath(path), os.path.getmtime(path))
    except OSError:
        return None
