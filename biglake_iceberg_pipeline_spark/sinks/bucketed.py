"""Bucketed managed-table writes for shuffle-free co-located joins.

The reference's silver tables are repeatedly joined on their natural
keys (orders×order_items on order_id, everything×users on user_id —
test_data/thelook_ecommerce/silver/). At 100 TB, re-shuffling both
fact tables for every such join dominates job time. Hive-style
bucketing pre-partitions data on disk by key hash: two tables bucketed
on the same key with the same bucket count join with ZERO Exchange —
each task reads matching bucket files from both sides.

``write_bucketed`` persists a DataFrame as a bucketed (optionally
sorted — sorted buckets also drop the join's Sort) managed parquet
table; ``read_table`` returns it with bucket metadata intact (only
``spark.table`` preserves bucketing — reading the parquet path
directly loses it).

This is the static counterpart to AQE: pay one shuffle at write time,
then every downstream key-join is narrow. Bucket count is fixed at
write time — size it so one bucket ≈ 100-500 MB at the target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
