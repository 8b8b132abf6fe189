"""SCD Type 2 (slowly changing dimension) merge for lakehouse tables.

Parity: the reference loader upserts dimension tables in place
(bigquery_manager.py create-or-append + MERGE); warehouse practice for
dimensions whose history matters is SCD2 — instead of overwriting a
changed row, CLOSE the current version (stamp ``valid_to``) and insert
a new current one. Downstream as-of joins (operators/temporal.py) then
reconstruct the dimension as of any event time.

Plan shape: one shuffle on the business key joining current rows to
the source; changed/new detection is a row-compare in that join;
history rows (already closed) pass through untouched. Copy-on-write
snapshot commit, same concurrency rules as merge (stale base raises).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable

VALID_FROM = "__valid_from"
VALID_TO = "__valid_to"
IS_CURRENT = "__is_current"


def _stamp(df: DataFrame, effective_ts: str) -> DataFrame:
    return df.select(
        "*",
        F.lit(effective_ts).cast("timestamp").alias(VALID_FROM),
        F.lit(None).cast("timestamp").alias(VALID_TO),
        F.lit(True).alias(IS_CURRENT),
    )


def scd2_merge(
    spark: SparkSession,
    table: LakehouseTable,
    source: DataFrame,
    keys: list[str],
    effective_ts: str,
) -> int:
    """Fold ``source`` (the new truth for its keys) into an SCD2
    dimension table at ``effective_ts``:

    - new key → insert as current
    - existing key, any non-key column changed → close the current row
      (``valid_to = effective_ts``) and insert the new version
    - existing key, unchanged → untouched (no spurious versions)
    - keys absent from source → untouched (partial feeds are fine)

    First call on an empty table seeds every row as current.
    """
    dup = source.groupBy(*keys).count().where(F.col("count") > 1).limit(1)
    if dup.count() > 0:
        raise ValueError(f"source has duplicate keys on {keys}")
    if table.current_snapshot_id() is None:
        return table.append(_stamp(source, effective_ts))

    base = table.current_snapshot_id()
    existing = table.read(spark)
    data_cols = [c for c in source.columns if c not in keys]
    current = existing.where(F.col(IS_CURRENT))
    history = existing.where(~F.col(IS_CURRENT))

    src = _stamp(source, effective_ts)
    # Null-safe row compare on tracked columns decides "changed".
    changed_pred = F.lit(False)
    for c in data_cols:
        changed_pred = changed_pred | ~F.col(f"cur.{c}").eqNullSafe(
            F.col(f"src.{c}")
        )
    joined = current.alias("cur").join(
        src.alias("src"), keys, "full_outer"
    )
    src_side = F.col(f"src.{VALID_FROM}").isNotNull()
    cur_side = F.col(f"cur.{VALID_FROM}").isNotNull()

    kept_current = joined.where(
        cur_side & (~src_side | ~changed_pred)
    ).select("cur.*")
    closed = (
        joined.where(cur_side & src_side & changed_pred)
        .select("cur.*")
        .withColumn(VALID_TO, F.lit(effective_ts).cast("timestamp"))
        .withColumn(IS_CURRENT, F.lit(False))
    )
    inserted = joined.where(
        src_side & (~cur_side | changed_pred)
    ).select("src.*")

    merged = (
        history.unionByName(kept_current)
        .unionByName(closed)
        .unionByName(inserted)
    )
    files = table._write_data(merged)
    return table._locked_commit(
        "scd2_merge",
        files,
        table._file_stats(files),
        merged.schema.json(),
        expected_tail=base,
    )


def as_of(
    spark: SparkSession, table: LakehouseTable, ts: str
) -> DataFrame:
    """Dimension state as of ``ts``: rows whose validity interval
    covers it — the join input for event-time enrichment."""
    t = F.lit(ts).cast("timestamp")
    return table.read(spark).where(
        (F.col(VALID_FROM) <= t)
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > t))
    )
