"""Stream enrichment against lakehouse dimensions.

Parity: the reference's event flow enriches incoming events with
dimension attributes before landing gold rows. A naive stream-static
join would freeze the dimension at plan time (the manifest-driven
read materializes its file list when the DataFrame is built), so the
sink here re-resolves the dimension INSIDE foreachBatch — every
micro-batch reads the dimension's then-current snapshot, picking up
appends and SCD2 merges between batches with no restart, and each
batch still sees one consistent snapshot (manifest file list, never
directory listing).

For event-time-correct enrichment (an event joins the dimension row
valid AT ITS TIMESTAMP, not the current one), pass an SCD2 table and
``as_of_event_time=True``: the join condition becomes the validity
interval check — the batch-side equivalent of temporal.asof_join.

Scale: the dimension is broadcast when small (AQE decides); the
events stream never shuffles for the join in that case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from biglake_iceberg_pipeline_spark.sinks import scd
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def enrich_stream_with_dim(
    events: DataFrame,
    spark: SparkSession,
    dim_table: LakehouseTable,
    join_key: str,
    event_key: str,
    event_ts_col: str | None = None,
) -> DataFrame:
    """Join a streaming events frame to a lakehouse dimension.

    Without ``event_ts_col``: current rows only (classic stream-static
    lookup). With it: SCD2 validity-interval join — each event matches
    the dimension version whose [valid_from, valid_to) covers the
    event's own timestamp."""
    dim = dim_table.read(spark)
    is_scd2 = scd.IS_CURRENT in dim.columns
    if event_ts_col is None:
        current = (
            dim.where(F.col(scd.IS_CURRENT)).drop(
                scd.VALID_FROM, scd.VALID_TO, scd.IS_CURRENT
            )
            if is_scd2
            else dim
        )
        # Drop the DIM side's key by Column reference: a name-based
        # drop(join_key) removes BOTH sides when event_key == join_key
        # (the common case), losing the event's own key column.
        return events.join(
            current, events[event_key] == current[join_key], "left"
        ).drop(current[join_key])
    if not is_scd2 or scd.VALID_FROM not in dim.columns:
        raise ValueError(
            "as-of enrichment (event_ts_col) requires an SCD2 dimension "
            f"with {scd.VALID_FROM}/{scd.VALID_TO}/{scd.IS_CURRENT} "
            "columns — write it with scd.merge_scd2"
        )
    cond = (
        (events[event_key] == dim[join_key])
        & (dim[scd.VALID_FROM] <= events[event_ts_col])
        & (
            dim[scd.VALID_TO].isNull()
            | (dim[scd.VALID_TO] > events[event_ts_col])
        )
    )
    return events.join(dim, cond, "left").drop(dim[join_key]).drop(
        scd.VALID_FROM, scd.VALID_TO, scd.IS_CURRENT
    )


def start_enriched_sink(
    spark: SparkSession,
    events: DataFrame,
    dim_table: LakehouseTable,
    join_key: str,
    event_key: str,
    out_table_path: str,
    checkpoint_dir: str,
    event_ts_col: str | None = None,
) -> StreamingQuery:
    """Enriched events → lakehouse, exactly-once (foreachBatch with
    transactional epoch stamps, same mechanism as ingest)."""
    import hashlib

    out = LakehouseTable(out_table_path)
    app_id = (
        "enrich-" + hashlib.sha1(checkpoint_dir.encode()).hexdigest()[:12]
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        seen = out.last_txn_version(app_id)
        if seen is not None and seen >= batch_id:
            return
        # fresh dimension snapshot PER BATCH (see module docstring)
        enriched = enrich_stream_with_dim(
            batch_df,
            batch_df.sparkSession,
            dim_table,
            join_key,
            event_key,
            event_ts_col,
        )
        out.append(enriched, txn=(app_id, batch_id))

    return (
        events.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
