"""Streaming ingest pipeline: the reference's event-driven flow
(GCS inbox → Eventarc → cleaning agent → loader → Iceberg bronze,
logger → Firestore) re-expressed as ONE Structured Streaming job.

- File source watches an inbox directory (the Eventarc trigger).
- The micro-batch transform applies the cleaning operators
  (snake_case, trim/sentinel-null, processed_at — what the agent does
  per file, reference services/data-cleaning-agent/main.py).
- dropDuplicatesWithinWatermark replaces the logger's Firestore
  duplicate registry: dedup state is bounded by the watermark instead
  of an external KV store.
- The sink appends parquet with exactly-once file-sink semantics
  (checkpointed manifest) — the loader's append-to-Iceberg role.

Scale: maxFilesPerTrigger bounds micro-batch size; state store holds
only ids within the watermark window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from biglake_iceberg_pipeline_spark.operators.cleaning import (
    add_processed_at,
    clean_string,
    normalize_column_names,
)


def read_inbox_stream(
    spark: SparkSession,
    inbox_dir: str,
    schema: str,
    fmt: str = "csv",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    reader = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(inbox_dir)


def clean_batch(df: DataFrame, string_cols: list[str] | None = None) -> DataFrame:
    """The agent's per-file cleaning pass as one projection."""
    df = normalize_column_names(df)
    cols = string_cols or [c for c, t in df.dtypes if t == "string"]
    for c in cols:
        df = df.withColumn(c, clean_string(c))
    return add_processed_at(df)


def dedup_within_watermark(
    df: DataFrame,
    id_cols: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming duplicate suppression (the pipeline-logger's
    file_registry role) with watermark-bounded state."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            id_cols
        )
    return df.dropDuplicates(id_cols)


def start_ingest(
    spark: SparkSession,
    inbox_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str,
    fmt: str = "csv",
    id_cols: list[str] | None = None,
    ts_col: str | None = None,
) -> StreamingQuery:
    """Wire inbox → clean → (optional dedup) → parquet append."""
    stream = read_inbox_stream(spark, inbox_dir, schema, fmt)
    cleaned = clean_batch(stream)
    if id_cols and ts_col:
        cleaned = dedup_within_watermark(cleaned, id_cols, ts_col)
    return (
        cleaned.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_ingest_to_lakehouse(
    spark: SparkSession,
    inbox_dir: str,
    table_path: str,
    checkpoint_dir: str,
    schema: str,
    fmt: str = "csv",
    merge_keys: list[str] | None = None,
    table=None,
    audit_rules: dict | None = None,
    on_reject=None,
    merge_mode: str = "copy-on-write",
    maintain_every: int | None = None,
    maintain_kwargs: dict | None = None,
    dedup_content_col: str | None = None,
    dedup_id_col: str | None = None,
    dedup_index_path: str | None = None,
) -> StreamingQuery:
    """Inbox → clean → snapshot-committed lakehouse table — the full
    reference flow (agent cleans, loader appends/upserts to Iceberg)
    as one streaming job.

    ``audit_rules``: when set, every micro-batch commits through
    write-audit-publish (append path) or a pre-merge expectations
    gate (merge path) — a poisoned epoch is rejected ATOMICALLY
    (staging cleaned up, nothing published, txn never stamped) and
    QUARANTINED to ``<table>/_quarantine/epoch=<id>/`` for
    inspection, while the query keeps running and later epochs land.
    Mirrors the batch flow's ``bronze_rules``. A crash-replayed
    rejected epoch re-audits and re-rejects (quarantine writes are
    overwrite-idempotent); a crash-replayed PUBLISHED epoch still
    no-ops on its txn stamp. ``on_reject(batch_id, metrics)`` is an
    optional observer callback per rejected epoch.

    Pass ``table`` (a LakehouseTable at ``table_path``) to keep an
    instance the caller has decorated — e.g. with post-commit hooks
    (``on_commit``), so materialized views auto-refresh per
    micro-batch (the fully event-driven gold layer).

    foreachBatch gives the loader's table semantics (snapshot commits,
    schema evolution, MERGE upsert when ``merge_keys`` is set) instead
    of the raw file-sink. EXACTLY-ONCE, not just at-least-once: every
    batch commit is stamped with (checkpoint-scoped app id, batch_id)
    inside the table's transactional manifest commit, so a batch
    replayed after a crash between table-commit and checkpoint-commit
    is skipped under the table's commit lock — the window where
    checkpoint-only tracking would double-append. (MERGE batches are
    additionally idempotent on the keys.)

    ``merge_mode="merge-on-read"``: each epoch's MERGE commits
    O(batch) — new data files + an equality-delete file — instead of
    rewriting the table (copy-on-write rewrites the WHOLE table every
    epoch: the per-epoch scale killer on a large table). Readers pay
    a broadcast anti-join until maintenance materializes the tail;
    pair it with ``maintain_every=N`` to run ``table.maintain()``
    after every Nth epoch (targeted delete materialization +
    compaction + expiry), bounding both the delete tail and the
    one-file-per-epoch fragmentation in one place.

    ``dedup_content_col`` + ``dedup_id_col`` + ``dedup_index_path``:
    CROSS-EPOCH content dedup against the persisted hash index (the
    batch medallion flow's ``dedup_content_col``, continuous form).
    Each epoch joins against the (content_hash, corpus_keep_id)
    index table — O(batch + index), never a rescan of committed
    text — drops rows whose content an earlier epoch (or another
    pipeline sharing the index) already loaded, and extends the
    index transactionally with its newly-seen hashes. Within-epoch
    duplicates are KEPT (bronze keeps and flags; only cross-load
    content drops). Crash-window safe in the one order the sink
    runs (table commit, then index append): a replayed epoch whose
    table commit landed but index append didn't HEALS the index
    before returning — both appends stamp the epoch's txn, so every
    replay path no-ops or completes exactly the missing half.
    Composes with ``audit_rules`` (the audit gates the RAW epoch
    before dedup, so rejection never depends on what earlier epochs
    loaded); not supported together with ``merge_keys`` (merge
    already replaces by key — content-dedup-then-upsert has no
    single sensible semantics).
    """
    import hashlib

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    if dedup_content_col and merge_keys:
        raise ValueError(
            "dedup_content_col is append-path only; merge_keys "
            "already dedups by key"
        )
    if dedup_content_col and not (dedup_id_col and dedup_index_path):
        raise ValueError(
            "dedup_content_col needs dedup_id_col and dedup_index_path"
        )
    if dedup_content_col:
        import os

        # the index must live OUTSIDE the ingest table's directory:
        # the table's orphan sweep / expiry only ever delete under
        # their own path, and a nested foreign table's files would
        # look like unreferenced orphans to them
        idx_real = os.path.realpath(dedup_index_path)
        tbl_real = os.path.realpath(table_path)
        if os.path.commonpath([idx_real, tbl_real]) == tbl_real:
            raise ValueError(
                "dedup_index_path must not be inside table_path "
                "(the table's GC would sweep the index's files)"
            )
    dedup_index = (
        LakehouseTable(dedup_index_path) if dedup_content_col else None
    )
    if table is None:
        table = LakehouseTable(table_path)
    else:
        import os

        if os.path.realpath(table.path) != os.path.realpath(table_path):
            raise ValueError(
                f"table is at {table.path!r}, expected {table_path!r}"
            )
    stream = clean_batch(read_inbox_stream(spark, inbox_dir, schema, fmt))
    # Checkpoint-scoped writer identity: a NEW checkpoint means a new
    # pipeline whose batch ids restart at 0 and must not be confused
    # with the old run's epochs.
    app_id = "ingest-" + hashlib.sha1(checkpoint_dir.encode()).hexdigest()[:12]

    def _quarantine(batch_df: DataFrame, batch_id: int, metrics) -> None:
        import os

        batch_df.write.mode("overwrite").parquet(
            os.path.join(table.path, "_quarantine", f"epoch={batch_id}")
        )
        if on_reject is not None:
            on_reject(batch_id, metrics)

    def _maintain(batch_id: int) -> None:
        # after every Nth epoch; maintain_kwargs tunes the thresholds
        # (e.g. max_delete_files) for the table's churn profile
        if maintain_every and (batch_id + 1) % maintain_every == 0:
            table.maintain(spark, **(maintain_kwargs or {}))

    idx_app = app_id + "-idx"

    def _dedup_split(batch_df: DataFrame):
        from biglake_iceberg_pipeline_spark.operators.dedup import (
            empty_index_frame,
            split_batch_vs_index,
        )

        idx_df = (
            dedup_index.read(batch_df.sparkSession)
            if dedup_index.current_snapshot_id() is not None
            else empty_index_frame(
                batch_df, dedup_id_col, dedup_content_col
            )
        )
        return split_batch_vs_index(
            idx_df, batch_df, dedup_id_col, dedup_content_col
        )

    def _extend_index(batch_df: DataFrame, batch_id: int) -> None:
        """Append this epoch's newly-seen hashes (idempotent on the
        index's own txn stamp) — also the HEAL for a crash between
        the table commit and the index append: the replayed epoch
        recomputes its verdicts against the exactly-pre-epoch index
        state and finishes the missing half."""
        seen = dedup_index.last_txn_version(idx_app)
        if seen is not None and seen >= batch_id:
            return
        _, new_rows, out = _dedup_split(batch_df)
        dedup_index.append(new_rows, txn=(idx_app, batch_id))
        out.unpersist()

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from biglake_iceberg_pipeline_spark.operators.expectations import (
            ExpectationsFailed,
            check,
        )

        seen = table.last_txn_version(app_id)
        if seen is not None and seen >= batch_id:
            # replayed epoch, already in the table — but the crash may
            # have hit between its table commit and its index append
            if dedup_index is not None:
                _extend_index(batch_df, batch_id)
            return
        txn = (app_id, batch_id)

        def _audit_rejects() -> bool:
            """Pre-write audit of the RAW epoch — shared by the dedup
            and merge paths (both depend on prior state or rewrite in
            place, so the staged-WAP form doesn't apply). Auditing
            BEFORE dedup/key-collapse keeps rejection independent of
            what earlier epochs loaded or how rows happened to batch,
            and quarantine holds the full epoch for inspection."""
            if not audit_rules:
                return False
            _, metrics = check(batch_df, audit_rules, "warn")
            if any(v > 0 for v in metrics.values()):
                _quarantine(batch_df, batch_id, metrics)
                return True
            return False

        if dedup_index is not None:
            if _audit_rejects():
                return
            keep, new_rows, out = _dedup_split(batch_df)
            table.append(keep, txn=txn)
            dedup_index.append(new_rows, txn=(idx_app, batch_id))
            out.unpersist()
            _maintain(batch_id)
            return
        if merge_keys:
            if _audit_rejects():
                return
            # a batch may carry several versions of a key (e.g. two
            # files landed); last-writer-wins within the batch
            batch_df = batch_df.dropDuplicates(merge_keys)
            if table.current_snapshot_id() is not None:
                table.merge(
                    batch_df.sparkSession,
                    batch_df,
                    merge_keys,
                    txn=txn,
                    mode=merge_mode,
                )
            else:
                table.append(batch_df, txn=txn)
            _maintain(batch_id)
            return
        if audit_rules:
            try:
                table.write_audit_publish(batch_df, audit_rules, txn=txn)
                _maintain(batch_id)
            except ExpectationsFailed as e:
                _quarantine(batch_df, batch_id, e.metrics)
            return
        table.append(batch_df, txn=txn)
        _maintain(batch_id)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def pipeline_log(df: DataFrame, event: str) -> DataFrame:
    """Observability record per processed row-batch (the logger
    service's Firestore write, as a derivable frame)."""
    return df.groupBy().agg(
        F.lit(event).alias("event"),
        F.count(F.lit(1)).alias("n_rows"),
        F.current_timestamp().alias("logged_at"),
    )
