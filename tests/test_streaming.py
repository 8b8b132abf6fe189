"""Structured Streaming tests: file-source ingest end-to-end, streaming
windowed aggregation, and watermark dedup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.streaming import aggregations, ingest


def _drain_query(q, timeout_s: float = 20.0):
    """Wait for THIS query to fully deregister — a terminated
    availableNow query can linger in the active list for a beat, and
    a restart sharing its checkpoint then trips Spark's concurrent-
    checkpoint guard. Scoped to the one query: other tests in the
    session may legitimately have their own actives."""
    import time

    deadline = time.monotonic() + timeout_s
    while q.isActive and time.monotonic() < deadline:
        time.sleep(0.2)
    assert not q.isActive


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


def test_windowed_agg_state_survives_restart(spark, tmp_path):
    """Fault recovery for stateful aggregation: stop the query,
    deliver more data, restart from the SAME checkpoint. Two things
    must survive the restart: (1) open-window aggregation state — a
    pre-restart event's window is emitted post-restart with the right
    count; (2) the watermark — an event older than the checkpointed
    watermark must be DROPPED, not resurrect its closed window as a
    duplicate. This is the recovery every executor loss or deploy
    exercises in production.

    (applyInPandasWithState + foreachBatch/foreach crashes Spark
    4.1.2's Python workers — known engine limitation — so the
    restart pin runs on the built-in windowed aggregation, whose
    append mode works with the recovery-capable file sink; the
    custom stateful operator's cross-batch state continuation is
    pinned by test_running_user_stats_stream.)"""
    src = tmp_path / "src"
    out = tmp_path / "out"
    src.mkdir()

    def land(name, rows):
        spark.createDataFrame(
            rows, "event_type string, ts string, value double"
        ).selectExpr(
            "event_type", "CAST(ts AS TIMESTAMP) ts", "value"
        ).coalesce(1).write.parquet(str(src / name))

    def run():
        stream = (
            spark.readStream.schema(
                "event_type string, ts timestamp, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            aggregations.windowed_event_counts(
                stream, window="5 minutes", watermark="10 minutes"
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        _drain_query(q)

    land("b1", [("a", "2020-01-01 00:00:30", 1.0),
                ("a", "2020-01-01 00:02:00", 2.0)])
    land("b2", [("a", "2020-01-01 00:30:00", 4.0)])
    run()  # watermark ends at 00:20 → window 00:00–00:05 closed+emitted
    first = spark.read.parquet(str(out)).collect()
    assert [(r["n_events"], r["total_value"]) for r in first] == [(2, 3.0)]
    # restart: a too-late event (00:01 < restored watermark 00:20) and
    # a fresh event that closes the 00:30 window held in state
    land("b3", [("a", "2020-01-01 00:01:00", 99.0),
                ("a", "2020-01-01 00:50:00", 8.0)])
    run()
    rows = sorted(
        (r["window_start"].minute, r["n_events"], r["total_value"])
        for r in spark.read.parquet(str(out)).collect()
    )
    # window 00:00 appears ONCE with the pre-restart count (late row
    # dropped by the restored watermark); window 00:30's state —
    # built before the restart — was emitted after it
    assert rows == [(0, 2, 3.0), (30, 1, 4.0)]


def test_ingest_replayed_epoch_is_noop(spark, tmp_path):
    """The exactly-once crash window, driven through the real
    streaming machinery: after a run commits batch N to the lakehouse
    table AND the checkpoint, delete the checkpoint's commit marker
    for N — exactly the on-disk state left by a crash BETWEEN the
    table commit and the checkpoint commit. The restart replays batch
    N; the table's (app_id, batch_id) txn stamp must turn the replay
    into a no-op instead of a double-append."""
    import os

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable

    inbox = tmp_path / "inbox"
    ckpt = tmp_path / "ckpt"
    inbox.mkdir()
    (inbox / "a.csv").write_text("id,v\n1,10\n2,20\n")

    def run():
        q = ingest.start_ingest_to_lakehouse(
            spark,
            str(inbox),
            str(tmp_path / "tbl"),
            str(ckpt),
            schema="id long, v double",
        )
        q.awaitTermination(120)
        _drain_query(q)

    run()
    table = LakehouseTable(str(tmp_path / "tbl"))
    assert table.read(spark).count() == 2
    snap_before = table.current_snapshot_id()
    # crash window: checkpoint thinks the last batch never finished.
    # Remove the marker AND its checksum sidecar — an orphaned .crc
    # trips Spark 4's checksum checkpoint manager on restart.
    commits = sorted(os.listdir(ckpt / "commits"))
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(ckpt / "commits" / last)
    crc = ckpt / "commits" / f".{last}.crc"
    if crc.exists():
        os.remove(crc)
    run()  # replays the batch
    assert table.read(spark).count() == 2  # no duplicate rows
    # and the replay's skipped commit left no new snapshot
    assert table.current_snapshot_id() == snap_before


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


def test_streaming_wap_quarantines_poisoned_epoch(spark, tmp_path):
    """audit_rules on the streaming ingest: a poisoned micro-batch is
    rejected atomically (quarantined, nothing published, no staged
    leftovers) WITHOUT stopping the query; later epochs land; a
    replayed rejected epoch stays out; a replayed published epoch
    no-ops on its txn stamp."""
    import os

    from pyspark.sql import functions as F

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "b1.csv").write_text("Order ID,Amount\n1,10.0\n2,20.0\n")
    table = LakehouseTable(str(tmp_path / "bronze"))
    rules = {"amount_pos": F.col("amount") > 0}
    rejected = []

    def run():
        q = ingest.start_ingest_to_lakehouse(
            spark,
            str(inbox),
            str(tmp_path / "bronze"),
            str(tmp_path / "ckpt"),
            schema="`Order ID` long, Amount double",
            table=table,
            audit_rules=rules,
            on_reject=lambda bid, m: rejected.append((bid, dict(m))),
        )
        q.awaitTermination(120)

    run()
    assert table.read(spark).count() == 2 and not rejected
    # epoch 2 is poisoned (negative amount) — with maxFilesPerTrigger
    # default 16, one new file = one epoch
    (inbox / "b2.csv").write_text("Order ID,Amount\n3,-5.0\n4,40.0\n")
    run()
    assert len(rejected) == 1 and rejected[0][1]["amount_pos"] == 1
    assert table.read(spark).count() == 2  # nothing from the bad epoch
    qdir = os.path.join(table.path, "_quarantine")
    assert os.path.isdir(qdir) and len(os.listdir(qdir)) == 1
    quarantined = spark.read.parquet(os.path.join(qdir, os.listdir(qdir)[0]))
    assert {r["order_id"] for r in quarantined.collect()} == {3, 4}
    # no staged leftovers: every data file on disk is manifest-live
    live = {os.path.basename(f) for f in table.snapshots[-1]["files"]}
    on_disk = {
        n
        for root, _d, names in os.walk(os.path.join(table.path, "data"))
        for n in names
        if n.endswith(".parquet")
    }
    assert on_disk == live
    # the query keeps going: a later clean epoch lands
    (inbox / "b3.csv").write_text("Order ID,Amount\n5,50.0\n")
    run()
    assert {r["order_id"] for r in table.read(spark).collect()} == {1, 2, 5}
    # replay on the SAME checkpoint with no new files: published
    # epochs no-op on their txn stamps, the rejected epoch stays out
    snap = table.current_snapshot_id()
    run()
    assert table.current_snapshot_id() == snap
    assert table.read(spark).count() == 3


def test_streaming_wap_merge_path_audits_before_dedup(spark, tmp_path):
    """On the merge path, the audit gates the RAW epoch before
    within-batch dedup: a poisoned row shadowed by a clean same-key
    row must still reject the epoch (rejection must not depend on
    how rows happened to batch), and quarantine holds the raw rows."""
    import os

    from pyspark.sql import functions as F

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    # one epoch: poisoned (id=1, -5) AND clean (id=1, 10) — dedup
    # would have hidden the poisoned version from the audit
    (inbox / "b1.csv").write_text(
        "Order ID,Amount\n1,-5.0\n1,10.0\n2,20.0\n"
    )
    table = LakehouseTable(str(tmp_path / "t"))
    rejected = []
    q = ingest.start_ingest_to_lakehouse(
        spark,
        str(inbox),
        str(tmp_path / "t"),
        str(tmp_path / "ckpt"),
        schema="`Order ID` long, Amount double",
        table=table,
        merge_keys=["order_id"],
        audit_rules={"amount_pos": F.col("amount") > 0},
        on_reject=lambda bid, m: rejected.append((bid, dict(m))),
    )
    q.awaitTermination(120)
    assert len(rejected) == 1 and rejected[0][1]["amount_pos"] == 1
    assert table.current_snapshot_id() is None  # nothing published
    qdir = os.path.join(table.path, "_quarantine")
    quarantined = spark.read.parquet(
        os.path.join(qdir, os.listdir(qdir)[0])
    )
    # raw epoch preserved: BOTH versions of id=1 are inspectable
    assert quarantined.where("order_id = 1").count() == 2


def test_streaming_mor_merge_with_maintenance_cadence(spark, tmp_path):
    """merge_mode='merge-on-read': each epoch commits O(batch) (new
    files + an equality-delete file) instead of rewriting the table;
    maintain_every materializes the delete tail on a cadence so reads
    stop paying the anti-join."""
    import os

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    table = LakehouseTable(str(tmp_path / "t"))

    def run():
        q = ingest.start_ingest_to_lakehouse(
            spark,
            str(inbox),
            str(tmp_path / "t"),
            str(tmp_path / "ckpt"),
            schema="`Order ID` long, Amount double",
            table=table,
            merge_keys=["order_id"],
            merge_mode="merge-on-read",
            maintain_every=3,
            maintain_kwargs={"max_delete_files": 0, "max_files": 4},
        )
        q.awaitTermination(120)

    (inbox / "b1.csv").write_text("Order ID,Amount\n1,10.0\n2,20.0\n")
    run()  # epoch 0: first commit is an append
    files_after_load = list(table.snapshots[-1]["files"])
    (inbox / "b2.csv").write_text("Order ID,Amount\n1,11.0\n3,30.0\n")
    run()  # epoch 1: MoR merge — no rewrite of the loaded files
    snap = table.snapshots[-1]
    assert set(files_after_load) <= set(snap["files"])
    assert snap.get("deletes")
    rows = {r.order_id: r.amount for r in table.read(spark).collect()}
    assert rows == {1: 11.0, 2: 20.0, 3: 30.0}
    # epoch 2 hits the maintain_every=3 cadence ((2+1) % 3 == 0):
    # the delete tail is materialized and fragmentation compacted
    (inbox / "b3.csv").write_text("Order ID,Amount\n2,22.0\n")
    run()
    assert not table.snapshots[-1].get("deletes")
    rows = {r.order_id: r.amount for r in table.read(spark).collect()}
    assert rows == {1: 11.0, 2: 22.0, 3: 30.0}
    # replay: no new files -> no epochs -> table untouched
    snap_id = table.current_snapshot_id()
    run()
    assert table.current_snapshot_id() == snap_id


def test_streaming_cross_epoch_dedup(spark, tmp_path):
    """dedup_content_col on the streaming ingest: each epoch drops
    rows whose content an earlier epoch loaded (checked against the
    persisted hash index, O(batch + index)), keeps within-epoch
    duplicates (bronze keeps and flags), and extends the index
    transactionally; replays no-op end to end."""
    import pytest

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    table = LakehouseTable(str(tmp_path / "bronze"))
    index = LakehouseTable(str(tmp_path / "dedup_index"))

    def run():
        q = ingest.start_ingest_to_lakehouse(
            spark,
            str(inbox),
            str(tmp_path / "bronze"),
            str(tmp_path / "ckpt"),
            schema="`Doc ID` long, Text string",
            table=table,
            dedup_content_col="text",
            dedup_id_col="doc_id",
            dedup_index_path=str(tmp_path / "dedup_index"),
        )
        q.awaitTermination(120)
        _drain_query(q)

    (inbox / "b1.csv").write_text("Doc ID,Text\n1,alpha\n2,beta\n")
    run()
    assert {r["doc_id"] for r in table.read(spark).collect()} == {1, 2}
    assert index.read(spark).count() == 2
    # epoch 2: 3 repeats corpus content (drops), 4+5 share NEW content
    # (within-epoch dup — both kept, ONE index row for the hash)
    (inbox / "b2.csv").write_text("Doc ID,Text\n3,alpha\n4,gamma\n5,gamma\n")
    run()
    assert {r["doc_id"] for r in table.read(spark).collect()} == {1, 2, 4, 5}
    idx = {
        r["corpus_keep_id"] for r in index.read(spark).collect()
    }
    assert index.read(spark).count() == 3 and idx == {1, 2, 4}
    # epoch 3: cross-epoch dup of epoch-2 content drops, new content lands
    (inbox / "b3.csv").write_text("Doc ID,Text\n6,gamma\n7,delta\n")
    run()
    assert {r["doc_id"] for r in table.read(spark).collect()} == {1, 2, 4, 5, 7}
    assert index.read(spark).count() == 4
    # replay on the same checkpoint, no new files: nothing moves
    tsnap, isnap = table.current_snapshot_id(), index.current_snapshot_id()
    run()
    assert table.current_snapshot_id() == tsnap
    assert index.current_snapshot_id() == isnap
    # guards
    with pytest.raises(ValueError, match="append-path only"):
        ingest.start_ingest_to_lakehouse(
            spark, str(inbox), str(tmp_path / "bronze"),
            str(tmp_path / "ckpt2"), schema="`Doc ID` long, Text string",
            merge_keys=["doc_id"], dedup_content_col="text",
            dedup_id_col="doc_id",
            dedup_index_path=str(tmp_path / "dedup_index"),
        )
    with pytest.raises(ValueError, match="needs dedup_id_col"):
        ingest.start_ingest_to_lakehouse(
            spark, str(inbox), str(tmp_path / "bronze"),
            str(tmp_path / "ckpt2"), schema="`Doc ID` long, Text string",
            dedup_content_col="text",
        )
    with pytest.raises(ValueError, match="inside table_path"):
        ingest.start_ingest_to_lakehouse(
            spark, str(inbox), str(tmp_path / "bronze"),
            str(tmp_path / "ckpt2"), schema="`Doc ID` long, Text string",
            dedup_content_col="text", dedup_id_col="doc_id",
            dedup_index_path=str(tmp_path / "bronze" / "_dedup_index"),
        )


def test_streaming_dedup_crash_window_heals_index(spark, tmp_path):
    """Crash between an epoch's table commit and its index append:
    the replayed epoch finds its table txn stamped but not the
    index's, recomputes its verdicts against the exactly-pre-epoch
    index state, and finishes the missing half — later epochs then
    dedup correctly against the healed index."""
    import hashlib

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    table = LakehouseTable(str(tmp_path / "bronze"))
    index = LakehouseTable(str(tmp_path / "dedup_index"))
    # simulate the crash window: epoch 0's TABLE commit landed (txn
    # stamped with the checkpoint-scoped app id) but the index append
    # never ran
    app_id = "ingest-" + hashlib.sha1(ckpt.encode()).hexdigest()[:12]
    pre = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).withColumn("processed_at", F.current_timestamp())
    table.append(pre, txn=(app_id, 0))
    assert index.current_snapshot_id() is None
    (inbox / "b1.csv").write_text("Doc ID,Text\n1,alpha\n2,beta\n")

    def run():
        q = ingest.start_ingest_to_lakehouse(
            spark, str(inbox), str(tmp_path / "bronze"), ckpt,
            schema="`Doc ID` long, Text string",
            table=table,
            dedup_content_col="text", dedup_id_col="doc_id",
            dedup_index_path=str(tmp_path / "dedup_index"),
        )
        q.awaitTermination(120)
        _drain_query(q)

    run()
    # table did NOT double-append; index healed with epoch 0's hashes
    assert table.read(spark).count() == 2
    assert index.read(spark).count() == 2
    # a later epoch dedups against the healed index
    (inbox / "b2.csv").write_text("Doc ID,Text\n3,alpha\n4,delta\n")
    run()
    assert {r["doc_id"] for r in table.read(spark).collect()} == {1, 2, 4}
    assert index.read(spark).count() == 3


def test_ingest_maintain_cadence_downstream_stream_rides_through(
    spark, tmp_path
):
    """H6 x H14 composition (VERDICT r9 item 1, the full shape): an
    ingest job with maintain_every=2 commits row-preserving rewrites
    on its own cadence while a DOWNSTREAM plain stream tails the same
    table on one checkpoint. The downstream stream must deliver every
    ingested row exactly once, riding through the maintenance commits
    with zero extra rows — before r10 it raised LineageBrokenError at
    the first compaction."""
    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )
    from biglake_iceberg_pipeline_spark.streaming import ingest
    from biglake_iceberg_pipeline_spark.streaming.source import (
        read_lakehouse_stream,
    )

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    table = LakehouseTable(str(tmp_path / "bronze"))
    got: list = []

    def sink(bdf, bid):
        got.extend(r["id"] for r in bdf.collect())

    down_ck = str(tmp_path / "down_ck")

    def run_ingest():
        q = ingest.start_ingest_to_lakehouse(
            spark,
            str(inbox),
            table.path,
            str(tmp_path / "ckpt"),
            schema="ID long, Score double",
            table=table,
            maintain_every=2,
            maintain_kwargs={"max_files": 1, "keep_snapshots": 20},
        )
        q.awaitTermination(180)

    def run_downstream():
        q = (
            read_lakehouse_stream(spark, table.path)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", down_ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # one inbox file per ingest run -> one micro-batch per run, so
    # batch ids advance deterministically across checkpoint restarts
    # and the maintain_every=2 cadence fires on the SECOND epoch
    (inbox / "f1.csv").write_text("ID,Score\n1,1.0\n2,2.0\n")
    run_ingest()  # epoch 0
    (inbox / "f2.csv").write_text("ID,Score\n3,3.0\n")
    run_ingest()  # epoch 1 -> maintain() fires
    assert any(
        s.get("data_change") is False for s in table.snapshots
    ), "maintenance cadence did not commit a rewrite"
    run_downstream()
    assert sorted(got) == [1, 2, 3]
    # more epochs + another maintenance, same downstream checkpoint
    (inbox / "f3.csv").write_text("ID,Score\n4,4.0\n")
    run_ingest()  # epoch 2
    (inbox / "f4.csv").write_text("ID,Score\n5,5.0\n")
    run_ingest()  # epoch 3 -> maintain() fires again
    run_downstream()
    assert sorted(got) == [1, 2, 3, 4, 5]  # exactly once, no replays
