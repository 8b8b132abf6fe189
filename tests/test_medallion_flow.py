"""End-to-end medallion flow: messy inbox CSVs → bronze → silver →
gold, idempotent re-runs, schema evolution, event log."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.plans.medallion_flow import (
    run_medallion_flow,
)
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable

F1 = """Order ID,Customer Name,Amount,Order Date
1,  Alice  ,100,2024-01-01
2,Bob,N/A,2024-01-02
2,Bob,N/A,2024-01-02
3,Carol,300,2024-01-02
"""

# same feed later: order 3 re-shipped with a new amount, a NEW column
# appears (schema evolution), plus a brand-new order
F2 = """Order ID,Customer Name,Amount,Order Date,Channel
3,Carol,350,2024-01-02,web
4,Dan,400,2024-01-03,store
"""


def _daily(df):
    return df.groupBy("order_date").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def test_medallion_flow_end_to_end(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "f1.csv"), "w") as f:
        f.write(F1)

    m1 = run_medallion_flow(
        spark, inbox, lake, ["order_id"],
        gold_views=[("daily", _daily)],
    )
    assert m1["files_processed"] == 1 and m1["files_skipped"] == 0
    silver = LakehouseTable(lake + "/silver")
    rows = {r["order_id"]: r for r in silver.read(spark).collect()}
    # snake_cased + typed (safe coercion -> BIGINT), trimmed, sentinel
    # NULL, within-file dup collapsed
    assert set(rows) == {1, 2, 3}
    assert rows[1]["customer_name"] == "Alice"
    assert rows[2]["amount"] is None
    # typed: either the CSV reader inferred it or safe coercion cast it
    assert dict(silver.read(spark).dtypes)["order_id"] in ("int", "bigint")
    assert m1["gold"]["daily"] == 2  # two distinct order dates
    assert m1["quality_status"] in ("pass", "warn", "fail")

    # identical re-run: file skipped, nothing changes
    m2 = run_medallion_flow(
        spark, inbox, lake, ["order_id"],
        gold_views=[("daily", _daily)],
    )
    assert m2["files_skipped"] == 1 and m2["files_processed"] == 0
    assert m2["silver_rows"] == 3

    # second file: schema evolution + latest-wins update + new order
    with open(os.path.join(inbox, "f2.csv"), "w") as f:
        f.write(F2)
    m3 = run_medallion_flow(
        spark, inbox, lake, ["order_id"],
        gold_views=[("daily", _daily)],
    )
    assert m3["files_processed"] == 1 and m3["files_skipped"] == 1
    rows = {r["order_id"]: r for r in silver.read(spark).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[3]["amount"] == 350          # latest version won
    assert rows[3]["channel"] == "web"       # evolved column populated
    assert rows[1]["channel"] is None        # old rows read NULL
    assert m3["gold"]["daily"] == 3

    # event log recorded every stage
    log = LakehouseTable(lake + "/_pipeline_log").read(spark)
    events = [r["event"] for r in log.collect()]
    assert events.count("file_loaded_bronze") == 2
    assert events.count("file_skipped_duplicate") == 2
    assert "silver_rebuilt" in events and "gold_refreshed" in events


def test_incremental_widens_types_like_rebuild(spark, tmp_path):
    """A later vintage delivering 12.5 into a column silver typed as
    BIGINT must WIDEN to DOUBLE in incremental mode (as a rebuild's
    re-inference would) — not crash the ANSI cast or null the value."""
    f_int = "Order ID,Amount\n1,100\n2,200\n"
    f_dec = "Order ID,Amount\n2,12.5\n3,7\n"
    for mode in ("rebuild", "incremental"):
        inbox = str(tmp_path / f"in_{mode}")
        lake = str(tmp_path / f"lk_{mode}")
        os.makedirs(inbox)
        with open(inbox + "/f1.csv", "w") as f:
            f.write(f_int)
        run_medallion_flow(spark, inbox, lake, ["order_id"], silver_mode=mode)
        silver = LakehouseTable(lake + "/silver")
        assert dict(silver.read(spark).dtypes)["amount"] in ("int", "bigint")
        with open(inbox + "/f2.csv", "w") as f:
            f.write(f_dec)
        run_medallion_flow(spark, inbox, lake, ["order_id"], silver_mode=mode)
        got = {r["order_id"]: r["amount"]
               for r in silver.read(spark).collect()}
        assert got == {1: 100.0, 2: 12.5, 3: 7.0}, (mode, got)
        assert dict(silver.read(spark).dtypes)["amount"] == "double"


def test_incremental_cross_class_vintage_demands_rebaseline(spark, tmp_path):
    """A vintage switching a numeric silver column to boolean-class
    values must raise the guided re-baseline error — not crash the
    ANSI cast mid-merge or silently coerce; rebuild mode handles it."""
    import pytest as _pytest

    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(inbox + "/f1.csv", "w") as f:
        f.write("Order ID,Amount\n1,100\n2,200\n")
    run_medallion_flow(
        spark, inbox, lake, ["order_id"], silver_mode="incremental"
    )
    with open(inbox + "/f2.csv", "w") as f:
        f.write("Order ID,Amount\n3,true\n4,false\n")
    with _pytest.raises(ValueError, match="re-baseline"):
        run_medallion_flow(
            spark, inbox, lake, ["order_id"], silver_mode="incremental"
        )
    # the guided path works: rebuild re-infers the column (string)
    m = run_medallion_flow(spark, inbox, lake, ["order_id"])
    assert m["silver_rows"] == 4
    silver = LakehouseTable(lake + "/silver")
    assert dict(silver.read(spark).dtypes)["amount"] == "string"


def test_crash_between_bronze_and_silver_recovers(spark, tmp_path):
    """If a run dies after the bronze append but before the silver
    refresh, the replay sees only skipped files — the WATERMARK gate
    must still refresh silver (a file counter would skip it forever)."""
    from biglake_iceberg_pipeline_spark.plans import medallion_flow as M

    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(inbox + "/f1.csv", "w") as f:
        f.write(F1)
    run_medallion_flow(spark, inbox, lake, ["order_id"])
    # simulate the crash window: bronze gets a new file's rows but the
    # process dies before any silver work
    with open(inbox + "/f2.csv", "w") as f:
        f.write(F2)
    bronze = LakehouseTable(lake + "/bronze")
    bronze.append(
        M._clean_for_bronze(
            spark.read.option("header", True).csv(inbox + "/f2.csv")
        ),
        txn=(M._file_app_id("f2.csv"), 0),
    )
    # replay: every file skips, yet silver must catch up to bronze
    m = run_medallion_flow(spark, inbox, lake, ["order_id"])
    assert m["files_processed"] == 0 and m["files_skipped"] == 2
    rows = {r["order_id"]: r for r in
            LakehouseTable(lake + "/silver").read(spark).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[3]["amount"] == 350 and rows[3]["channel"] == "web"


def test_incremental_survives_bronze_maintenance(spark, tmp_path):
    """Nightly bronze maintenance (compaction = a 'replace' snapshot,
    snapshot expiry) breaks the incremental file-diff lineage; the
    silver refresh must fall back to a full re-read (latest-wins is
    idempotent) instead of crashing."""
    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(inbox + "/f1.csv", "w") as f:
        f.write(F1)
    run_medallion_flow(
        spark, inbox, lake, ["order_id"], silver_mode="incremental"
    )
    bronze = LakehouseTable(lake + "/bronze")
    bronze.maintain(spark, max_files=1, keep_snapshots=1, orphan_grace_s=0)
    with open(inbox + "/f2.csv", "w") as f:
        f.write(F2)
    m = run_medallion_flow(
        spark, inbox, lake, ["order_id"], silver_mode="incremental"
    )
    rows = {r["order_id"]: r for r in
            LakehouseTable(lake + "/silver").read(spark).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[3]["amount"] == 350  # latest vintage still wins
    assert m["silver_rows"] == 4


def test_medallion_incremental_silver_matches_rebuild(spark, tmp_path):
    """silver_mode='incremental' (O(delta + touched keys)) converges
    to the same silver as the full rebuild across multiple file
    vintages — including a latest-wins update and schema evolution —
    and its refreshes MERGE rather than overwrite."""

    def run_both(files):
        results = {}
        for mode in ("rebuild", "incremental"):
            inbox = str(tmp_path / f"inbox_{mode}")
            lake = str(tmp_path / f"lake_{mode}")
            os.makedirs(inbox, exist_ok=True)
            for fname, body in files:
                with open(os.path.join(inbox, fname), "w") as f:
                    f.write(body)
                run_medallion_flow(
                    spark, inbox, lake, ["order_id"],
                    silver_mode=mode,
                )
            silver = LakehouseTable(lake + "/silver")
            results[mode] = (
                {
                    r["order_id"]: (
                        r["customer_name"], r["amount"],
                        r["channel"] if "channel" in r.__fields__ else None,
                    )
                    for r in silver.read(spark).collect()
                },
                [h["operation"] for h in silver.history()],
            )
        return results

    res = run_both([("f1.csv", F1), ("f2.csv", F2)])
    rows_rebuild, _ = res["rebuild"]
    rows_incr, ops_incr = res["incremental"]
    assert rows_incr == rows_rebuild
    # first refresh appends, later ones merge — never a full overwrite
    assert ops_incr[0] == "append"
    assert "merge" in ops_incr and "overwrite" not in ops_incr
    assert rows_incr[3] == ("Carol", 350, "web")  # latest vintage won


def test_gold_catches_up_after_crash_window(spark, tmp_path):
    """ADVICE r4: a run that commits silver's watermark but dies before
    the gold loop leaves gold stale; a replay with no new inbox files
    used to skip the silver-stale branch and gold never caught up.
    Simulated by running once with no gold views (silver lands, gold
    absent), then replaying with views registered."""
    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "f1.csv"), "w") as f:
        f.write(F1)

    m1 = run_medallion_flow(spark, inbox, lake, ["order_id"])
    assert m1["gold"] == {} and m1["silver_rows"] == 3

    # replay, no new files: silver fresh, gold stale → must catch up
    m2 = run_medallion_flow(
        spark, inbox, lake, ["order_id"],
        gold_views=[("daily", _daily)],
    )
    assert m2["files_processed"] == 0 and m2["files_skipped"] == 1
    assert m2["gold"]["daily"] == 2
    assert m2["quality_status"] in ("pass", "warn", "fail")

    # true no-op replay: gold metrics still reported (manifest reads),
    # but no refresh work and no quality scan
    m3 = run_medallion_flow(
        spark, inbox, lake, ["order_id"],
        gold_views=[("daily", _daily)],
    )
    assert m3["gold"]["daily"] == 2
    assert m3["quality_status"] is None
    # the event log recorded exactly one gold refresh across all runs
    log = LakehouseTable(lake + "/_pipeline_log").read(spark)
    n_gold_events = log.where("event = 'gold_refreshed'").count()
    assert n_gold_events == 1


def test_cross_load_dedup_drops_seen_content(spark, tmp_path):
    """dedup_content_col: content already accepted by an earlier file
    never reaches bronze again; the persisted hash index survives
    runs and a crash between bronze commit and index append heals."""
    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "d1.csv"), "w") as f:
        f.write("Doc ID,Body\n1,alpha text\n2,beta text\n")

    def run():
        return run_medallion_flow(
            spark, inbox, lake, ["doc_id"], dedup_content_col="body"
        )

    m1 = run()
    assert m1["rows_dedup_dropped"] == 0
    bronze = LakehouseTable(lake + "/bronze")
    assert bronze.read(spark).count() == 2
    # a later file re-delivers alpha's content under a new id
    with open(os.path.join(inbox, "d2.csv"), "w") as f:
        f.write("Doc ID,Body\n7,alpha text\n8,gamma text\n")
    m2 = run()
    assert m2["rows_dedup_dropped"] == 1
    loaded = {r["doc_id"] for r in bronze.read(spark).collect()}
    assert loaded == {"1", "2", "8"}  # 7's content already in the lake
    # the index holds one row per distinct accepted content
    idx = LakehouseTable(lake + "/_dedup_index")
    assert idx.read(spark).count() == 3
    # crash window: d3's bronze commit stands but the index append
    # didn't happen — simulate by stamping bronze only
    with open(os.path.join(inbox, "d3.csv"), "w") as f:
        f.write("Doc ID,Body\n9,delta text\n")
    from biglake_iceberg_pipeline_spark.plans.medallion_flow import (
        _clean_for_bronze,
        _file_app_id,
    )
    from biglake_iceberg_pipeline_spark.sources.readers import read_auto

    app = _file_app_id("d3.csv")
    bronze.append(
        _clean_for_bronze(read_auto(spark, os.path.join(inbox, "d3.csv"))),
        txn=(app, 0),
    )
    m3 = run()  # replay: bronze skip, index heal
    assert m3["files_skipped"] >= 1
    assert idx.last_txn_version(app) == 0
    assert idx.read(spark).count() == 4
    # delta content re-arriving now dedups against the healed index
    with open(os.path.join(inbox, "d4.csv"), "w") as f:
        f.write("Doc ID,Body\n10,delta text\n")
    m4 = run()
    assert m4["rows_dedup_dropped"] == 1
    assert bronze.read(spark).where("doc_id = 10").count() == 0


def test_cross_load_dedup_heal_runs_before_loads(spark, tmp_path):
    """A file that sorts EARLIER than a crashed file must still dedup
    against the crashed file's content: the index heal is a pre-pass
    over every bronze-committed file, not a lazy step at the crashed
    file's sorted position."""
    from biglake_iceberg_pipeline_spark.plans.medallion_flow import (
        _clean_for_bronze,
        _file_app_id,
    )
    from biglake_iceberg_pipeline_spark.sources.readers import read_auto

    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    # z.csv loaded bronze (content X) but crashed before index append
    with open(os.path.join(inbox, "z.csv"), "w") as f:
        f.write("Doc ID,Body\n1,content x\n")
    bronze = LakehouseTable(lake + "/bronze")
    bronze.append(
        _clean_for_bronze(read_auto(spark, os.path.join(inbox, "z.csv"))),
        txn=(_file_app_id("z.csv"), 0),
    )
    # a.csv (sorts before z.csv) re-delivers content X under a new id
    with open(os.path.join(inbox, "a.csv"), "w") as f:
        f.write("Doc ID,Body\n9,content x\n")
    m = run_medallion_flow(
        spark, inbox, lake, ["doc_id"], dedup_content_col="body"
    )
    assert m["rows_dedup_dropped"] == 1  # a.csv's X dropped
    bodies = [r["body"] for r in bronze.read(spark).collect()]
    assert bodies == ["content x"]  # X in bronze exactly once


def test_cross_load_dedup_heals_from_archive(spark, tmp_path):
    """Crash window + a replay run WITHOUT dedup_content_col (flag
    toggled off) archives the crashed file out of the inbox; the next
    dedup-enabled run must heal the index from the ARCHIVE, or the
    file's content is re-admittable forever."""
    from biglake_iceberg_pipeline_spark.plans.medallion_flow import (
        _clean_for_bronze,
        _file_app_id,
    )
    from biglake_iceberg_pipeline_spark.sources.readers import read_auto

    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    arch = str(tmp_path / "arch")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "f.csv"), "w") as f:
        f.write("Doc ID,Body\n1,crashed content\n")
    bronze = LakehouseTable(lake + "/bronze")
    bronze.append(
        _clean_for_bronze(read_auto(spark, os.path.join(inbox, "f.csv"))),
        txn=(_file_app_id("f.csv"), 0),
    )
    # replay WITHOUT dedup: archives f.csv, no index work
    run_medallion_flow(spark, inbox, lake, ["doc_id"], archive_dir=arch)
    assert not os.listdir(inbox)
    # dedup-enabled run heals from the archive; re-delivered content
    # then dedups
    with open(os.path.join(inbox, "g.csv"), "w") as f:
        f.write("Doc ID,Body\n9,crashed content\n")
    m = run_medallion_flow(
        spark, inbox, lake, ["doc_id"],
        dedup_content_col="body", archive_dir=arch,
    )
    assert m["rows_dedup_dropped"] == 1
    assert bronze.read(spark).count() == 1


def test_cross_load_dedup_null_content_not_indexed(spark, tmp_path):
    """NULL content (blank / sentinel) rows load every time — absent
    content is not a duplicate — and never enter the hash index."""
    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "n1.csv"), "w") as f:
        f.write("Doc ID,Body\n1,N/A\n2,real stuff\n")
    run_medallion_flow(spark, inbox, lake, ["doc_id"], dedup_content_col="body")
    with open(os.path.join(inbox, "n2.csv"), "w") as f:
        f.write("Doc ID,Body\n3,N/A\n")
    m = run_medallion_flow(
        spark, inbox, lake, ["doc_id"], dedup_content_col="body"
    )
    assert m["rows_dedup_dropped"] == 0  # NULL is never a dup
    bronze = LakehouseTable(lake + "/bronze")
    assert bronze.read(spark).count() == 3
    idx = LakehouseTable(lake + "/_dedup_index").read(spark)
    assert idx.where(F.col("content_hash").isNull()).count() == 0
    assert idx.count() == 1  # only 'real stuff'


def test_bronze_rules_reject_bad_file_whole(spark, tmp_path):
    """bronze_rules gates each file through write-audit-publish: a
    violating file is rejected whole and stays in the inbox, later
    files still load, and a later re-run of the fixed inbox loads the
    corrected file normally."""
    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "a_bad.csv"), "w") as f:
        f.write("Order ID,Amount\n1,-5\n2,10\n")  # negative amount
    with open(os.path.join(inbox, "b_good.csv"), "w") as f:
        f.write("Order ID,Amount\n3,30\n")
    rules = {"amount_pos": F.col("amount") > 0}
    m = run_medallion_flow(
        spark, inbox, lake, ["order_id"], bronze_rules=rules
    )
    assert m["files_rejected"] == 1 and m["files_processed"] == 1
    bronze = LakehouseTable(lake + "/bronze")
    assert {r["order_id"] for r in bronze.read(spark).collect()} == {"3"}
    assert os.path.exists(os.path.join(inbox, "a_bad.csv"))  # quarantined
    # operator fixes the file; re-run loads it (txn stamp was never
    # written for the rejected file)
    with open(os.path.join(inbox, "a_bad.csv"), "w") as f:
        f.write("Order ID,Amount\n1,5\n2,10\n")
    m2 = run_medallion_flow(
        spark, inbox, lake, ["order_id"], bronze_rules=rules
    )
    assert m2["files_rejected"] == 0 and m2["files_processed"] == 1
    assert bronze.read(spark).count() == 3


def test_inbox_archival(spark, tmp_path):
    """Reference loader cleanup.py:16 analog: a processed file leaves
    the inbox for archive/<table>/<file>; redelivery no-ops; a crash
    between bronze commit and archival heals on replay."""
    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    archive = str(tmp_path / "archive")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "f1.csv"), "w") as f:
        f.write(F1)

    m1 = run_medallion_flow(
        spark, inbox, lake, ["order_id"], archive_dir=archive
    )
    assert m1["files_processed"] == 1 and m1["files_archived"] == 1
    assert os.listdir(inbox) == []  # inbox emptied
    assert os.path.exists(os.path.join(archive, "bronze", "f1.csv"))

    # redelivered file (same name, same content): commit stamp makes
    # the load a no-op, and the copy is re-archived
    with open(os.path.join(inbox, "f1.csv"), "w") as f:
        f.write(F1)
    m2 = run_medallion_flow(
        spark, inbox, lake, ["order_id"], archive_dir=archive
    )
    assert m2["files_processed"] == 0 and m2["files_skipped"] == 1
    assert m2["files_archived"] == 1 and os.listdir(inbox) == []
    assert m2["bronze_rows"] == m1["bronze_rows"]  # no double-load

    # crash window: commit landed (run without archive_dir), file
    # still in inbox; the next archiving run completes the move
    # without reloading
    with open(os.path.join(inbox, "f2.csv"), "w") as f:
        f.write(F2)
    m3 = run_medallion_flow(spark, inbox, lake, ["order_id"])
    assert m3["files_processed"] == 1
    assert os.path.exists(os.path.join(inbox, "f2.csv"))  # "crashed"
    m4 = run_medallion_flow(
        spark, inbox, lake, ["order_id"], archive_dir=archive
    )
    assert m4["files_processed"] == 0 and m4["files_skipped"] == 1
    assert m4["files_archived"] == 1 and os.listdir(inbox) == []
    assert m4["bronze_rows"] == m3["bronze_rows"]
    assert os.path.exists(os.path.join(archive, "bronze", "f2.csv"))


def test_identical_infile_rows_index_once(spark, tmp_path):
    """Fully identical in-file rows (same id AND content — bronze
    keeps both, only flagging them) must produce ONE index row per
    content hash; duplicate index entries would fan out every later
    file's left join against the index."""
    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "twin.csv"), "w") as f:
        f.write("Doc ID,Body\n1,same text\n1,same text\n2,other\n")
    run_medallion_flow(
        spark, inbox, lake, ["doc_id"], dedup_content_col="body"
    )
    idx = LakehouseTable(lake + "/_dedup_index").read(spark)
    assert idx.count() == 2  # one row per distinct content
    assert idx.select("content_hash").distinct().count() == 2
    # a later duplicate delivery joins to exactly one index row
    with open(os.path.join(inbox, "redeliver.csv"), "w") as f:
        f.write("Doc ID,Body\n9,same text\n")
    m = run_medallion_flow(
        spark, inbox, lake, ["doc_id"], dedup_content_col="body"
    )
    assert m["rows_dedup_dropped"] == 1


def test_audit_rejected_file_reports_no_dedup_drops(spark, tmp_path):
    """A file rejected whole by the bronze WAP audit must not count
    dedup-dropped rows it never loaded (metrics accounting runs after
    the audit gate)."""
    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "a_ok.csv"), "w") as f:
        f.write("Doc ID,Body\n1,alpha\n2,beta\n")
    rules = {"no_gamma": F.col("body") != "gamma"}
    run_medallion_flow(
        spark, inbox, lake, ["doc_id"],
        dedup_content_col="body", bronze_rules=rules,
    )
    # b_bad re-delivers alpha (a cross-file dup) AND fails the audit
    # (a forbidden 'gamma' row) — the whole file is rejected, so NO
    # dedup drop may be reported and the index must not grow
    with open(os.path.join(inbox, "b_bad.csv"), "w") as f:
        f.write("Doc ID,Body\n3,alpha\n4,gamma\n")
    m = run_medallion_flow(
        spark, inbox, lake, ["doc_id"],
        dedup_content_col="body", bronze_rules=rules,
    )
    assert m["files_rejected"] == 1
    assert m["rows_dedup_dropped"] == 0
    idx = LakehouseTable(lake + "/_dedup_index").read(spark)
    assert idx.count() == 2  # gamma never accepted


def test_gold_dim_join_uses_advisor(spark, tmp_path):
    """gold_dim_joins materializes silver LEFT-enriched with a dim
    lakehouse table; the join strategy comes from the stats advisor
    in no-scan mode, the advice trail is in metrics + _advice.json,
    and the view refreshes only when silver or the dim moved."""
    import json

    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "orders.csv"), "w") as f:
        f.write("Order ID,Cust\n1,a\n2,b\n3,a\n")
    dim = LakehouseTable(str(tmp_path / "cust_dim"))
    dim.append(
        spark.createDataFrame(
            [("a", "gold-tier"), ("b", "basic")], "cust string, tier string"
        )
    )

    def run():
        return run_medallion_flow(
            spark, inbox, lake, ["order_id"],
            gold_dim_joins=[("orders_enriched", dim.path, "cust")],
        )

    m1 = run()
    advice = m1["gold_advice"]["orders_enriched"]
    assert advice["strategy"] == "broadcast"  # tiny dim
    assert m1["gold"]["orders_enriched"] == 3
    g = LakehouseTable(lake + "/gold/orders_enriched")
    rows = {(r["order_id"], r["tier"]) for r in g.read(spark).collect()}
    assert rows == {(1, "gold-tier"), (2, "basic"), (3, "gold-tier")}
    with open(os.path.join(g.path, "_advice.json")) as fh:
        state = json.load(fh)
    assert state["advice"]["strategy"] == "broadcast"
    # no inputs moved → the view is fresh, no re-materialization
    snap_before = g.current_snapshot_id()
    m2 = run()
    assert g.current_snapshot_id() == snap_before
    assert m2["gold"]["orders_enriched"] == 3
    # dim moves → refresh picks it up (silver unchanged)
    dim.append(
        spark.createDataFrame([("c", "new")], "cust string, tier string")
    )
    m3 = run()
    assert g.current_snapshot_id() != snap_before
    assert m3["gold"]["orders_enriched"] == 3  # left join: silver rows


def test_gold_dim_join_repoint_invalidates_freshness(spark, tmp_path):
    """Re-pointing a gold_dim_joins entry at a DIFFERENT dim table
    (or key) must re-materialize even when the snapshot ids collide
    (they start at 1 for every table) — the watermark pins the whole
    join config, not just ids."""
    inbox = str(tmp_path / "inbox")
    lake = str(tmp_path / "lake")
    os.makedirs(inbox)
    with open(os.path.join(inbox, "orders.csv"), "w") as f:
        f.write("Order ID,Cust\n1,a\n")
    dim_a = LakehouseTable(str(tmp_path / "dimA"))
    dim_a.append(
        spark.createDataFrame([("a", "tierA")], "cust string, tier string")
    )
    dim_b = LakehouseTable(str(tmp_path / "dimB"))
    dim_b.append(
        spark.createDataFrame([("a", "tierB")], "cust string, tier string")
    )
    run_medallion_flow(
        spark, inbox, lake, ["order_id"],
        gold_dim_joins=[("g", dim_a.path, "cust")],
    )
    g = LakehouseTable(lake + "/gold/g")
    assert g.read(spark).collect()[0]["tier"] == "tierA"
    # same gold name, same snapshot ids, different dim table
    run_medallion_flow(
        spark, inbox, lake, ["order_id"],
        gold_dim_joins=[("g", dim_b.path, "cust")],
    )
    assert g.read(spark).collect()[0]["tier"] == "tierB"
