"""Merge-on-read row-level deletes (Iceberg format-v2 delete files,
re-expressed on the JSON manifest): position-delete commits from
delete_where(mode="merge-on-read"), equality-delete commits from
merge(mode="merge-on-read"), the read-side anti-join overlay, and the
lifecycle integration (compaction materializes, expiry/orphan-sweep/
clone/branch GC protect, rollback carries, time travel respects).

Reference parity note: the reference pipeline delegates row-level
deletes to BigQuery DML (services/loader); on Spark the scale-correct
design is Iceberg's — a DELETE at 100 TB must cost O(matched rows),
not an O(table) rewrite.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
    LakehouseTable,
    SnapshotNotFoundError,
)


def _mk(spark, path, n=100, parts=3):
    t = LakehouseTable(str(path))
    df = spark.createDataFrame(
        [(i, f"u{i}", i % parts) for i in range(n)],
        "id long, name string, grp long",
    )
    t.append(df)
    return t


# ----------------------------------------------------- position deletes


def test_mor_delete_no_rewrite_and_correct_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    files_before = list(t.snapshots[-1]["files"])
    s2 = t.delete_where(spark, "grp = 1", mode="merge-on-read")
    snap = t.snapshots[-1]
    assert snap["id"] == s2
    # the defining property: data files untouched, only a delete file
    assert snap["files"] == files_before
    assert snap.get("deletes")
    assert t.read(spark).count() == 67
    # deleted rows are really gone, survivors intact
    assert t.read(spark).where("grp = 1").count() == 0
    assert t.read(spark).where("grp = 0").count() == 34


def test_mor_delete_row_count_exact_from_metadata(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 1", mode="merge-on-read")
    assert t.row_count() == 67  # no scan: footer counts minus deletes


def test_mor_delete_time_travel_sees_predelete_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    s1 = t.current_snapshot_id()
    t.delete_where(spark, "id < 50", mode="merge-on-read")
    assert t.read(spark, snapshot_id=s1).count() == 100
    assert t.read(spark).count() == 50
    assert t.row_count(s1) == 100
    assert t.row_count() == 50


def test_mor_delete_stacks_without_double_subtract(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 1", mode="merge-on-read")
    # overlapping predicate: grp>=1 re-matches already-deleted rows;
    # the match scan runs on the delete-APPLIED state so they are
    # neither re-deleted nor double-subtracted
    t.delete_where(spark, "grp >= 1", mode="merge-on-read")
    assert t.read(spark).count() == 34
    assert t.row_count() == 34
    assert len(t.snapshots[-1]["deletes"]) == 2


def test_mor_delete_no_match_is_a_noop_commit(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    pre = t.current_snapshot_id()
    got = t.delete_where(spark, "grp = 99", mode="merge-on-read")
    assert got == pre
    assert t.current_snapshot_id() == pre
    assert not t.snapshots[-1].get("deletes")


def test_mor_delete_carried_across_appends(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 2", mode="merge-on-read")
    t.append(
        spark.createDataFrame(
            [(1000, "x", 2)], "id long, name string, grp long"
        )
    )
    # the old grp=2 rows stay deleted; the new grp=2 row lives
    assert t.read(spark).where("grp = 2").count() == 1
    assert t.row_count() == 68


def test_mor_delete_with_ranges_prunes_then_matches(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    # two sorted appends -> disjoint id ranges per file set
    t.append(
        spark.createDataFrame(
            [(i, i % 3) for i in range(50)], "id long, grp long"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(i, i % 3) for i in range(50, 100)], "id long, grp long"
        ).coalesce(1)
    )
    t.delete_where(
        spark,
        "id >= 60 and id < 70",
        mode="merge-on-read",
        ranges={"id": (60, 69)},
    )
    assert t.read(spark).count() == 90
    assert t.read(spark).where("id >= 60 and id < 70").count() == 0
    assert t.row_count() == 90


def test_mor_delete_scan_applies_overlay(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "id < 10", mode="merge-on-read")
    got = t.scan(spark, ranges={"id": (0, 19)})
    assert got.count() == 10
    assert got.agg(F.min("id")).first()[0] == 10


def test_mor_delete_on_partitioned_table(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    df = spark.createDataFrame(
        [(i, f"u{i}", i % 3) for i in range(60)],
        "id long, name string, grp long",
    )
    t.append(df)
    t.delete_where(spark, "grp = 1 and id < 30", mode="merge-on-read")
    out = t.read(spark)
    assert out.count() == 50
    assert out.where("grp = 1").count() == 10
    # partition column survives the with_meta read path
    assert set(out.columns) == {"id", "name", "grp"}
    assert t.row_count() == 50


# ----------------------------------------------------- equality deletes


def test_mor_merge_updates_and_inserts(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    files_before = list(t.snapshots[-1]["files"])
    src = spark.createDataFrame(
        [(3, "NEW", 7), (2000, "ins", 7)],
        "id long, name string, grp long",
    )
    t.merge(spark, src, keys=["id"], mode="merge-on-read")
    snap = t.snapshots[-1]
    # old data files untouched; new files appended; one delete file
    assert set(files_before) <= set(snap["files"])
    assert len(snap["files"]) > len(files_before)
    assert snap.get("deletes")
    rows = {r.id: r.name for r in t.read(spark).collect()}
    assert rows[3] == "NEW"
    assert rows[2000] == "ins"
    assert len(rows) == 11
    # equality deletes make the metadata count unknowable
    assert t.row_count() is None


def test_mor_merge_scoping_row_appended_after_survives(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    src = spark.createDataFrame(
        [(0, "NEW", 7)], "id long, name string, grp long"
    )
    t.merge(spark, src, keys=["id"], mode="merge-on-read")
    # a row with a matching key appended AFTER the equality delete
    # committed must survive it (added_at scoping)
    t.append(
        spark.createDataFrame(
            [(0, "after", 9)], "id long, name string, grp long"
        )
    )
    names = sorted(
        r.name for r in t.read(spark).where("id = 0").collect()
    )
    assert names == ["NEW", "after"]


def test_mor_merge_into_empty_table_is_append(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    src = spark.createDataFrame([(1, "a")], "id long, v string")
    t.merge(spark, src, keys=["id"], mode="merge-on-read")
    assert t.read(spark).count() == 1
    assert t.history()[-1]["operation"] == "append"


def test_mor_merge_duplicate_source_keys_raise_and_clean_stage(
    spark, tmp_path
):
    t = _mk(spark, tmp_path / "t", n=5)
    n_dirs = len(os.listdir(tmp_path / "t" / "data"))
    src = spark.createDataFrame(
        [(1, "a", 0), (1, "b", 0)], "id long, name string, grp long"
    )
    with pytest.raises(ValueError, match="duplicate merge keys"):
        t.merge(spark, src, keys=["id"], mode="merge-on-read")
    # staged data dir removed — no orphan left behind
    assert len(os.listdir(tmp_path / "t" / "data")) == n_dirs
    assert t.read(spark).count() == 5


def test_mor_merge_txn_replay_noops(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    src = spark.createDataFrame(
        [(0, "NEW", 7)], "id long, name string, grp long"
    )
    s1 = t.merge(
        spark, src, keys=["id"], mode="merge-on-read", txn=("app", 1)
    )
    s2 = t.merge(
        spark, src, keys=["id"], mode="merge-on-read", txn=("app", 1)
    )
    assert s2 == s1
    assert t.read(spark).where("id = 0").count() == 1


def test_mor_merge_chained_latest_wins(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    for ver in ("v1", "v2"):
        src = spark.createDataFrame(
            [(2, ver, 7)], "id long, name string, grp long"
        )
        t.merge(spark, src, keys=["id"], mode="merge-on-read")
    rows = t.read(spark).where("id = 2").collect()
    assert [r.name for r in rows] == ["v2"]
    assert t.read(spark).count() == 5


# ------------------------------------------------- lifecycle integration


def test_compact_materializes_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    t.merge(
        spark,
        spark.createDataFrame(
            [(1, "NEW", 7)], "id long, name string, grp long"
        ),
        keys=["id"],
        mode="merge-on-read",
    )
    before = {
        (r.id, r.name) for r in t.read(spark).collect()
    }
    t.compact(spark, target_files=2)
    snap = t.snapshots[-1]
    assert not snap.get("deletes")
    assert {
        (r.id, r.name) for r in t.read(spark).collect()
    } == before
    # metadata count exact again after materialization
    assert t.row_count() == len(before)


def test_expiry_reclaims_dead_delete_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    dels = list(t.snapshots[-1]["deletes"])
    t.compact(spark, target_files=1)
    assert all(os.path.exists(d) for d in dels)  # time travel alive
    t.expire_snapshots(keep_last=1)
    assert all(not os.path.exists(d) for d in dels)
    # per-file metadata pruned with them
    man = t._read_manifest()
    assert not set(dels) & set(man.get("delete_meta", {}))
    assert not set(dels) & set(man.get("file_rows", {}))


def test_expiry_keeps_delete_files_of_live_snapshots(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    dels = list(t.snapshots[-1]["deletes"])
    t.append(
        spark.createDataFrame(
            [(1000, "x", 0)], "id long, name string, grp long"
        )
    )
    t.expire_snapshots(keep_last=2)
    assert all(os.path.exists(d) for d in dels)
    assert t.read(spark).count() == 67


def test_orphan_sweep_reclaims_uncommitted_delete_files(
    spark, tmp_path
):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    live = list(t.snapshots[-1]["deletes"])
    # fake a crashed MoR writer: a delete file no snapshot references
    orphan_dir = tmp_path / "t" / "deletes" / "del-orphan"
    os.makedirs(orphan_dir)
    orphan = orphan_dir / "part-0.parquet"
    orphan.write_bytes(b"junk")
    old = 10_000
    os.utime(orphan, (os.path.getmtime(orphan) - old,) * 2)
    removed = t.sweep_orphans(older_than_s=3600)
    assert str(orphan) in removed
    assert all(os.path.exists(d) for d in live)
    assert t.read(spark).count() == 66


def test_rollback_preserves_delete_tail(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    s_del = t.current_snapshot_id()
    t.append(
        spark.createDataFrame(
            [(1000, "x", 0)], "id long, name string, grp long"
        )
    )
    t.rollback_to(s_del)
    # rolled-back state must NOT resurrect the deleted rows
    assert t.read(spark).count() == 66
    assert t.snapshots[-1].get("deletes")


def test_cow_delete_after_mor_materializes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    t.delete_where(spark, "grp = 1")  # copy-on-write
    snap = t.snapshots[-1]
    assert not snap.get("deletes")
    assert t.read(spark).count() == 33
    assert t.row_count() == 33


def test_update_where_respects_outstanding_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    t.update_where(spark, "grp = 1", {"name": F.lit("upd")})
    out = t.read(spark)
    assert out.count() == 66  # deleted rows did not come back
    assert out.where("name = 'upd'").count() == 33


def test_clone_sees_delete_applied_state_and_protects(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    dels = list(t.snapshots[-1]["deletes"])
    c = t.clone_to(str(tmp_path / "c"))
    assert c.read(spark).count() == 66
    # source maintenance cannot reap delete files the clone reads
    t.overwrite(spark.range(1).withColumn("name", F.lit("x")))
    t.expire_snapshots(keep_last=1)
    t.sweep_orphans(older_than_s=0)
    assert all(os.path.exists(d) for d in dels)
    assert c.read(spark).count() == 66


def test_branch_read_applies_base_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    t.create_branch("dev")
    assert t.read(spark, branch="dev").count() == 66
    t.append_to_branch(
        "dev",
        spark.createDataFrame(
            [(1000, "x", 0)], "id long, name string, grp long"
        ),
    )
    # staged row with a "deleted" grp value still shows (it's new)
    assert t.read(spark, branch="dev").count() == 67
    s = t.fast_forward("dev")
    assert t.read(spark).count() == 67
    assert t.snapshots[-1]["id"] == s
    # published snapshot carries the delete tail
    assert t.snapshots[-1].get("deletes")


def test_branch_protects_delete_files_from_expiry(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    dels = list(t.snapshots[-1]["deletes"])
    t.create_branch("dev")
    t.overwrite(spark.range(1).withColumn("name", F.lit("x")))
    t.expire_snapshots(keep_last=1)
    assert all(os.path.exists(d) for d in dels)
    assert t.read(spark, branch="dev").count() == 66


def test_change_feed_across_mor_delete_classifies(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    s1 = t.current_snapshot_id()
    t.delete_where(spark, "id < 3", mode="merge-on-read")
    feed = t.change_feed(spark, s1, keys=["id"])
    by_type = {
        r.id: r._change_type for r in feed.collect()
    }
    assert by_type == {0: "delete", 1: "delete", 2: "delete"}


def test_incremental_scan_refuses_mor_delete_range(spark, tmp_path):
    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LineageBrokenError,
    )

    t = _mk(spark, tmp_path / "t", n=10)
    s1 = t.current_snapshot_id()
    t.delete_where(spark, "id < 3", mode="merge-on-read")
    with pytest.raises(LineageBrokenError):
        t.incremental_scan(spark, s1)


def test_mor_delete_sets_vector_index_staleness(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    t.delete_where(spark, "id < 3", mode="merge-on-read")
    assert t.last_row_rewrite_snapshot() == t.current_snapshot_id()


def test_materialize_deletes_rewrites_only_affected_files(
    spark, tmp_path
):
    t = LakehouseTable(str(tmp_path / "t"))
    # two appends -> two disjoint file sets; delete touches only set 1
    t.append(
        spark.createDataFrame(
            [(i, i % 3) for i in range(50)], "id long, grp long"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(i, i % 3) for i in range(50, 100)], "id long, grp long"
        ).coalesce(1)
    )
    untouched = set(t.snapshots[-1]["files"]) - set(
        t.snapshots[0]["files"]
    )
    t.delete_where(spark, "id < 10", mode="merge-on-read")
    t.materialize_deletes(spark)
    snap = t.snapshots[-1]
    assert not snap.get("deletes")
    # the second append's files carried byte-identical (same paths)
    assert untouched <= set(snap["files"])
    # the first append's files were rewritten (dropped rows gone)
    assert not set(t.snapshots[0]["files"]) & set(snap["files"])
    assert t.read(spark).count() == 90
    assert t.row_count() == 90
    # idempotent: nothing outstanding -> no new snapshot
    assert t.materialize_deletes(spark) == snap["id"]


def test_materialize_equality_deletes_prunes_by_key_range(
    spark, tmp_path
):
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, f"u{i}") for i in range(50)], "id long, name string"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(i, f"u{i}") for i in range(1000, 1050)],
            "id long, name string",
        ).coalesce(1)
    )
    out_of_range = set(t.snapshots[-1]["files"]) - set(
        t.snapshots[0]["files"]
    )
    src = spark.createDataFrame(
        [(3, "NEW")], "id long, name string"
    )
    t.merge(spark, src, keys=["id"], mode="merge-on-read")
    merged_files = set(t.snapshots[-1]["files"])
    t.materialize_deletes(spark)
    snap = t.snapshots[-1]
    assert not snap.get("deletes")
    # key range [3,3] doesn't intersect [1000,1050]: file carried
    assert out_of_range <= set(snap["files"])
    # the merge's own staged file (added after the delete) carried too
    assert (merged_files - set(t.snapshots[0]["files"])) <= set(
        snap["files"]
    )
    rows = {r.id: r.name for r in t.read(spark).collect()}
    assert rows[3] == "NEW" and len(rows) == 100
    assert t.row_count() == 100  # exact again post-materialization


def test_mor_update_where_delete_plus_insert_one_commit(
    spark, tmp_path
):
    t = _mk(spark, tmp_path / "t")
    files_before = list(t.snapshots[-1]["files"])
    n_snaps = len(t.snapshots)
    t.update_where(
        spark,
        "grp = 1",
        {"name": F.lit("upd")},
        mode="merge-on-read",
    )
    assert len(t.snapshots) == n_snaps + 1  # one commit
    snap = t.snapshots[-1]
    assert set(files_before) <= set(snap["files"])  # no rewrite
    assert snap.get("deletes")
    out = t.read(spark)
    assert out.count() == 100
    assert out.where("name = 'upd'").count() == 33
    assert out.where("grp = 1 and name != 'upd'").count() == 0
    assert t.row_count() == 100  # position deletes: still exact


def test_mor_update_no_match_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    pre = t.current_snapshot_id()
    got = t.update_where(
        spark, "grp = 99", {"name": F.lit("x")}, mode="merge-on-read"
    )
    assert got == pre
    assert t.current_snapshot_id() == pre


def test_mor_update_respects_prior_mor_delete(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 0", mode="merge-on-read")
    t.update_where(
        spark, "id < 50", {"name": F.lit("upd")}, mode="merge-on-read"
    )
    out = t.read(spark)
    assert out.count() == 66  # deleted rows not resurrected
    # 50 ids < 50, minus the 17 grp=0 ones already deleted
    assert out.where("name = 'upd'").count() == 33
    assert t.row_count() == 66


def test_mor_update_sets_vector_index_staleness(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10)
    t.update_where(
        spark, "id = 1", {"name": F.lit("x")}, mode="merge-on-read"
    )
    assert t.last_row_rewrite_snapshot() == t.current_snapshot_id()


def test_analyze_incremental_row_count_subtracts_mor_deletes(
    spark, tmp_path
):
    t = _mk(spark, tmp_path / "t")
    t.ndv(spark)  # opt into sketch stats
    t.delete_where(spark, "grp = 1", mode="merge-on-read")
    stats = t.analyze_incremental(spark)
    assert stats["row_count"] == 67  # not the 100 footer rows


def test_maintain_materializes_long_delete_tail(spark, tmp_path):
    # few data files, many MoR deletes: the delete-tail trigger (not
    # the file-count one) must fire compaction, or reads pay an
    # ever-growing stack of anti-joins
    t = _mk(spark, tmp_path / "t")
    for i in range(5):
        t.delete_where(spark, f"id = {i}", mode="merge-on-read")
    assert len(t.snapshots[-1]["deletes"]) == 5
    report = t.maintain(spark, max_files=64, max_delete_files=4)
    assert report["deletes_materialized"] == 5
    assert not t.snapshots[-1].get("deletes")
    assert t.read(spark).count() == 95
    assert t.row_count() == 95
    # below the threshold: no compaction churn
    t.delete_where(spark, "id = 10", mode="merge-on-read")
    report = t.maintain(spark, max_files=64, max_delete_files=4)
    assert report["compacted_from"] is None
    assert len(t.snapshots[-1].get("deletes", [])) == 1


def test_mor_survives_percent_escaped_paths(spark, tmp_path):
    # _metadata.file_path is a Hadoop URI: a table dir with a space
    # (or an escapable partition value) arrives percent-encoded while
    # the manifest holds raw paths — __file must decode to match
    t = LakehouseTable(str(tmp_path / "my table"))
    t.append(
        spark.createDataFrame(
            [(i, i % 2) for i in range(10)], "id long, grp long"
        ).coalesce(1)
    )
    t.delete_where(spark, "grp = 1", mode="merge-on-read")
    assert t.read(spark).count() == 5
    t.materialize_deletes(spark)
    assert not t.snapshots[-1].get("deletes")
    assert t.read(spark).count() == 5  # no resurrection
    # equality-delete scoping on a partitioned table with an
    # escapable partition value
    p = LakehouseTable(
        str(tmp_path / "p"), partition_by=["grp"]
    )
    p.append(
        spark.createDataFrame(
            [(1, "old", "a b"), (2, "keep", "a b")],
            "id long, name string, grp string",
        )
    )
    p.merge(
        spark,
        spark.createDataFrame(
            [(1, "NEW", "a b")], "id long, name string, grp string"
        ),
        keys=["id"],
        mode="merge-on-read",
    )
    rows = {r.id: r.name for r in p.read(spark).collect()}
    assert rows == {1: "NEW", 2: "keep"}
    p.materialize_deletes(spark)
    rows = {r.id: r.name for r in p.read(spark).collect()}
    assert rows == {1: "NEW", 2: "keep"}


def test_materialize_handles_null_merge_keys(spark, tmp_path):
    # parquet min/max stats exclude NULLs, but the read overlay
    # matches NULL keys via eqNullSafe — pruning must not skip files
    # whose only match is a NULL key
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(100, "a"), (200, "b"), (None, "old-null")],
            "id long, name string",
        ).coalesce(1)
    )
    t.merge(
        spark,
        spark.createDataFrame(
            [(5, "five"), (None, "new-null")], "id long, name string"
        ),
        keys=["id"],
        mode="merge-on-read",
    )
    before = sorted(
        [(r.id, r.name) for r in t.read(spark).collect()], key=str
    )
    assert len(before) == 4  # old-null replaced by new-null
    t.materialize_deletes(spark)
    after = sorted(
        [(r.id, r.name) for r in t.read(spark).collect()], key=str
    )
    assert after == before  # old NULL-key row did not resurrect


def test_mor_merge_missing_key_column_raises(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    src = spark.createDataFrame([("zzz",)], "name string")
    with pytest.raises(ValueError, match="merge keys missing"):
        t.merge(spark, src, keys=["id"], mode="merge-on-read")
    assert t.read(spark).count() == 5


def test_maintain_report_has_deletes_key_on_quiet_run(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    report = t.maintain(spark, max_files=64, max_delete_files=4)
    assert report["deletes_materialized"] == 0


def test_unknown_modes_raise(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=5)
    with pytest.raises(ValueError, match="unknown delete mode"):
        t.delete_where(spark, "id = 1", mode="sideways")
    with pytest.raises(ValueError, match="unknown merge mode"):
        t.merge(
            spark,
            spark.createDataFrame([(1, "a", 0)], "id long, name string, grp long"),
            keys=["id"],
            mode="sideways",
        )
