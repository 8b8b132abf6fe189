"""Metadata inspection tables (Iceberg metadata-table parity):
inspect('files' / 'delete_files' / 'snapshots' / 'partitions' /
'refs') answer table-shape questions from the manifest alone — no
data page is opened, pinned here by inspecting a table whose data
files have been moved away."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def _tbl(spark, tmp_path, name="tbl", partition_by=None):
    t = LakehouseTable(str(tmp_path / name), partition_by=partition_by)
    return t


def test_inspect_files_matches_manifest(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    s1 = t.append(spark.range(10).withColumn("v", F.lit("a")))
    s2 = t.append(spark.range(10, 30).withColumn("v", F.lit("b")))
    files = t.inspect(spark, "files").collect()
    assert {r.file_path for r in files} == set(t.snapshots[-1]["files"])
    assert sum(r.row_count for r in files) == 30
    assert all(r.size_bytes > 0 for r in files)
    assert all(r.owned for r in files)
    # add-order watermark per file: first batch stamped s1, second s2
    by_snap = {r.file_path: r.added_at_snapshot for r in files}
    first = set(t.snapshots[0]["files"]) & set(by_snap)
    assert first and all(by_snap[f] == s1 for f in first)
    assert any(v == s2 for v in by_snap.values())
    # footer bounds surfaced as stringified min/max
    lo = min(int(r.lower_bounds["id"]) for r in files)
    hi = max(int(r.upper_bounds["id"]) for r in files)
    assert (lo, hi) == (0, 29)


def test_inspect_time_travel_and_no_data_scan(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    s1 = t.append(spark.range(5))
    t.append(spark.range(5, 8))
    # historical snapshot: only the first batch's files
    old = t.inspect(spark, "files", snapshot_id=s1).collect()
    assert {r.file_path for r in old} == set(t.snapshots[0]["files"])
    # metadata-only pin: move every data file away; inspect still
    # answers fully — sizes, counts, and bounds all come from the
    # manifest (r7: file_sizes recorded at commit, so not even a
    # stat touches storage — the stronger Iceberg-manifest contract)
    recorded = t._read_manifest()["file_sizes"]
    moved = str(tmp_path / "moved")
    shutil.move(os.path.join(t.path, "data"), moved)
    rows = t.inspect(spark, "files").collect()
    assert len(rows) == len(t.snapshots[-1]["files"])
    assert all(
        r.size_bytes == recorded[r.file_path] and r.size_bytes > 0
        for r in rows
    )
    assert sum(r.row_count for r in rows) == 8
    parts = t.inspect(spark, "partitions").collect()
    assert len(parts) == 1 and parts[0].row_count == 8
    assert parts[0].size_bytes == sum(recorded.values())


def test_inspect_snapshots_log(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.append(spark.range(4))
    t.append(spark.range(4, 10))
    t.compact(spark, target_files=1)
    log = t.inspect(spark, "snapshots").orderBy("snapshot_id").collect()
    assert [r.operation for r in log] == ["append", "append", "replace"]
    assert [r.added_rows for r in log[:2]] == [4, 6]
    # rewrites report written_*, never added_* (load-size audits)
    assert log[2].added_rows is None and log[2].written_rows == 10
    assert log[2].total_files == 1
    assert all(r.committed_at is not None for r in log)
    with pytest.raises(ValueError, match="full log"):
        t.inspect(spark, "snapshots", snapshot_id=1)


def test_inspect_partitions_rollup(spark, tmp_path):
    t = _tbl(spark, tmp_path, partition_by=["grp"])
    df = spark.range(20).withColumn("grp", (F.col("id") % 2).cast("int"))
    t.append(df)
    parts = t.inspect(spark, "partitions").collect()
    assert len(parts) == 2
    got = {r.partition["grp"]: (r.row_count, r.file_count) for r in parts}
    assert got["0"][0] == 10 and got["1"][0] == 10
    assert all(r.size_bytes > 0 for r in parts)
    total_files = sum(r.file_count for r in parts)
    assert total_files == len(t.snapshots[-1]["files"])


def test_inspect_delete_files_position_and_equality(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.append(spark.range(10).withColumn("k", F.col("id") % 5))
    t.delete_where(spark, "id >= 8", mode="merge-on-read")
    src = spark.range(2).withColumn("k", F.lit(99).cast("bigint"))
    t.merge(spark, src, keys=["id"], mode="merge-on-read")
    dels = t.inspect(spark, "delete_files").collect()
    kinds = sorted(r.kind for r in dels)
    assert kinds == ["equality", "position"]
    eq = next(r for r in dels if r.kind == "equality")
    pos = next(r for r in dels if r.kind == "position")
    assert eq.equality_keys == ["id"] and eq.applies_to is not None
    assert pos.row_count == 2  # two position-deleted rows
    assert pos.equality_keys is None
    # pre-delete snapshot has an empty delete tail
    first = t.snapshots[0]["id"]
    assert t.inspect(spark, "delete_files", snapshot_id=first).count() == 0


def test_inspect_refs_tags_and_branches(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    s1 = t.append(spark.range(3))
    t.tag("v1", s1)
    t.create_branch("backfill")
    t.append_to_branch("backfill", spark.range(3, 6))
    t.append_to_branch("backfill", spark.range(6, 9))
    refs = {r.name: r for r in t.inspect(spark, "refs").collect()}
    assert refs["v1"].type == "tag" and refs["v1"].snapshot_id == s1
    br = refs["backfill"]
    assert br.type == "branch"
    assert br.snapshot_id == s1 and br.staged_commits == 2
    t.delete_branch("backfill")
    assert t.inspect(spark, "refs").count() == 1


def test_inspect_empty_table_and_unknown_kind(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    for kind in LakehouseTable.INSPECT_KINDS:
        assert t.inspect(spark, kind).count() == 0
    with pytest.raises(ValueError, match="unknown metadata table"):
        t.inspect(spark, "manifests")
    # typed empties: downstream code can still select columns
    assert "row_count" in t.inspect(spark, "files").columns


def test_inspect_files_marks_external_registrations(spark, tmp_path):
    ext = str(tmp_path / "external")
    spark.range(7).write.parquet(ext)
    t = _tbl(spark, tmp_path)
    t.append(spark.range(3))
    t.add_files(spark, ext)
    rows = t.inspect(spark, "files").collect()
    owned = {r.file_path: r.owned for r in rows}
    assert sum(1 for v in owned.values() if not v) >= 1
    assert sum(1 for v in owned.values() if v) >= 1
    ext_rows = [r for r in rows if not r.owned]
    assert sum(r.row_count for r in ext_rows) == 7


def test_inspect_manifest_segments(spark, tmp_path):
    """inspect('manifest') surfaces the F40 segmented layout: a core
    row with the generation plus one row per segment with its
    snapshot span, reset flag, on-disk bytes, and per-file map entry
    count — the ops view for segment-compaction decisions."""
    import pytest

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    t = LakehouseTable(str(tmp_path / "t"))
    for i in range(3):
        t.append(spark.createDataFrame([(i,)], "id long"))
    rows = {r["segment"]: r for r in t.inspect(spark, "manifest").collect()}
    core = rows.pop("_manifest.json")
    assert core["generation"] == 3 and core["size_bytes"] > 0
    assert len(rows) >= 1
    seg = list(rows.values())[0]
    assert seg["n_snapshots"] == 3 and seg["reset"] is True
    assert seg["size_bytes"] > 0
    # per-file maps: stats/rows/sizes/added_at (+ partitions) entries
    assert seg["map_entries"] >= 3 * 4
    with pytest.raises(ValueError, match="physical layout"):
        t.inspect(spark, "manifest", snapshot_id=1)


def test_inspect_schema_shows_evolution(spark, tmp_path):
    """inspect('schema'): current columns with their prior-name
    vintages, plus retired names (renamed-away / dropped) — the
    observability face of metadata-only DDL."""
    import pytest

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "a", 10)], "id long, name string, qty int"
        )
    )
    t.rename_column("name", "customer_name")
    t.widen_column("qty", "bigint")
    t.drop_column("qty")
    rows = {
        r["column"]: r
        for r in t.inspect(spark, "schema").collect()
    }
    assert rows["id"]["status"] == "current"
    assert rows["customer_name"]["prior_names"] == ["name"]
    assert rows["name"]["status"] == "retired:renamed"
    assert rows["qty"]["status"] == "retired:dropped"
    assert set(
        k for k, r in rows.items() if r["status"] == "current"
    ) == {"id", "customer_name"}
    # as-of: the original schema has no retirements yet
    old_rows = {
        r["column"]: r
        for r in t.inspect(spark, "schema", snapshot_id=1).collect()
    }
    assert set(old_rows) == {"id", "name", "qty"}
    assert all(r["status"] == "current" for r in old_rows.values())
    assert old_rows["qty"]["type"] == "int"  # pre-widen
