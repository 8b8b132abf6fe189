"""add_files (Iceberg's add_files procedure): register existing
parquet into the table as a METADATA operation — the migration path
for onboarding already-written data at 100 TB without an ingest. Plus
snapshot summaries (Iceberg snapshot summary: added files/rows per
commit from footer metadata).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def _external(spark, tmp_path, name, n=20, start=0, cols="full"):
    p = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, f"u{i}", float(i)) for i in range(start, start + n)],
        "id long, name string, v double",
    )
    if cols == "narrow":
        df = df.select("id", "name")
    df.coalesce(1).write.parquet(p)
    return p


def test_add_files_is_metadata_only(spark, tmp_path):
    ext = _external(spark, tmp_path, "ext")
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1000, "a", 0.5)], "id long, name string, v double"
        )
    )
    t.add_files(spark, ext)
    assert t.read(spark).count() == 21
    # no bytes copied: the table dir holds only its own append
    ext_files = [
        f for f in t.snapshots[-1]["files"] if f.startswith(ext)
    ]
    assert ext_files
    assert not any(
        f.startswith(ext)
        for root, _d, names in os.walk(str(tmp_path / "t"))
        for f in [os.path.join(root, n) for n in names]
    )
    # footer stats/rows recorded: metadata row_count and pruning work
    assert t.row_count() == 21
    kept = t.pruned_files({"id": (0, 5)})
    assert ext_files[0] in kept


def test_add_files_schema_evolves_and_overlays(spark, tmp_path):
    ext = _external(spark, tmp_path, "ext", cols="narrow")
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1000, "a", 0.5)], "id long, name string, v double"
        )
    )
    t.add_files(spark, ext)
    out = t.read(spark)
    assert set(out.columns) == {"id", "name", "v"}
    # external rows surface NULL for the column they lack
    assert out.where("v is null").count() == 20


def test_add_files_never_deleted_by_gc(spark, tmp_path):
    ext = _external(spark, tmp_path, "ext")
    t = LakehouseTable(str(tmp_path / "t"))
    t.add_files(spark, ext)
    t.overwrite(spark.range(3).toDF("id"))
    t.expire_snapshots(keep_last=1)
    t.sweep_orphans(older_than_s=0)
    # ownership guard: the registered originals survive expiry
    assert os.path.isdir(ext)
    assert any(n.endswith(".parquet") for n in os.listdir(ext))


def test_add_files_guards(spark, tmp_path):
    ext = _external(spark, tmp_path, "ext")
    t = LakehouseTable(str(tmp_path / "t"))
    t.add_files(spark, ext)
    with pytest.raises(ValueError, match="already registered"):
        t.add_files(spark, ext)
    with pytest.raises(ValueError, match="not a file"):
        t.add_files(spark, str(tmp_path / "empty-nowhere"))
    empty_dir = tmp_path / "empty-dir"
    empty_dir.mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        t.add_files(spark, str(empty_dir))
    # incompatible type refuses
    bad = str(tmp_path / "bad")
    spark.createDataFrame([("x", "y", 1.0)], "id string, name string, v double").write.parquet(bad)
    with pytest.raises(ValueError, match="incompatible"):
        t.add_files(spark, bad)


def test_add_files_txn_replay_noops(spark, tmp_path):
    ext = _external(spark, tmp_path, "ext")
    t = LakehouseTable(str(tmp_path / "t"))
    s1 = t.add_files(spark, ext, txn=("mig", 1))
    # replay of the same epoch: second registration would normally be
    # rejected as duplicate, but the txn stamp no-ops first
    s2 = t.add_files(spark, str(tmp_path / "ext"), txn=("mig", 1))
    assert s2 == s1
    assert t.read(spark).count() == 20


def test_add_files_then_compact_takes_ownership(spark, tmp_path):
    ext = _external(spark, tmp_path, "ext")
    t = LakehouseTable(str(tmp_path / "t"))
    t.add_files(spark, ext)
    t.compact(spark)
    assert all(
        f.startswith(str(tmp_path / "t")) for f in t.snapshots[-1]["files"]
    )
    assert t.read(spark).count() == 20


def test_add_files_mor_delete_composes(spark, tmp_path):
    ext = _external(spark, tmp_path, "ext")
    t = LakehouseTable(str(tmp_path / "t"))
    t.add_files(spark, ext)
    t.delete_where(spark, "id < 5", mode="merge-on-read")
    assert t.read(spark).count() == 15
    assert t.row_count() == 15
    t.materialize_deletes(spark)
    assert t.read(spark).count() == 15
    # materialization rewrote INTO the table; originals untouched
    assert any(n.endswith(".parquet") for n in os.listdir(ext))


def test_snapshot_summaries(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(spark.range(5).toDF("id"))
    t.append(spark.range(5, 12).toDF("id"))
    h = t.history()
    assert h[0]["summary"]["added_rows"] == 5
    assert h[1]["summary"]["added_rows"] == 7
    assert (
        h[1]["summary"]["total_files"]
        == h[0]["summary"]["total_files"] + h[1]["summary"]["added_files"]
    )
    # full-set ops report written_*, never "added" (a compaction adds
    # nothing; calling its whole file set added breaks load audits)
    t.compact(spark.range(1).sparkSession)
    s = t.history()[-1]["summary"]
    assert "added_files" not in s
    assert s["written_rows"] == 12


def test_add_files_merges_drifted_schemas(spark, tmp_path):
    # migration dirs routinely hold files with drifted schemas: both
    # columns must survive, with NULL where a file lacks one
    d = tmp_path / "ext"
    spark.createDataFrame([(1, "a")], "id long, name string").coalesce(
        1
    ).write.parquet(str(d / "a"))
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, extra double"
    ).coalesce(1).write.parquet(str(d / "b"))
    t = LakehouseTable(str(tmp_path / "t"))
    t.add_files(spark, str(d))
    out = t.read(spark)
    assert set(out.columns) == {"id", "name", "extra"}
    assert out.where("extra is null").count() == 1
    assert out.where("extra = 9.5").count() == 1


def test_add_files_symlink_duplicate_rejected(spark, tmp_path):
    ext = _external(spark, tmp_path, "ext")
    t = LakehouseTable(str(tmp_path / "t"))
    t.add_files(spark, ext)
    link = tmp_path / "ext-link"
    os.symlink(ext, link)
    with pytest.raises(ValueError, match="already registered"):
        t.add_files(spark, str(link))
    assert t.read(spark).count() == 20


def test_external_snap_dir_names_are_not_table_layout(spark, tmp_path):
    # an external path containing snap-*/col=value segments must not
    # be parsed as hive layout (ownership, not names, decides)
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    t.append(
        spark.createDataFrame(
            [(1, "x", 0)], "id long, name string, grp long"
        )
    )
    ext_dir = tmp_path / "backups" / "snap-2024" / "region=eu"
    spark.createDataFrame(
        [(2, "y", 1)], "id long, name string, grp long"
    ).coalesce(1).write.parquet(str(ext_dir / "blob"))
    t.add_files(spark, str(ext_dir))
    out = t.read(spark)
    assert out.count() == 2
    assert set(out.columns) == {"id", "name", "grp"}
    assert {r.grp for r in out.collect()} == {0, 1}


def test_footer_stats_parallel_parity_200_files(spark, tmp_path):
    """Past 64 files _file_stats/_file_row_counts go through a thread
    pool (a 100k-file migration must not serialize footer reads on
    the driver one round-trip at a time); results are keyed by file
    so they must be byte-identical to the sequential path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "many"
    d.mkdir()
    files = []
    for i in range(200):
        f = str(d / f"f{i:03d}.parquet")
        pq.write_table(
            pa.table(
                {"id": [i * 3, i * 3 + 1], "name": [f"a{i}", f"b{i}"]}
            ),
            f,
        )
        files.append(f)

    par_stats = LakehouseTable._file_stats(files)
    par_rows = LakehouseTable._file_row_counts(files)
    # sequential reference: the same per-file fns through the <=64
    # path, chunked
    seq_stats = {}
    seq_rows = {}
    for i in range(0, 200, 50):
        seq_stats.update(LakehouseTable._file_stats(files[i : i + 50]))
        seq_rows.update(
            LakehouseTable._file_row_counts(files[i : i + 50])
        )
    assert par_stats == seq_stats
    assert par_rows == seq_rows
    assert len(par_stats) == 200
    assert all(v == 2 for v in par_rows.values())
    assert par_stats[files[7]]["id"] == [21, 22]

    # end-to-end: a 200-file registration commits with full stats
    t = LakehouseTable(str(tmp_path / "t"))
    t.add_files(spark, files)
    assert t.row_count() == 400
    assert len(t.pruned_files({"id": (21, 22)})) == 1
