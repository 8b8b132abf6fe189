"""Partition spec evolution (F31; Iceberg partition evolution):
changing a table's partitioning is a metadata-only update — existing
files keep their old layout, new files use the new one, reads and
pruning handle mixed layouts per file. Reference parity note: the
reference fixes partitioning at CREATE TABLE (BigQuery Iceberg
loader); at 100 TB evolving the spec without re-ingesting is the
scale-correct design (Iceberg spec §partition-evolution).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def _rows(n, start=0):
    return [(i, f"u{i}", i % 3, i % 5) for i in range(start, start + n)]


SCHEMA = "id long, name string, grp long, day long"


def test_evolve_unpartitioned_to_partitioned(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame(_rows(30), SCHEMA))
    old_files = list(t.snapshots[-1]["files"])
    t.evolve_partition_spec(["grp"])
    # metadata-only: nothing rewritten
    assert t.snapshots[-1]["files"] == old_files
    t.append(spark.createDataFrame(_rows(30, 1000), SCHEMA))
    new_files = set(t.snapshots[-1]["files"]) - set(old_files)
    assert all("grp=" in f for f in new_files)
    assert all("grp=" not in f for f in old_files)
    out = t.read(spark)
    assert out.count() == 60
    # both vintages carry correct grp values through the union
    assert out.where("grp = 1").count() == 20
    assert set(out.columns) == {"id", "name", "grp", "day"}


def test_evolve_changes_spec_for_new_files_only(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    t.append(spark.createDataFrame(_rows(30), SCHEMA))
    t.evolve_partition_spec(["day"])
    t.append(spark.createDataFrame(_rows(30, 1000), SCHEMA))
    snap = t.snapshots[-1]
    assert any("grp=" in f for f in snap["files"])
    assert any("day=" in f for f in snap["files"])
    out = t.read(spark)
    assert out.count() == 60
    # a column that is path-encoded in one vintage and a data column
    # in the other reads consistently
    assert out.where("grp = 0").count() == 20
    assert out.where("day = 0").count() == 12
    got = {
        (r.id, r.grp, r.day)
        for r in out.where("id in (3, 1003)").collect()
    }
    assert got == {(3, 0, 3), (1003, 1, 3)}


def test_pruning_works_across_mixed_specs(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    t.append(spark.createDataFrame(_rows(30), SCHEMA))
    t.evolve_partition_spec(["day"])
    t.append(spark.createDataFrame(_rows(30, 1000), SCHEMA))
    all_files = t.snapshots[-1]["files"]
    # prune on grp: old files exactly via path, new files via footer
    kept = t.pruned_files({"grp": (1, 1)})
    assert len(kept) < len(all_files)
    old_kept = [f for f in kept if "grp=" in f]
    assert all("grp=1" in f for f in old_kept)
    # correctness: scan over the pruned set matches a full filter
    assert (
        t.scan(spark, ranges={"grp": (1, 1)}).count()
        == t.read(spark).where("grp = 1").count()
    )
    # prune on day symmetric
    kept_day = t.pruned_files({"day": (2, 2)})
    assert len(kept_day) < len(all_files)
    assert (
        t.scan(spark, ranges={"day": (2, 2)}).count()
        == t.read(spark).where("day = 2").count()
    )


def test_evolve_to_unpartitioned(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    t.append(spark.createDataFrame(_rows(20), SCHEMA))
    t.evolve_partition_spec(None)
    t.append(spark.createDataFrame(_rows(20, 1000), SCHEMA))
    new_files = [
        f for f in t.snapshots[-1]["files"] if "grp=" not in f
    ]
    assert new_files  # new vintage flat
    out = t.read(spark)
    assert out.count() == 40
    assert out.where("grp = 1").count() == 14


def test_compact_migrates_to_current_spec(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame(_rows(30), SCHEMA))
    t.evolve_partition_spec(["grp"])
    before = {(r.id, r.grp) for r in t.read(spark).collect()}
    t.compact(spark)
    snap = t.snapshots[-1]
    assert all("grp=" in f for f in snap["files"])
    assert {(r.id, r.grp) for r in t.read(spark).collect()} == before


def test_time_travel_across_spec_change(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    t.append(spark.createDataFrame(_rows(20), SCHEMA))
    s1 = t.current_snapshot_id()
    t.evolve_partition_spec(["day"])
    t.append(spark.createDataFrame(_rows(20, 1000), SCHEMA))
    assert t.read(spark, snapshot_id=s1).count() == 20
    assert t.read(spark).count() == 40


def test_evolve_guards(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    t.append(spark.createDataFrame(_rows(10), SCHEMA))
    with pytest.raises(ValueError, match="not in schema"):
        t.evolve_partition_spec(["nope"])
    # no-op evolve records nothing
    t.evolve_partition_spec(["grp"])
    assert "partition_spec_history" not in t._read_manifest()
    # constructing with the superseded spec raises
    t.evolve_partition_spec(["day"])
    with pytest.raises(ValueError, match="partitioned by"):
        LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    # history recorded
    hist = t._read_manifest()["partition_spec_history"]
    assert hist[-1]["spec"] == ["day"]
    assert hist[-1]["previous"] == ["grp"]


def test_stale_instance_cannot_clobber_evolved_spec(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    t.append(spark.createDataFrame(_rows(10), SCHEMA))
    stale = LakehouseTable(str(tmp_path / "t"))  # picks up [grp]
    t.evolve_partition_spec(["day"])
    # the stale instance writes THE CURRENT layout (manifest-
    # authoritative spec) and does not reset the manifest spec
    stale.append(spark.createDataFrame(_rows(10, 1000), SCHEMA))
    assert t._read_manifest()["partition_by"] == ["day"]
    newest = set(t.snapshots[-1]["files"]) - set(
        t.snapshots[0]["files"]
    )
    assert all("day=" in f for f in newest)
    assert t.read(spark).count() == 20


def test_mor_delete_across_mixed_specs(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    t.append(spark.createDataFrame(_rows(30), SCHEMA))
    t.evolve_partition_spec(["day"])
    t.append(spark.createDataFrame(_rows(30, 1000), SCHEMA))
    t.delete_where(spark, "grp = 1", mode="merge-on-read")
    out = t.read(spark)
    assert out.count() == 40
    assert out.where("grp = 1").count() == 0
    assert t.row_count() == 40
    t.materialize_deletes(spark)
    assert t.read(spark).count() == 40


def test_schema_then_partition_evolution_compose(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    # add a column via schema evolution, then partition by it
    t.append(
        spark.createDataFrame(
            [(3, "c", "x")], "id long, v string, region string"
        )
    )
    t.evolve_partition_spec(["region"])
    t.append(
        spark.createDataFrame(
            [(4, "d", "y")], "id long, v string, region string"
        )
    )
    out = t.read(spark)
    assert out.count() == 4
    assert out.where("region is null").count() == 2
    assert out.where("region = 'y'").count() == 1
    # pruning keeps pre-evolution files conservatively
    kept = t.pruned_files({"region": ("y", "y")})
    assert any("region=y" in f for f in kept)


def test_evolve_back_after_unpartitioned_is_not_a_noop(spark, tmp_path):
    # key-present-None ("evolved to unpartitioned") must not fall back
    # to a stale instance's constructor spec and no-op the evolve back
    t1 = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    t1.append(spark.createDataFrame(_rows(10), SCHEMA))
    t1.evolve_partition_spec(None)
    t2 = LakehouseTable(str(tmp_path / "t"))
    t2.partition_by = ["grp"]  # simulate an instance holding the target
    t2.evolve_partition_spec(["grp"])
    assert t2._read_manifest()["partition_by"] == ["grp"]
    hist = t2._read_manifest()["partition_spec_history"]
    assert hist[-1]["previous"] is None  # true previous, not the attr
    t2.append(spark.createDataFrame(_rows(10, 1000), SCHEMA))
    newest = set(t2.snapshots[-1]["files"]) - set(
        t2.snapshots[-2]["files"]
    )
    assert all("grp=" in f for f in newest)


def test_construct_with_spec_on_evolved_unpartitioned_raises(
    spark, tmp_path
):
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])
    t.append(spark.createDataFrame(_rows(10), SCHEMA))
    t.evolve_partition_spec(None)
    with pytest.raises(ValueError, match="partitioned by"):
        LakehouseTable(str(tmp_path / "t"), partition_by=["grp"])


def test_string_partition_values_survive_mixed_layouts(spark, tmp_path):
    # '01' must not round-trip through partition-type inference
    # (-> int 1 -> '1') in the vintage where it is path-encoded
    t = LakehouseTable(str(tmp_path / "t"), partition_by=["code"])
    t.append(
        spark.createDataFrame(
            [(1, "01"), (2, "007")], "id long, code string"
        )
    )
    t.evolve_partition_spec(None)
    t.append(
        spark.createDataFrame(
            [(3, "01"), (4, "007")], "id long, code string"
        )
    )
    out = t.read(spark)
    assert out.where("code = '01'").count() == 2
    assert out.where("code = '007'").count() == 2
    assert (
        t.scan(spark, ranges={"code": ("01", "01")}).count() == 2
    )


def test_partition_values_ignore_table_path_segments(spark, tmp_path):
    # a table PATH containing '=' must not be parsed as a partition
    t = LakehouseTable(str(tmp_path / "v=1"), partition_by=["grp"])
    t.append(spark.createDataFrame(_rows(10), SCHEMA))
    fp = t._read_manifest()["file_partitions"]
    assert all(set(v) == {"grp"} for v in fp.values())
    assert t.read(spark).count() == 10
