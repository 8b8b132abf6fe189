"""Per-file Bloom filters (operators/bloom.py + LakehouseTable.
refresh_bloom_filters): point-lookup file skipping for columns the
sort order can't prune, with the NDV-sidecar lifecycle (incremental
refresh, expiry GC, clone carry, lost-blob conservatism)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.bloom import (
    bloom_params,
    build_bloom,
    might_contain,
)
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def test_bloom_math_no_false_negatives_and_fpp():
    vals = [f"k{i}" for i in range(2000)]
    b = build_bloom(vals, fpp=0.01)
    assert all(might_contain(b, v) for v in vals)  # never a miss
    misses = sum(
        might_contain(b, f"absent{i}") for i in range(2000)
    )
    assert misses < 2000 * 0.05  # ~1% target, generous bound
    m, k = bloom_params(1000, 0.01)
    assert m % 8 == 0 and 1 <= k <= 16
    # ints hash by canonical str(): build int, probe int
    bi = build_bloom([1, 2, 3])
    assert might_contain(bi, 2) and not might_contain(bi, 99)


def _interleaved_table(spark, path, nfiles=6):
    """Files whose [min, max] id ranges ALL overlap (min/max stats
    can't skip anything) but whose value sets are disjoint."""
    t = LakehouseTable(path)
    for i in range(nfiles):
        vals = [(i + 100,), (i + 1000,), (i + 5000,)]
        t.append(
            spark.createDataFrame(vals, "id long").coalesce(1)
        )
    return t


def test_bloom_prunes_point_lookup_where_stats_cannot(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"))
    # stats keep everything: every file spans [~100, ~5000]
    assert len(t.pruned_files({"id": (1003, 1003)})) == 6
    n = t.refresh_bloom_filters(spark, ["id"])
    assert n == 6
    pruned = t.pruned_files({"id": (1003, 1003)})
    assert len(pruned) == 1  # only file 3 might contain 1003
    # correctness: the surviving file really has the row
    assert t.scan(spark, ranges={"id": (1003, 1003)}).where(
        "id = 1003"
    ).count() == 1
    # range predicates ignore blooms (they only answer equality)
    assert len(t.pruned_files({"id": (1000, 1005)})) == 6
    # absent key: bloom may prune ALL files
    assert len(t.pruned_files({"id": (777777, 777777)})) <= 1


def test_bloom_refresh_is_incremental(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"), nfiles=3)
    assert t.refresh_bloom_filters(spark, ["id"]) == 3
    assert t.refresh_bloom_filters(spark, ["id"]) == 0  # covered
    t.append(spark.createDataFrame([(42,)], "id long").coalesce(1))
    assert t.refresh_bloom_filters(spark, ["id"]) == 1  # new file only
    assert len(t.pruned_files({"id": (42, 42)})) == 1


def test_bloom_column_union_on_rebloom(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, name string"
        ).coalesce(1)
    )
    t.refresh_bloom_filters(spark, ["id"])
    # asking for name re-blooms the file with BOTH columns
    assert t.refresh_bloom_filters(spark, ["name"]) == 1
    m = t._read_manifest()
    (entry,) = m["bloom_sidecars"].values()
    assert entry["cols"] == ["id", "name"]
    assert len(t.pruned_files({"name": ("zz", "zz")})) == 0
    assert len(t.pruned_files({"name": ("a", "a")})) == 1
    assert len(t.pruned_files({"id": (2, 2)})) == 1


def test_bloom_rejects_unbloomable_types(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame([(1, 0.5)], "id long, v double").coalesce(1)
    )
    with pytest.raises(ValueError, match="bloomable"):
        t.refresh_bloom_filters(spark, ["v"])


def test_bloom_accepts_every_integer_width(spark, tmp_path):
    """schema.json() type names are 'short'/'byte'/'integer'/'long' —
    all bloomable (regression: the gate once used SQL DDL spellings
    and wrongly refused short/byte columns)."""
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, 2, 3, 4)],
            "a byte, b short, c int, d long",
        ).coalesce(1)
    )
    assert t.refresh_bloom_filters(spark, ["a", "b", "c", "d"]) == 1
    assert len(t.pruned_files({"b": (2, 2)})) == 1
    assert len(t.pruned_files({"b": (99, 99)})) == 0


def test_bloom_lost_blob_keeps_conservatively(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"), nfiles=3)
    t.refresh_bloom_filters(spark, ["id"])
    m = t._read_manifest()
    for entry in m["bloom_sidecars"].values():
        os.remove(os.path.join(t.path, entry["blob"]))
        break
    # blob gone: every file is kept (never silently drop data)
    assert len(t.pruned_files({"id": (1001, 1001)})) == 3


def test_bloom_lifecycle_compact_expire_gc_clone(spark, tmp_path):
    t = _interleaved_table(spark, str(tmp_path / "t"), nfiles=3)
    t.refresh_bloom_filters(spark, ["id"])
    blob0 = next(
        e["blob"] for e in t._read_manifest()["bloom_sidecars"].values()
    )
    # clone carries the referenced blob: its probes stay scan-free
    clone = t.clone_to(str(tmp_path / "c"))
    cm = clone._read_manifest()
    assert cm["bloom_sidecars"]
    assert os.path.exists(
        os.path.join(clone.path, blob0)
    )
    assert len(clone.pruned_files({"id": (1001, 1001)})) == 1
    # the clone still references the old files, so the SOURCE's
    # expiry keeps their pointers (clone-protected metadata — same
    # rule as data files); a clone-free table is the GC case below
    t.compact(spark, target_files=1)
    t.expire_snapshots(keep_last=1)
    assert t._read_manifest().get("bloom_sidecars", {})
    assert os.path.exists(os.path.join(clone.path, blob0))

    # clone-free table: compaction + expiry prune the pointers and
    # GC reaps the unreferenced blob past the grace window
    t2 = _interleaved_table(spark, str(tmp_path / "t2"), nfiles=3)
    t2.refresh_bloom_filters(spark, ["id"])
    blob2 = next(
        e["blob"]
        for e in t2._read_manifest()["bloom_sidecars"].values()
    )
    t2.compact(spark, target_files=1)
    t2.expire_snapshots(keep_last=1)
    assert t2._read_manifest().get("bloom_sidecars", {}) == {}
    blob_path = os.path.join(t2.path, blob2)
    os.utime(blob_path, (1, 1))  # age past the GC grace window
    t2.expire_snapshots(keep_last=1)
    assert not os.path.exists(blob_path)
    # re-bloom the compacted file: pruning works again
    assert t2.refresh_bloom_filters(spark, ["id"]) == 1
    assert t2.pruned_files({"id": (1001, 1001)})


def test_bloom_lights_up_connector_equalto(spark, tmp_path):
    """The batch connector's pushed EqualTo is a point range — with
    blooms refreshed, a lookup on an UNSORTED column plans 1 file."""
    from pyspark.sql.datasource import EqualTo

    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseBatchReader,
        LakehouseStreamSource,
    )

    t = _interleaved_table(spark, str(tmp_path / "t"))
    t.refresh_bloom_filters(spark, ["id"])
    schema = t.read(spark).schema
    r = LakehouseBatchReader(t.path, schema, {})
    assert len(r.partitions()) == 6
    r.pushFilters([EqualTo(("id",), 1003)])
    assert len(r.partitions()) == 1
    spark.dataSource.register(LakehouseStreamSource)
    got = (
        spark.read.format("lakehouse")
        .option("path", t.path)
        .load()
        .where("id = 1003")
        .collect()
    )
    assert [row["id"] for row in got] == [1003]


def test_bloom_maintain_rebloooms_rewrites_and_compacts_blobs(
    spark, tmp_path
):
    """maintain() keeps bloom coverage alive across compaction for
    opted-in tables (pointer map present) and merges scattered
    blobs, exactly like the NDV sketches."""
    t = _interleaved_table(spark, str(tmp_path / "t"), nfiles=12)
    # one blob per refresh: 12 refreshes -> 12 blobs
    for f in list(t.snapshots[-1]["files"]):
        t.refresh_bloom_filters(spark, ["id"], files=[f])
    m = t._read_manifest()
    assert len({e["blob"] for e in m["bloom_sidecars"].values()}) == 12
    rep = t.maintain(spark, max_files=4, keep_snapshots=1)
    assert rep["compacted_from"] == 12
    # rewrite output re-bloomed...
    assert rep["bloom_files_refreshed"] >= 1
    # ...and pruning still works on the compacted layout
    assert len(t.pruned_files({"id": (1003, 1003)})) >= 1
    assert len(t.pruned_files({"id": (987654, 987654)})) <= 1
    # blob count collapsed under the compaction threshold
    m2 = t._read_manifest()
    assert (
        len({e["blob"] for e in m2["bloom_sidecars"].values()}) <= 8
    )
