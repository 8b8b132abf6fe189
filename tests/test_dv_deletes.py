"""Position-delete tail consolidation + deletion vectors (F51).

Iceberg's ``rewrite_position_delete_files`` and the v3 deletion-vector
shape, re-expressed on the JSON manifest: a table taking steady MoR
deletes accumulates one position-delete file per commit and every read
overlays all of them — ``rewrite_position_deletes`` folds the whole
position tail into ONE file (sorted, deduplicated, data files
untouched) committed as a row-preserving ``data_change=False``
snapshot, optionally encoded as per-data-file deletion vectors
(``as_dv=True``: one row per affected file, positions as a
delta+deflate blob) that readers decode executor-side with O(1) task
payloads.

Reference parity note: the reference delegates row-level deletes to
BigQuery DML; at 100 TB the scale-correct design is Iceberg's —
delete maintenance must cost O(delete tail), never O(table).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
    LakehouseTable,
    decode_dv,
    dv_affected_files,
    dv_coordinates,
    encode_dv,
    pos_delete_file_clustered,
)


def _mk(spark, path, n=100, parts=3):
    t = LakehouseTable(str(path))
    df = spark.createDataFrame(
        [(i, f"u{i}", i % parts) for i in range(n)],
        "id long, name string, grp long",
    )
    t.append(df.repartition(4))
    return t


def _tail(t):
    return t.snapshots[-1].get("deletes", [])


def _kinds(t):
    meta = t._read_manifest().get("delete_meta", {})
    return [
        meta.get(d, {}).get("kind", "position") for d in _tail(t)
    ]


# ------------------------------------------------- encode / decode


def test_dv_codec_roundtrip():
    import numpy as np

    for positions in (
        [],
        [0],
        [7],
        list(range(1000)),  # dense run
        [0, 1, 2, 10**9, 10**12],  # sparse, big gaps
        list(range(0, 200_000, 3)),  # large
    ):
        blob = encode_dv(positions)
        out = decode_dv(blob)
        assert out.tolist() == sorted(positions)
        assert out.dtype == np.int64


def test_dv_codec_sorts_and_dedupes():
    assert decode_dv(encode_dv([5, 1, 5, 3, 1])).tolist() == [1, 3, 5]


def test_dv_codec_roundtrip_property():
    """Hypothesis: encode/decode is exact for ANY multiset of
    non-negative positions (dupes collapse, order is irrelevant,
    output is sorted-unique int64)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**50),
            max_size=400,
        )
    )
    @settings(max_examples=200, deadline=None)
    def prop(positions):
        out = decode_dv(encode_dv(positions))
        assert out.tolist() == sorted(set(positions))

    prop()


def test_dv_codec_compresses_dense_runs():
    # a dense run delta-encodes to near-constant bytes per position
    # before deflate; after deflate it must be far below 8 B/pos
    blob = encode_dv(list(range(100_000)))
    assert len(blob) < 100_000  # < 1 byte per position


def test_pos_delete_file_clustered_predicate(tmp_path):
    """The consolidated-enough test for a lone position file: sorted
    non-overlapping row-group file_path spans pass; interleaved
    spans (one big delete written in scan-partition order) fail and
    trigger a re-clustering rewrite."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def write(rows, path, rg):
        tbl = pa.table(
            {
                "file_path": [r[0] for r in rows],
                "pos": pa.array(
                    [r[1] for r in rows], type=pa.int64()
                ),
            }
        )
        pq.write_table(tbl, path, row_group_size=rg)
        return str(path)

    sorted_rows = [("a", 1), ("a", 2), ("b", 1), ("c", 9)]
    assert pos_delete_file_clustered(
        write(sorted_rows, tmp_path / "s.parquet", 2)
    )
    interleaved = [("a", 1), ("c", 2), ("b", 1), ("a", 9)]
    assert not pos_delete_file_clustered(
        write(interleaved, tmp_path / "u.parquet", 2)
    )
    # single row group: trivially clustered (readers scan the whole
    # group when it matches anyway)
    assert pos_delete_file_clustered(
        write(interleaved, tmp_path / "one.parquet", 10)
    )


def test_dv_helper_roundtrip(spark, tmp_path):
    """dv_coordinates / dv_affected_files agree with the codec."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "dv.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": ["f1", "f2"],
                "dv": pa.array(
                    [encode_dv([0, 5, 9]), encode_dv([2])],
                    type=pa.binary(),
                ),
                "ndel": pa.array([3, 1], type=pa.int64()),
            }
        ),
        path,
    )
    assert dv_affected_files(path) == ["f1", "f2"]
    got = sorted(
        map(tuple, dv_coordinates(spark, [path]).collect())
    )
    assert got == [("f1", 0), ("f1", 5), ("f1", 9), ("f2", 2)]


# ------------------------------------------- tail consolidation


def test_rewrite_consolidates_position_tail(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for i in range(5):
        t.delete_where(spark, f"id % 20 = {i}", mode="merge-on-read")
    before = sorted(r["id"] for r in t.read(spark).collect())
    assert len(_tail(t)) == 5
    files_before = list(t.snapshots[-1]["files"])
    snap_id = t.rewrite_position_deletes(spark)
    snap = t.snapshots[-1]
    assert snap["id"] == snap_id
    # data files untouched, tail folded to one position file
    assert snap["files"] == files_before
    assert len(_tail(t)) == 1
    assert _kinds(t) == ["position"]
    # row-preserving commit: streams/CDF ride through
    assert snap.get("data_change") is False
    assert sorted(r["id"] for r in t.read(spark).collect()) == before
    assert t.row_count() == 75  # metadata-exact after consolidation


def test_rewrite_noop_without_position_tail(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    base = t.current_snapshot_id()
    assert t.rewrite_position_deletes(spark) == base
    t.delete_where(spark, "id = 1", mode="merge-on-read")
    base = t.current_snapshot_id()
    # a single position file is already consolidated
    assert t.rewrite_position_deletes(spark) == base
    with pytest.raises(ValueError):
        LakehouseTable(str(tmp_path / "empty")).rewrite_position_deletes(
            spark
        )


def test_rewrite_keeps_equality_deletes_untouched(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(30)], "id long, v string"
        )
    )
    t.delete_where(spark, "id < 3", mode="merge-on-read")
    t.delete_where(spark, "id >= 27", mode="merge-on-read")
    src = spark.createDataFrame([(5, "NEW")], "id long, v string")
    t.merge(spark, src, keys=["id"], mode="merge-on-read")
    # a row appended after the merge shares the key but must survive
    t.append(spark.createDataFrame([(5, "after")], "id long, v string"))
    before = sorted(map(tuple, t.read(spark).collect()))
    eq_before = [
        d
        for d, k in zip(_tail(t), _kinds(t))
        if k == "equality"
    ]
    t.rewrite_position_deletes(spark)
    kinds = _kinds(t)
    assert kinds.count("position") == 1
    # equality files carried byte-identical (their applies_to
    # watermarks scope different file sets and cannot merge)
    assert [
        d for d, k in zip(_tail(t), kinds) if k == "equality"
    ] == eq_before
    assert sorted(map(tuple, t.read(spark).collect())) == before


# --------------------------------------------- deletion vectors


def test_rewrite_as_dv_reads_identically(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for i in range(4):
        t.delete_where(spark, f"id % 10 = {i}", mode="merge-on-read")
    before = sorted(r["id"] for r in t.read(spark).collect())
    t.rewrite_position_deletes(spark, as_dv=True)
    assert _kinds(t) == ["dv"]
    assert sorted(r["id"] for r in t.read(spark).collect()) == before
    # exact metadata row count from the recorded position total
    assert t.row_count() == 60


def test_dv_rewrite_merges_existing_dv_and_new_positions(
    spark, tmp_path
):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "id % 10 = 0", mode="merge-on-read")
    t.delete_where(spark, "id % 10 = 1", mode="merge-on-read")
    t.rewrite_position_deletes(spark, as_dv=True)
    t.delete_where(spark, "id % 10 = 2", mode="merge-on-read")
    t.delete_where(spark, "id % 10 = 3", mode="merge-on-read")
    assert _kinds(t) == ["dv", "position", "position"]
    t.rewrite_position_deletes(spark, as_dv=True)
    assert _kinds(t) == ["dv"]
    assert sorted(r["id"] for r in t.read(spark).collect()) == [
        i for i in range(100) if i % 10 > 3
    ]
    assert t.row_count() == 60


def test_dv_read_through_connector_equals_native(spark, tmp_path):
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.dataSource.register(LakehouseStreamSource)
    path = str(tmp_path / "t")
    t = _mk(spark, path, n=200)
    t.delete_where(spark, "id % 7 = 3", mode="merge-on-read")
    t.delete_where(spark, "id % 11 = 4", mode="merge-on-read")
    t.rewrite_position_deletes(spark, as_dv=True)
    got = spark.read.format("lakehouse").option("path", path).load()
    native = t.read(spark)
    cols = sorted(got.columns)
    assert cols == sorted(native.columns)
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, native.select(*cols).collect())
    )
    # composes with pushed-filter pruning
    sub = (
        spark.read.format("lakehouse")
        .option("path", path)
        .load()
        .where("id < 50")
    )
    assert sorted(r["id"] for r in sub.collect()) == [
        i for i in range(50) if i % 7 != 3 and i % 11 != 4
    ]


def test_dv_connector_payload_is_o1(spark, tmp_path):
    """A DV tail always ships by reference: task payloads stay small
    no matter how many positions the vector holds."""
    import pickle

    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseBatchReader,
    )

    path = str(tmp_path / "t")
    t = LakehouseTable(path)
    t.append(spark.range(0, 300_000).withColumn("v", F.col("id") * 2))
    t.delete_where(spark, "id % 2 = 0", mode="merge-on-read")
    t.rewrite_position_deletes(spark, as_dv=True)
    r = LakehouseBatchReader(path, t.read(spark).schema, {})
    parts = r.partitions()
    assert parts
    total = 0
    for p in parts:
        assert len(pickle.dumps(p)) < 2048  # O(1) payload
        total += 1
    assert total >= 1


def test_dv_composes_with_equality_and_later_append(spark, tmp_path):
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.dataSource.register(LakehouseStreamSource)
    path = str(tmp_path / "t")
    t = LakehouseTable(path)
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(40)], "id long, v string"
        )
    )
    t.delete_where(spark, "id < 4", mode="merge-on-read")
    t.rewrite_position_deletes(spark, as_dv=True)
    src = spark.createDataFrame([(7, "NEW")], "id long, v string")
    t.merge(spark, src, keys=["id"], mode="merge-on-read")
    t.append(spark.createDataFrame([(7, "after")], "id long, v string"))
    native = t.read(spark)
    got = spark.read.format("lakehouse").option("path", path).load()
    a = sorted(map(tuple, got.select("id", "v").collect()))
    b = sorted(map(tuple, native.select("id", "v").collect()))
    assert a == b
    rows = sorted(x for x in a if x[0] == 7)
    assert rows == [(7, "NEW"), (7, "after")]


def test_dv_materialize_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    pre = t.current_snapshot_id()
    t.delete_where(spark, "grp = 1", mode="merge-on-read")
    t.rewrite_position_deletes(spark, as_dv=True)
    dv_snap = t.current_snapshot_id()
    t.materialize_deletes(spark)
    assert not _tail(t)
    assert t.read(spark).count() == 67
    # time travel: pre-delete sees everything, DV snapshot applies it
    assert t.read(spark, snapshot_id=pre).count() == 100
    assert t.read(spark, snapshot_id=dv_snap).count() == 67


def test_dv_inspect_surfaces_kind_and_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(spark, "grp = 2", mode="merge-on-read")
    t.rewrite_position_deletes(spark, as_dv=True)
    rows = t.inspect(spark, "delete_files").collect()
    assert len(rows) == 1
    assert rows[0]["kind"] == "dv"
    assert rows[0]["row_count"] == 33  # voided positions, not blob rows


def test_stream_rides_through_dv_rewrite(spark, tmp_path):
    """A stream crossing the rewrite commit emits nothing for it
    (row-preserving ``data_change=False``), then delivers the
    post-rewrite append — no replayed deletes, no refused range."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.dataSource.register(LakehouseStreamSource)
    path = str(tmp_path / "t")
    t = LakehouseTable(path)
    t.append(spark.range(0, 10))
    t.delete_where(spark, "id < 2", mode="merge-on-read")
    base = t.current_snapshot_id()
    t.rewrite_position_deletes(spark, as_dv=True)
    t.append(spark.range(100, 103))
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = (
        spark.readStream.format("lakehouse")
        .option("path", path)
        .option("startingSnapshotId", base)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == [100, 101, 102]


def test_incremental_scan_skips_dv_rewrite(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    base = t.current_snapshot_id()
    t.delete_where(spark, "id = 5", mode="merge-on-read")
    t.rewrite_position_deletes(spark, as_dv=True)
    t.append(
        spark.createDataFrame(
            [(1000, "x", 0)], "id long, name string, grp long"
        )
    )
    # the delete commit changes rows → incremental_scan refuses the
    # range; from the delete snapshot on, the DV rewrite is skipped
    # and only the append surfaces
    del_snap = base + 1
    got = t.incremental_scan(spark, del_snap)
    assert sorted(r["id"] for r in got.collect()) == [1000]


def test_expire_reaps_replaced_delete_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for i in range(3):
        t.delete_where(spark, f"id % 30 = {i}", mode="merge-on-read")
    old_tail = list(_tail(t))
    t.rewrite_position_deletes(spark, as_dv=True)
    t.expire_snapshots(keep_last=1)
    for d in old_tail:
        assert not os.path.exists(d)
    assert os.path.exists(_tail(t)[0])
    # id % 30 ∈ {0,1,2} hits 4 rows each over 0..99
    assert t.read(spark).count() == 88


def test_dv_composes_with_clone_branch_and_range_scan(
    spark, tmp_path
):
    """The DV tail rides every other lifecycle surface: a clone
    carries the blob and reads identically, a branch read applies
    the base's DV under the staged append, and a range scan prunes
    files while still masking voided rows."""
    t = _mk(spark, tmp_path / "t", n=100)
    t.delete_where(spark, "id % 4 = 1", mode="merge-on-read")
    t.rewrite_position_deletes(spark, as_dv=True)
    expected = [i for i in range(100) if i % 4 != 1]
    # clone: blob carried, reads equal
    c = t.clone_to(str(tmp_path / "c"))
    assert sorted(r["id"] for r in c.read(spark).collect()) == expected
    # branch: staged append over the DV-tailed base
    t.create_branch("wip")
    t.append_to_branch(
        "wip",
        spark.createDataFrame(
            [(1000, "x", 0)], "id long, name string, grp long"
        ),
    )
    got = sorted(
        r["id"] for r in t.read(spark, branch="wip").collect()
    )
    assert got == expected + [1000]
    # range scan: pruned read still masks DV-voided rows
    sub = t.scan(spark, ranges={"id": (10, 20)})
    assert sorted(r["id"] for r in sub.collect()) == [
        i for i in range(10, 21) if i % 4 != 1
    ]


def test_maintain_delete_tail_mode_dv(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for i in range(5):
        t.delete_where(spark, f"id % 25 = {i}", mode="merge-on-read")
    report = t.maintain(
        spark,
        max_files=64,
        max_delete_files=4,
        delete_tail_mode="dv",
    )
    assert report["deletes_rewritten"] == 5
    assert report["deletes_materialized"] == 0
    assert _kinds(t) == ["dv"]
    assert t.read(spark).count() == 80
    # under threshold: nothing to do
    report = t.maintain(
        spark,
        max_files=64,
        max_delete_files=4,
        delete_tail_mode="dv",
    )
    assert report["deletes_rewritten"] == 0


def test_cdf_masks_rows_already_voided_by_prior_dv(spark, tmp_path):
    """A change-feed range whose PRIOR tail is a consolidated DV:
    rows the vector already voided must not re-emit delete
    pre-images when a later merge matches their key — and the DV
    ships by reference (the executor decodes its own blob row), not
    as driver-inlined positions."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.dataSource.register(LakehouseStreamSource)
    path = str(tmp_path / "t")
    t = LakehouseTable(path)
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        )
    )
    t.delete_where(spark, "id < 3", mode="merge-on-read")
    t.rewrite_position_deletes(spark, as_dv=True)
    base = t.current_snapshot_id()
    src = spark.createDataFrame(
        [(1, "GHOST"), (5, "LIVE")], "id long, v string"
    )
    t.merge(spark, src, keys=["id"], mode="merge-on-read")
    feed = (
        spark.read.format("lakehouse")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingSnapshotId", base)
        .load()
    )
    rows = sorted(
        (r["id"], r["_change_type"]) for r in feed.collect()
    )
    # id=1 was already voided by the DV: postimage insert only, no
    # delete pre-image; id=5 was live: delete + insert
    assert rows == [
        (1, "insert"),
        (5, "delete"),
        (5, "insert"),
    ]


def test_resolve_equality_folds_eq_deletes_into_dv(spark, tmp_path):
    """Iceberg v3's convert-equality-deletes maintenance: the eq
    tail resolves into exact coordinates, reads drop the broadcast
    anti-joins, and row_count() becomes metadata-exact again."""
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(30)], "id long, v string"
        )
    )
    t.delete_where(spark, "id < 3", mode="merge-on-read")
    src = spark.createDataFrame(
        [(5, "NEW"), (6, "NEW6")], "id long, v string"
    )
    t.merge(spark, src, keys=["id"], mode="merge-on-read")
    # a later append sharing a deleted key must STILL survive after
    # resolution (the watermark scoped it out of the delete)
    t.append(spark.createDataFrame([(5, "after")], "id long, v string"))
    before = sorted(map(tuple, t.read(spark).collect()))
    assert t.row_count() is None  # eq tail: unknowable from metadata
    t.rewrite_position_deletes(spark, as_dv=True, resolve_equality=True)
    assert _kinds(t) == ["dv"]
    assert sorted(map(tuple, t.read(spark).collect())) == before
    assert t.row_count() == len(before)  # exact again


def test_resolve_equality_positions_match_materialization(
    spark, tmp_path
):
    """Resolution and materialization agree: resolving then
    materializing equals materializing directly."""
    mk = lambda p: LakehouseTable(str(p))  # noqa: E731
    rows = [(i, f"v{i % 7}") for i in range(50)]
    a, b = mk(tmp_path / "a"), mk(tmp_path / "b")
    for t in (a, b):
        t.append(
            spark.createDataFrame(rows, "id long, v string")
        )
        t.delete_where(spark, "id % 9 = 1", mode="merge-on-read")
        src = spark.createDataFrame(
            [(10, "X"), (20, "Y")], "id long, v string"
        )
        t.merge(spark, src, keys=["id"], mode="merge-on-read")
    a.rewrite_position_deletes(spark, resolve_equality=True)
    a.materialize_deletes(spark)
    b.materialize_deletes(spark)
    got_a = sorted(map(tuple, a.read(spark).collect()))
    got_b = sorted(map(tuple, b.read(spark).collect()))
    assert got_a == got_b


def test_resolve_equality_no_match_clears_tail(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        )
    )
    # merge inserting only unseen keys: eq delete voids nothing
    src = spark.createDataFrame([(999, "ins")], "id long, v string")
    t.merge(spark, src, keys=["id"], mode="merge-on-read")
    assert _kinds(t) == ["equality"]
    t.rewrite_position_deletes(spark, resolve_equality=True)
    assert not _tail(t)
    assert t.read(spark).count() == 11
    assert t.row_count() == 11


def test_maintain_dv_mode_resolves_all_eq_tail(spark, tmp_path):
    """An over-threshold all-equality tail shrinks under mode 'dv'
    (it would no-op without resolution and grow forever)."""
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(40)], "id long, v string"
        )
    )
    for i in range(5):
        src = spark.createDataFrame(
            [(i, f"m{i}")], "id long, v string"
        )
        t.merge(spark, src, keys=["id"], mode="merge-on-read")
    assert _kinds(t).count("equality") == 5
    before = sorted(map(tuple, t.read(spark).collect()))
    report = t.maintain(
        spark, max_files=64, max_delete_files=4, delete_tail_mode="dv"
    )
    assert report["deletes_rewritten"] == 5
    kinds = _kinds(t)
    assert "equality" not in kinds and kinds.count("dv") == 1
    assert sorted(map(tuple, t.read(spark).collect())) == before
    assert t.row_count() == len(before)


def test_maintain_default_still_materializes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    for i in range(5):
        t.delete_where(spark, f"id % 25 = {i}", mode="merge-on-read")
    report = t.maintain(spark, max_files=64, max_delete_files=4)
    assert report["deletes_materialized"] == 5
    assert not _tail(t)
