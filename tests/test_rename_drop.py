"""Metadata-only column RENAME / DROP (VERDICT r10 item 3): Iceberg
renames columns via field ids without rewriting a byte; here a rename
journal + committed-schema overlay gives raw-parquet tables the same
contract — old files read under the new name, time travel works, the
connector and streams ride through, and retired names are refused
(the resurrection hazard field ids exist to prevent).

Reference analog: biglake-iceberg-pipeline's
cleaning/drop_column.sql / cast_column_type.sql family, lifted from
DataFrame-level to table-level evolution."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
    LakehouseTable,
)


def _mk(spark, tmp_path, partitioned=False):
    t = LakehouseTable(
        str(tmp_path / "t"),
        partition_by=["region"] if partitioned else None,
    )
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0, "eu"), (2, "b", 20.0, "us")],
            "id long, name string, amount double, region string",
        )
    )
    return t


def test_rename_reads_old_files_under_new_name(spark, tmp_path):
    t = _mk(spark, tmp_path)
    snap_before = t.current_snapshot_id()
    t.rename_column("name", "customer_name")
    df = t.read(spark)
    assert df.columns == ["id", "customer_name", "amount", "region"]
    rows = {r["id"]: r["customer_name"] for r in df.collect()}
    assert rows == {1: "a", 2: "b"}
    # no byte moved: the data files are the same paths
    snaps = t.snapshots
    assert snaps[-1]["files"] == snaps[0]["files"]
    assert snaps[-1].get("data_change") is False
    # time travel to the pre-rename snapshot surfaces the NEW name
    # (current schema overlays history, the Iceberg contract)
    old = t.read(spark, snapshot_id=snap_before)
    assert "customer_name" in old.columns
    assert {r["customer_name"] for r in old.collect()} == {"a", "b"}


def test_rename_then_append_mixes_vintages(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("name", "customer_name")
    t.append(
        spark.createDataFrame(
            [(3, "c", 30.0, "ap")],
            "id long, customer_name string, amount double, region string",
        )
    )
    rows = {
        r["id"]: r["customer_name"] for r in t.read(spark).collect()
    }
    assert rows == {1: "a", 2: "b", 3: "c"}
    # filters on the renamed column work across vintages
    assert (
        t.read(spark).filter(F.col("customer_name") == "a").count()
        == 1
    )


def test_rename_chain_composes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("name", "nm2")
    t.append(
        spark.createDataFrame(
            [(3, "c", 30.0, "ap")],
            "id long, nm2 string, amount double, region string",
        )
    )
    t.rename_column("nm2", "nm3")
    rows = {r["id"]: r["nm3"] for r in t.read(spark).collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}


def test_drop_column_metadata_only(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.drop_column("amount")
    df = t.read(spark)
    assert df.columns == ["id", "name", "region"]
    assert df.count() == 2
    snaps = t.snapshots
    assert snaps[-1]["files"] == snaps[0]["files"]  # no rewrite
    # re-adding the retired name is refused (old files still store
    # the dropped bytes; a name-based overlay would resurrect them)
    with pytest.raises(ValueError, match="RETIRED"):
        t.append(
            spark.createDataFrame(
                [(9, "z", 1.5, "eu")],
                "id long, name string, amount double, region string",
            )
        )


def test_rename_to_retired_name_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("name", "nm2")
    with pytest.raises(ValueError, match="previously used"):
        t.rename_column("amount", "name")
    t.drop_column("amount")
    with pytest.raises(ValueError, match="previously used"):
        t.rename_column("region", "amount")


def test_rename_guards(spark, tmp_path):
    t = _mk(spark, tmp_path, partitioned=True)
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("region", "zone")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("region")
    t2 = _mk(spark, tmp_path / "s")
    t2.set_sort_order(["amount"])
    with pytest.raises(ValueError, match="sort-order"):
        t2.rename_column("amount", "value")
    with pytest.raises(ValueError, match="no such column"):
        t2.rename_column("ghost", "x")
    with pytest.raises(ValueError, match="column exists"):
        t2.rename_column("name", "id")


def test_rename_on_partitioned_table_non_partition_col(
    spark, tmp_path
):
    t = _mk(spark, tmp_path, partitioned=True)
    t.rename_column("amount", "value")
    t.append(
        spark.createDataFrame(
            [(3, "c", 30.0, "ap")],
            "id long, name string, value double, region string",
        )
    )
    df = t.read(spark)
    got = {r["id"]: (r["value"], r["region"]) for r in df.collect()}
    assert got == {1: (10.0, "eu"), 2: (20.0, "us"), 3: (30.0, "ap")}


def test_rename_composes_with_mor_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_mor(spark, F.col("id") == 1)
    t.rename_column("name", "customer_name")
    rows = {
        r["id"]: r["customer_name"] for r in t.read(spark).collect()
    }
    assert rows == {2: "b"}
    # and a post-rename MoR delete on the new name works
    t.append(
        spark.createDataFrame(
            [(3, "c", 30.0, "ap")],
            "id long, customer_name string, amount double, region string",
        )
    )
    t.delete_where_mor(spark, F.col("customer_name") == "b")
    assert {r["id"] for r in t.read(spark).collect()} == {3}


def test_connector_reads_through_rename(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.rename_column("name", "customer_name")
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.dataSource.register(LakehouseStreamSource)
    df = spark.read.format("lakehouse").load(t.path)
    rows = {r["id"]: r["customer_name"] for r in df.collect()}
    assert rows == {1: "a", 2: "b"}
    # pushed filter on the renamed column stays correct (old files
    # lack stats under the new name -> conservatively read)
    assert (
        df.filter(F.col("customer_name") == "a").count() == 1
    )


def test_stream_rides_through_rename(spark, tmp_path):
    """A rename is dataChange=false: a tailing stream skips the
    evolve snapshot and later appends arrive under the new name."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    t = _mk(spark, tmp_path)
    spark.dataSource.register(LakehouseStreamSource)
    t.rename_column("name", "customer_name")
    t.append(
        spark.createDataFrame(
            [(3, "c", 30.0, "ap")],
            "id long, customer_name string, amount double, region string",
        )
    )
    out = (
        spark.readStream.format("lakehouse")
        .load(t.path)
        .writeStream.format("memory")
        .queryName("rename_stream")
        .option(
            "checkpointLocation", str(tmp_path / "ck")
        )
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(180)
    got = {
        r["id"]: r["customer_name"]
        for r in spark.sql("select * from rename_stream").collect()
    }
    assert got == {1: "a", 2: "b", 3: "c"}


def test_stats_remap_under_rename(spark, tmp_path):
    """A rename changes no bytes, so existing NDV sketches, blooms,
    and footer ranges stay valid — they REMAP to the new name at
    read instead of forcing a whole-history re-sketch."""
    t = _mk(spark, tmp_path)
    t.refresh_ndv_sketches(spark)
    t.refresh_bloom_filters(spark, ["id"])
    t.rename_column("name", "customer_name")
    t.rename_column("id", "cust_id")
    # nothing to re-sketch: coverage carried over
    assert t.refresh_ndv_sketches(spark) == 0
    ndv = t.ndv(spark, ["customer_name", "cust_id"])
    assert ndv["customer_name"] == 2 and ndv["cust_id"] == 2
    # min/max pruning under the new name still prunes
    assert t.pruned_files({"cust_id": (99, 99)}) == []
    assert len(t.pruned_files({"cust_id": (1, 1)})) == 1


def test_widen_column_metadata_only(spark, tmp_path):
    """ALTER COLUMN TYPE via safe promotion: old files keep the
    narrower physical type; reads upcast in the scan; unsafe changes
    refuse."""
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, 10), (2, 20)], "id long, qty int"
        )
    )
    t.widen_column("qty", "bigint")
    df = t.read(spark)
    assert dict(df.dtypes)["qty"] == "bigint"
    assert {r["qty"] for r in df.collect()} == {10, 20}
    snaps = t.snapshots
    assert snaps[-1]["files"] == snaps[0]["files"]  # no rewrite
    assert snaps[-1].get("data_change") is False
    # post-widen appends land as bigint; the old file still reads
    t.append(
        spark.createDataFrame([(3, 2**40)], "id long, qty long")
    )
    assert t.read(spark).where("qty > 1000000").count() == 1
    with pytest.raises(ValueError, match="unsafe type change"):
        t.widen_column("qty", "int")  # narrowing refused
    with pytest.raises(ValueError, match="no such column"):
        t.widen_column("ghost", "bigint")
    # widen composes with rename: the renamed column keeps reading
    # old narrow-typed files under the new name
    t.rename_column("qty", "quantity")
    got = {r["id"]: r["quantity"] for r in t.read(spark).collect()}
    assert got == {1: 10, 2: 20, 3: 2**40}


def test_cdf_delete_preimages_after_rename(spark, tmp_path):
    """Change-feed delete PRE-IMAGES of pre-rename files must carry
    the renamed column's values (the preimage reader coalesces the
    file's write-time vintage name), not NULLs."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    t = _mk(spark, tmp_path)
    spark.dataSource.register(LakehouseStreamSource)
    t.rename_column("name", "customer_name")
    t.delete_where_mor(spark, F.col("id") == 1)
    out = (
        spark.readStream.format("lakehouse")
        .option("readChangeFeed", "true")
        .load(t.path)
        .writeStream.format("memory")
        .queryName("rename_cdf")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(180)
    rows = spark.sql("select * from rename_cdf").collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r)
    dels = by_type.get("delete", [])
    assert len(dels) == 1
    # the pre-image row reads the OLD file's 'name' bytes under the
    # NEW column name
    assert dels[0]["customer_name"] == "a"
    ins = {r["id"]: r["customer_name"] for r in by_type["insert"]}
    assert ins == {1: "a", 2: "b"}


def test_use_snapshot_schema_time_travel(spark, tmp_path):
    """Iceberg-style as-of-schema time travel: read(snapshot_id=...,
    use_snapshot_schema=True) overlays the schema the snapshot
    committed under — original names, pre-drop columns, pre-add
    absence — while the default keeps the Delta current-schema
    convention."""
    t = _mk(spark, tmp_path)
    s1 = t.current_snapshot_id()
    t.rename_column("name", "customer_name")
    t.drop_column("amount")
    t.append(
        spark.createDataFrame(
            [(3, "c", "ap", 9)],
            "id long, customer_name string, region string, stars int",
        )
    )
    s4 = t.current_snapshot_id()

    # default: history under today's names/shape (pinned elsewhere)
    cur = t.read(spark, snapshot_id=s1)
    assert cur.columns == ["id", "customer_name", "region", "stars"]

    # as-of: the ORIGINAL schema, original names, amount present
    old = t.read(spark, snapshot_id=s1, use_snapshot_schema=True)
    assert old.columns == ["id", "name", "amount", "region"]
    got = {r["id"]: (r["name"], r["amount"]) for r in old.collect()}
    assert got == {1: ("a", 10.0), 2: ("b", 20.0)}

    # as-of the LATEST snapshot == current schema
    new = t.read(spark, snapshot_id=s4, use_snapshot_schema=True)
    assert new.columns == ["id", "customer_name", "region", "stars"]
    assert new.count() == 3

    # rename chains resolve as of the snapshot: a second rename must
    # not leak back into the earlier vintage read
    t.rename_column("customer_name", "cname2")
    mid = t.read(spark, snapshot_id=s4, use_snapshot_schema=True)
    assert "customer_name" in mid.columns
    assert {
        r["id"]: r["customer_name"] for r in mid.collect()
    } == {1: "a", 2: "b", 3: "c"}


def test_use_snapshot_schema_with_mor_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path)
    s1 = t.current_snapshot_id()
    t.delete_where_mor(spark, F.col("id") == 1)
    t.rename_column("name", "customer_name")
    # as-of s1: pre-delete rows under the original schema
    old = t.read(spark, snapshot_id=s1, use_snapshot_schema=True)
    assert old.columns == ["id", "name", "amount", "region"]
    assert {r["id"] for r in old.collect()} == {1, 2}


def test_connector_use_snapshot_schema(spark, tmp_path):
    """spark.read.format('lakehouse').option('useSnapshotSchema',
    'true') time-travels with the as-of schema — the connector face
    of read(use_snapshot_schema=True)."""
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    t = _mk(spark, tmp_path)
    s1 = t.current_snapshot_id()
    t.rename_column("name", "customer_name")
    t.append(
        spark.createDataFrame(
            [(3, "c", 30.0, "ap")],
            "id long, customer_name string, amount double, region string",
        )
    )
    spark.dataSource.register(LakehouseStreamSource)
    base = spark.read.format("lakehouse").option(
        "snapshotId", str(s1)
    )
    # default: current names
    assert "customer_name" in base.load(t.path).columns
    # as-of: original names with the original values
    old = (
        spark.read.format("lakehouse")
        .option("snapshotId", str(s1))
        .option("useSnapshotSchema", "true")
        .load(t.path)
    )
    assert "name" in old.columns and "customer_name" not in old.columns
    assert {r["id"]: r["name"] for r in old.collect()} == {
        1: "a",
        2: "b",
    }


def test_unreadable_promotion_refused_on_append(spark, tmp_path):
    """The schema-evolution walk's find: BIGINT->DOUBLE (and
    DATE->TIMESTAMP) are value-safe casts for INCOMING data but the
    parquet scan cannot upcast OLD files' physical type — a plain
    append that would evolve the committed schema through such a
    promotion must refuse loudly instead of committing a table whose
    history crashes every read (Iceberg refuses the same
    promotions)."""
    t = LakehouseTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, 10)], "id long, v long"))
    with pytest.raises(ValueError, match="not metadata-only readable"):
        t.append(
            spark.createDataFrame([(2, 2.5)], "id long, v double")
        )
    # the table stayed readable and unchanged
    assert t.read(spark).count() == 1
    assert dict(t.read(spark).dtypes)["v"] == "bigint"
    # metadata-only widen refuses the same pair...
    with pytest.raises(ValueError, match="READ-safe"):
        t.widen_column("v", "double")
    # ...while the read-safe promotions still work end-to-end
    t2 = LakehouseTable(str(tmp_path / "t2"))
    t2.append(spark.createDataFrame([(1, 10)], "id long, v int"))
    t2.append(spark.createDataFrame([(2, 2.5)], "id long, v double"))
    got = {r["id"]: r["v"] for r in t2.read(spark).collect()}
    assert got == {1: 10.0, 2: 2.5}
    # and the REWRITE path (merge semantics) remains the way to
    # change unreadable pairs: overwrite with the widened data
    t.overwrite(
        t.read(spark).selectExpr("id", "cast(v as double) v").union(
            spark.createDataFrame([(2, 2.5)], "id long, v double")
        )
    )
    assert dict(t.read(spark).dtypes)["v"] == "double"
    assert t.read(spark).count() == 2


def test_widen_refuses_live_equality_delete_key(spark, tmp_path):
    """Widening a live eq-delete key column is refused (r12 review,
    reproduced live): the delete file stores the key at its
    write-time width, and the connector's string-keyed is_in overlay
    would render the upcast data value differently (float 0.1 reads
    back as double 0.10000000149...) and resurrect the deleted rows
    while the native eqNullSafe join still dropped them. Same
    refusal rename/drop already apply; materialization clears it."""
    import pytest

    from pyspark.sql import functions as F

    t = LakehouseTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, 0.1), (2, 0.25)], "id long, k float"
        )
    )
    src = spark.createDataFrame([(9, 0.1)], "id long, k float")
    src = src.withColumn("k", F.col("k").cast("float"))
    t.merge(spark, src, keys=["k"], mode="merge-on-read")
    with pytest.raises(ValueError, match="equality-delete"):
        t.widen_column("k", "double")
    t.materialize_deletes(spark)
    # the delete file stays LIVE while pre-materialization snapshots
    # remain time-travelable (their reads still apply the tail, and
    # the connector reads old snapshots with the CURRENT schema), so
    # the guard holds until expiry GCs it — same lifecycle the
    # rename/drop guard follows
    with pytest.raises(ValueError, match="equality-delete"):
        t.widen_column("k", "double")
    t.expire_snapshots(keep_last=1)
    t.widen_column("k", "double")  # tail expired: widen is safe
    rows = {r["id"]: r["k"] for r in t.read(spark).collect()}
    assert set(rows) == {2, 9}
    assert t.read(spark).schema["k"].dataType.simpleString() == "double"
