"""Lakehouse streaming SINK (format("lakehouse") writer): txn-stamped
atomic epoch commits, replay no-ops, schema evolution at commit,
abort cleanup, and the fully declarative lakehouse→lakehouse
composition."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable
from biglake_iceberg_pipeline_spark.streaming.source import (
    read_lakehouse_stream,
    write_lakehouse_stream,
)


def _drain(q, timeout_s: float = 20.0):
    import time

    deadline = time.monotonic() + timeout_s
    while q.isActive and time.monotonic() < deadline:
        time.sleep(0.2)
    assert not q.isActive


def _run(writer):
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    _drain(q)


def test_declarative_lakehouse_to_lakehouse(spark, tmp_path):
    """Source format + sink format, no foreachBatch anywhere: bronze
    commits replicate into silver exactly once across restarts, and
    a run with nothing new commits nothing."""
    bronze = LakehouseTable(str(tmp_path / "bronze"))
    bronze.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    )
    bronze.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    silver_path = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ck")

    def run():
        _run(
            write_lakehouse_stream(
                read_lakehouse_stream(spark, bronze.path).withColumn(
                    "v", F.upper("v")
                ),
                silver_path,
                ckpt,
                "rep-1",
            )
        )

    run()
    silver = LakehouseTable(silver_path)
    assert sorted(
        (r["id"], r["v"]) for r in silver.read(spark).collect()
    ) == [(1, "A"), (2, "B"), (3, "C")]
    bronze.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    run()
    assert sorted(r["id"] for r in silver.read(spark).collect()) == [
        1,
        2,
        3,
        4,
    ]
    assert all(s["operation"] == "append" for s in silver.snapshots)
    snap = silver.current_snapshot_id()
    run()  # no new bronze commits: silver untouched
    assert silver.current_snapshot_id() == snap


def test_sink_requires_txn_app_id(spark, tmp_path):
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.dataSource.register(LakehouseStreamSource)
    src = spark.readStream.format("rate").load()
    with pytest.raises(Exception, match="txnAppId"):
        q = (
            src.writeStream.format("lakehouse")
            .option("path", str(tmp_path / "t"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        raise RuntimeError(q.exception() or "no failure surfaced")


def test_sink_writes_identity_partitioned_layout(spark, tmp_path):
    """The sink writes identity-partitioned tables hive-style —
    value in the path, column dropped from the file, exactly
    append()'s layout — so reads restore values and partition
    pruning is exact on sink-written files."""
    tbl = LakehouseTable(str(tmp_path / "t"), partition_by=["region"])
    tbl.append(
        spark.createDataFrame([(1, "eu")], "id long, region string")
    )
    bronze = LakehouseTable(str(tmp_path / "b"))
    bronze.append(
        spark.createDataFrame(
            [(2, "us"), (3, "eu"), (4, None)],
            "id long, region string",
        )
    )
    _run(
        write_lakehouse_stream(
            read_lakehouse_stream(spark, bronze.path),
            tbl.path,
            str(tmp_path / "ck"),
            "part-app",
        )
    )
    got = {
        r["id"]: r["region"] for r in tbl.read(spark).collect()
    }
    assert got == {1: "eu", 2: "us", 3: "eu", 4: None}
    # hive layout on disk + per-file values recorded for pruning
    m = tbl._read_manifest()
    sink_files = [
        f for f in m["snapshots"][-1]["files"] if "region=" in f
    ]
    assert any("region=us" in f for f in sink_files)
    assert any(
        "__HIVE_DEFAULT_PARTITION__" in f for f in sink_files
    )
    pruned = tbl.pruned_files({"region": ("us", "us")})
    # eu files pruned; the NULL-partition file is conservatively
    # kept (NULL partition values never prune — table contract)
    assert any("region=us" in f for f in pruned)
    assert not any("region=eu" in f for f in pruned)
    # the column is NOT stored in the data files (path-only)
    import pyarrow.parquet as pq

    us_file = next(f for f in pruned if "region=us" in f)
    assert "region" not in pq.ParquetFile(us_file).schema_arrow.names


def test_sink_partition_values_with_separator_and_sentinel(
    spark, tmp_path
):
    """Adversarial partition values must not merge groups: the
    executor-side batch split joins per-column keys with \\x1f and
    marks NULL with a \\x00 sentinel — a raw value containing the
    separator (multi-col spec) or equal to the sentinel used to
    collapse distinct partition tuples into one group, writing rows
    under the WRONG hive directory (and since the column is restored
    from the path on read, silently flipping their partition
    values). Keys are now percent-escaped before joining."""
    tbl = LakehouseTable(
        str(tmp_path / "t"), partition_by=["a", "b"]
    )
    tbl.append(
        spark.createDataFrame(
            [(0, "seed", "seed")], "id long, a string, b string"
        )
    )
    rows = [
        # both join to 'x<SEP>y<SEP>z' under the unescaped key
        (1, "x\x1fy", "z"),
        (2, "x", "y\x1fz"),
        # a real value equal to the NULL sentinel vs an actual NULL
        (3, "\x00__NULL__", "w"),
        (4, None, "w"),
        # '%' must survive its own escaping round-trip
        (5, "50%off", "w"),
    ]
    bronze = LakehouseTable(str(tmp_path / "b"))
    bronze.append(
        spark.createDataFrame(rows, "id long, a string, b string")
    )
    _run(
        write_lakehouse_stream(
            read_lakehouse_stream(spark, bronze.path),
            tbl.path,
            str(tmp_path / "ck"),
            "adv-part",
        )
    )
    got = {
        r["id"]: (r["a"], r["b"])
        for r in tbl.read(spark).collect()
        if r["id"] > 0
    }
    assert got == {i: (a, b) for i, a, b in rows}
    # the four distinct (a, b) tuples with id 1-4 landed in four
    # distinct files (one group each), not a merged one
    m = tbl._read_manifest()
    sink_files = [
        f
        for f in m["snapshots"][-1]["files"]
        if "stream-adv-part" in f
    ]
    assert len(sink_files) == len(rows)


def test_sink_partition_by_option_creates_spec(spark, tmp_path):
    """A brand-new table gets its identity spec from the sink's
    partitionBy option; the first commit records it."""
    bronze = LakehouseTable(str(tmp_path / "b"))
    bronze.append(
        spark.createDataFrame(
            [(1, "eu"), (2, "us")], "id long, region string"
        )
    )
    dest_path = str(tmp_path / "dest")
    q = (
        write_lakehouse_stream(
            read_lakehouse_stream(spark, bronze.path),
            dest_path,
            str(tmp_path / "ck"),
            "newpart",
        )
        .option("partitionBy", "region")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    _drain(q)
    dest = LakehouseTable(dest_path)
    assert dest.partition_by == ["region"]
    assert sorted(
        (r["id"], r["region"]) for r in dest.read(spark).collect()
    ) == [(1, "eu"), (2, "us")]
    assert len(dest.pruned_files({"region": ("eu", "eu")})) == 1


def test_sink_still_rejects_transform_specs(spark, tmp_path):
    tbl = LakehouseTable(
        str(tmp_path / "t"), partition_by=["bucket(4, id)"]
    )
    tbl.append(spark.createDataFrame([(1,)], "id long"))
    src = spark.readStream.format("rate").load().selectExpr(
        "value as id"
    )
    with pytest.raises(Exception, match="identity"):
        q = (
            write_lakehouse_stream(
                src, tbl.path, str(tmp_path / "ck"), "app"
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        raise RuntimeError(q.exception() or "no failure surfaced")


def test_sink_evolves_schema_on_commit(spark, tmp_path):
    """Loader-style create-or-append through the sink: a stream with
    an extra column ADDS it to the committed schema; pre-evolution
    rows surface NULL on read."""
    bronze = LakehouseTable(str(tmp_path / "bronze"))
    bronze.append(
        spark.createDataFrame([(1, "a", 1.5)], "id long, v string, s double")
    )
    dest_path = str(tmp_path / "dest")
    dest = LakehouseTable(dest_path)
    dest.append(spark.createDataFrame([(0, "z")], "id long, v string"))
    _run(
        write_lakehouse_stream(
            read_lakehouse_stream(spark, bronze.path),
            dest_path,
            str(tmp_path / "ck"),
            "evo",
        )
    )
    rows = {r["id"]: r["s"] for r in dest.read(spark).collect()}
    assert rows == {0: None, 1: 1.5}


def test_sink_abort_removes_staged_files(spark, tmp_path):
    """A poisoned epoch (one task raises) must leave the table
    exactly as before: manifest unchanged and the successful tasks'
    staged parquet removed by abort."""
    from pyspark.sql.types import LongType

    dest_path = str(tmp_path / "dest")
    dest = LakehouseTable(dest_path)
    dest.append(spark.createDataFrame([(0,)], "id long"))
    snap = dest.current_snapshot_id()
    bronze = LakehouseTable(str(tmp_path / "bronze"))
    bronze.append(
        spark.createDataFrame([(i,) for i in range(1, 9)], "id long")
    )

    @F.udf(LongType())
    def poison(x):
        if x == 5:
            raise RuntimeError("poisoned row")
        return x

    with pytest.raises(Exception, match="poisoned|StreamingQuery"):
        q = (
            write_lakehouse_stream(
                read_lakehouse_stream(spark, bronze.path).repartition(
                    4, "id"
                ).withColumn("id", poison("id")),
                dest_path,
                str(tmp_path / "ck"),
                "ab",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        raise RuntimeError(q.exception() or "no failure surfaced")
    assert dest.current_snapshot_id() == snap
    referenced = set(dest.snapshots[-1]["files"])
    on_disk = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(dest_path)
        for f in fs
        if f.endswith(".parquet")
    }
    # abort reconciles the deterministic staging root against the
    # manifest, so even the failed task's partial file is gone
    leftovers = on_disk - referenced
    assert leftovers == set()


def test_sink_from_file_source(spark, tmp_path):
    """Plain file source → lakehouse sink: the declarative form of
    the foreachBatch ingest."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "a.json").write_text('{"id": 1}\n{"id": 2}\n')
    src = (
        spark.readStream.schema("id long")
        .json(str(inbox))
    )
    dest_path = str(tmp_path / "dest")
    _run(
        write_lakehouse_stream(
            src, dest_path, str(tmp_path / "ck"), "files"
        )
    )
    dest = LakehouseTable(dest_path)
    assert sorted(r["id"] for r in dest.read(spark).collect()) == [1, 2]


def test_sink_partition_by_option_refuses_existing_tables(
    spark, tmp_path
):
    """partitionBy may only DECLARE a spec for a genuinely new table:
    an existing populated unpartitioned table must evolve its spec
    explicitly, and a table evolved TO unpartitioned is refused
    upfront (not at epoch commit)."""
    bronze = LakehouseTable(str(tmp_path / "b"))
    bronze.append(
        spark.createDataFrame([(1, "eu")], "id long, region string")
    )

    def start(dest):
        return (
            write_lakehouse_stream(
                read_lakehouse_stream(spark, bronze.path),
                dest,
                str(tmp_path / f"ck-{os.path.basename(dest)}"),
                "app",
            )
            .option("partitionBy", "region")
            .trigger(availableNow=True)
            .start()
        )

    # populated unpartitioned table: refused
    t1 = LakehouseTable(str(tmp_path / "t1"))
    t1.append(
        spark.createDataFrame([(0, "us")], "id long, region string")
    )
    with pytest.raises(Exception, match="evolve_partition_spec"):
        q = start(t1.path)
        q.awaitTermination(60)
        raise RuntimeError(q.exception() or "no failure surfaced")
    # evolved-to-unpartitioned (spec key present, None): refused
    t2 = LakehouseTable(str(tmp_path / "t2"), partition_by=["region"])
    t2.append(
        spark.createDataFrame([(0, "us")], "id long, region string")
    )
    t2.evolve_partition_spec(None)
    with pytest.raises(Exception, match="evolved to unpartitioned"):
        q = start(t2.path)
        q.awaitTermination(60)
        raise RuntimeError(q.exception() or "no failure surfaced")
