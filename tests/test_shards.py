"""Deterministic training-shard export: stable membership, one file
per shard, footer-backed manifest, pruned single-shard reads."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.sinks import shards


def test_shards_deterministic_and_complete(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("tokens"),
    )
    m = shards.write_training_shards(
        df, str(tmp_path / "a"), n_shards=8, id_col="doc_id",
        sum_col="tokens",
    )
    assert m["n_shards"] == 8 and m["total_rows"] == 1000
    assert set(m["shards"]) == {str(i) for i in range(8)}
    # one file per shard; manifest rows match footers
    assert all(len(s["files"]) == 1 for s in m["shards"].values())
    assert sum(s["sum_tokens"] for s in m["shards"].values()) == int(
        df.agg(F.sum("tokens")).collect()[0][0]
    )
    # membership is a pure function of the id: a differently
    # partitioned copy of the same data shards identically
    df2 = df.repartition(17).sortWithinPartitions("tokens")
    shards.write_training_shards(
        df2, str(tmp_path / "b"), n_shards=8, id_col="doc_id"
    )
    for k in range(8):
        a = {r["doc_id"] for r in shards.read_shard(spark, str(tmp_path / "a"), k).collect()}
        b = {r["doc_id"] for r in shards.read_shard(spark, str(tmp_path / "b"), k).collect()}
        assert a == b and a  # same membership, nothing empty
    # shards partition the id space (disjoint + complete)
    union = set()
    for k in range(8):
        part = {r["doc_id"] for r in shards.read_shard(spark, str(tmp_path / "a"), k).collect()}
        assert not (union & part)
        union |= part
    assert len(union) == 1000


def test_shards_sorted_within_and_manifest_roundtrip(spark, tmp_path):
    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (999 - F.col("id")).alias("length")
    )
    shards.write_training_shards(
        df, str(tmp_path / "s"), n_shards=4, id_col="doc_id",
        sort_within=["length"],
    )
    m = shards.shard_manifest(str(tmp_path / "s"))
    assert m["total_rows"] == 200
    got = [r["length"] for r in shards.read_shard(spark, str(tmp_path / "s"), 0).collect()]
    assert got == sorted(got)  # within-shard order is on disk
    assert os.path.exists(str(tmp_path / "s" / "_shards.json"))


def test_empty_shard_gets_manifest_entry_and_typed_read(spark, tmp_path):
    # 2 rows into 16 shards: most hash buckets are empty — a fixed-
    # count layout still promises all 16 manifest entries, and
    # read_shard returns a typed empty frame for a missing directory
    df = spark.range(2).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("body")
    )
    m = shards.write_training_shards(
        df, str(tmp_path / "e"), n_shards=16, id_col="doc_id"
    )
    assert set(m["shards"]) == {str(i) for i in range(16)}
    empties = [k for k, s in m["shards"].items() if s["rows"] == 0]
    assert empties and all(
        m["shards"][k] == {"rows": 0, "bytes": 0, "files": []}
        for k in empties
    )
    k = int(empties[0])
    got = shards.read_shard(spark, str(tmp_path / "e"), k)
    assert got.count() == 0
    assert set(got.columns) == {"doc_id", "body"}


def test_shards_from_tagged_snapshot_reproducible(spark, tmp_path):
    """Tag-pinned export: 'training set v3' = tag + shard manifest.
    The same tag yields a byte-identical _shards.json across runs,
    even after the table moved on past the tag."""
    import json

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )

    t = LakehouseTable(str(tmp_path / "docs"))
    t.append(
        spark.range(300).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), F.col("id")).alias("body"),
        )
    )
    t.tag("v3")
    m1 = shards.write_training_shards_from_table(
        spark, t, str(tmp_path / "e1"), n_shards=4, id_col="doc_id",
        tag="v3", sort_within=["doc_id"],
    )
    assert m1["source"]["tag"] == "v3"
    assert m1["source"]["snapshot_id"] == t.current_snapshot_id()
    # table moves on — the tag still pins the export input
    t.append(
        spark.range(300, 400).select(
            F.col("id").alias("doc_id"),
            F.lit("later").alias("body"),
        )
    )
    shards.write_training_shards_from_table(
        spark, t, str(tmp_path / "e2"), n_shards=4, id_col="doc_id",
        tag="v3", sort_within=["doc_id"],
    )
    b1 = open(str(tmp_path / "e1" / "_shards.json"), "rb").read()
    b2 = open(str(tmp_path / "e2" / "_shards.json"), "rb").read()
    assert b1 == b2  # byte-identical manifest
    assert json.loads(b1)["total_rows"] == 300
    # deterministic file names inside each shard
    for k, s in json.loads(b1)["shards"].items():
        assert all(f.startswith("part-") and "-" not in f[5:-8]
                   for f in s["files"])
    # unknown tag is a clear error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not found"):
        shards.write_training_shards_from_table(
            spark, t, str(tmp_path / "e3"), n_shards=4,
            id_col="doc_id", tag="nope",
        )


def test_fully_empty_export_still_reads_typed(spark, tmp_path):
    """An export whose input has ZERO rows writes no shard dirs at
    all; read_shard must still return the typed empty frame the
    manifest promises (schema recorded in _shards.json)."""
    df = spark.range(0).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("body")
    )
    m = shards.write_training_shards(
        df, str(tmp_path / "z"), n_shards=4, id_col="doc_id"
    )
    assert m["total_rows"] == 0
    assert set(m["shards"]) == {"0", "1", "2", "3"}
    got = shards.read_shard(spark, str(tmp_path / "z"), 2)
    assert got.count() == 0
    assert set(got.columns) == {"doc_id", "body"}
