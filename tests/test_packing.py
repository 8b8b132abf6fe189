"""Sequence packing: exact concatenate-and-split semantics, stability
across physical partitionings, and NO single-partition global window
in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)


def _naive(rows, cap):
    """Reference implementation: lay out in id order, split at cap."""
    out = {}
    start = 0
    for doc_id, n in sorted(rows):
        out[doc_id] = (start // cap, start % cap)
        start += n
    return out


def test_pack_matches_naive_and_is_partitioning_invariant(spark):
    rows = [(i, (i * 37) % 91 + 1) for i in range(500)]
    want = _naive(rows, cap=256)
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    for layout in (df, df.repartition(17), df.orderBy(F.desc("doc_id"))):
        packed = pack_sequences(layout, "doc_id", "n_tokens", cap=256)
        got = {
            r["doc_id"]: (r["seq_id"], r["seq_offset"])
            for r in packed.collect()
        }
        assert got == want
    # offsets tile the token axis exactly: total tokens accounted
    total = sum(n for _, n in rows)
    packed = pack_sequences(df, "doc_id", "n_tokens", cap=256)
    assert packed.agg(F.sum("n_tokens")).collect()[0][0] == total
    assert packed.agg(F.max("seq_id")).collect()[0][0] == (
        (total - 1) // 256
    )


def test_pack_no_global_single_partition_window(spark):
    """The scale property: the REAL pipeline's plan (pre-checkpoint,
    via _packing_plan) must window-partition by __pid — never an
    empty-partition-spec global window, which would serialize the
    corpus through one task."""
    from biglake_iceberg_pipeline_spark.operators.packing import (
        _packing_plan,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("n")
    )
    laid, out = _packing_plan(df, "doc_id", "n", 512, None)
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan
        # every window spec in the plan is partitioned by __pid: a
        # global window would show windowspecdefinition(doc_id ...)
        # with no partition key
        import re

        specs = re.findall(r"windowspecdefinition\(([^,]+)", plan)
        assert specs and all(s.strip().startswith("__pid") for s in specs)
        assert out.count() == 1000
    finally:
        laid.unpersist()


def test_pack_guards_and_summary(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "doc_id long, n_tokens long"
    )
    with pytest.raises(ValueError, match="cap"):
        pack_sequences(df, "doc_id", "n_tokens", cap=0)
    packed = pack_sequences(df, "doc_id", "n_tokens", cap=250)
    got = {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in packed.collect()}
    # doc1 [0,100), doc2 [100,300) straddles into seq 1, doc3 [300,600)
    assert got == {1: (0, 0), 2: (0, 100), 3: (1, 50)}
    summ = {
        r["seq_id"]: (r["n_docs"], r["tokens_started"])
        for r in packing_summary(packed).collect()
    }
    assert summ == {0: (2, 300), 1: (1, 300)}


def test_pack_composes_with_shard_export(spark, tmp_path):
    """Pack → shard by seq_id: each training shard holds whole
    sequences, and the export is deterministic."""
    from biglake_iceberg_pipeline_spark.sinks import shards

    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 40 + 5).alias("n")
    )
    packed = pack_sequences(df, "doc_id", "n", cap=512)
    m = shards.write_training_shards(
        packed, str(tmp_path / "s"), n_shards=4, id_col="seq_id",
        sort_within=["seq_id", "seq_offset"],
    )
    assert m["total_rows"] == 300
    # a sequence's docs all land in the same shard (id_col=seq_id)
    seen = {}
    for k in range(4):
        for r in shards.read_shard(spark, str(tmp_path / "s"), k).collect():
            assert seen.setdefault(r["seq_id"], k) == k
