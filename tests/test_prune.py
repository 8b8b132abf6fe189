"""Join-pruning: runtime Bloom-filter injection + semi-join reduction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.prune import (
    BLOOM_APPLICATION_THRESHOLD,
    BLOOM_CREATION_THRESHOLD,
    bloom_filter_confs,
    semi_join_prune,
)
from biglake_iceberg_pipeline_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture
def bloom_forced(spark):
    keys = [BLOOM_APPLICATION_THRESHOLD, "spark.sql.autoBroadcastJoinThreshold"]
    old = {k: spark.conf.get(k) for k in keys}
    for k, v in bloom_filter_confs(force=True).items():
        spark.conf.set(k, v)
    # injection targets probable-shuffle joins only: at test scale the
    # dim broadcasts by size, so disable auto-broadcast to produce the
    # shuffle-join shape a 100 TB dim-join would have
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


def _selective_join(spark):
    """lineitem ⋈ low-balance-suppliers: dim filter on a non-join
    column, the shape the runtime Bloom filter targets."""
    li = load_table(spark, SF, "lineitem")
    sup = load_table(spark, SF, "supplier").where(F.col("s_acctbal") < 1500)
    return li.join(sup, li.l_suppkey == sup.s_suppkey).select(
        "l_orderkey", "l_suppkey", "s_name"
    )


def test_bloom_filter_injected_when_forced(bloom_forced):
    df = _selective_join(bloom_forced)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in optimized, optimized[:2000]


def test_bloom_filter_not_injected_at_default_thresholds(spark):
    # Default application threshold (10 GB): local-scale scans stay
    # below it, so even the shuffle-join shape gets no bloom probe —
    # the knob is purely a scale trigger.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _selective_join(spark)
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in optimized
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bloom_filter_preserves_results(spark, bloom_forced):
    rows = sorted(
        (r.l_orderkey, r.l_suppkey) for r in _selective_join(bloom_forced).collect()
    )
    li = load_table(spark, SF, "lineitem")
    sup = load_table(spark, SF, "supplier").where(F.col("s_acctbal") < 1500)
    expected = sorted(
        (r.l_orderkey, r.l_suppkey)
        for r in li.join(
            F.broadcast(sup), li.l_suppkey == sup.s_suppkey
        ).collect()
    )
    assert rows == expected and len(rows) > 0


def test_semi_join_prune_matches_inner_join_keys(spark):
    li = load_table(spark, SF, "lineitem")
    sup = load_table(spark, SF, "supplier").where(F.col("s_acctbal") < 1500)
    pruned = semi_join_prune(li, sup, [("l_suppkey", "s_suppkey")])
    expected = (
        li.join(sup, li.l_suppkey == sup.s_suppkey, "left_semi").count()
    )
    assert pruned.count() == expected and expected > 0
    # plan shape: broadcast left-semi, no shuffle of the fact side
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_semi_join_prune_composite_key(spark):
    li = load_table(spark, SF, "lineitem")
    keys = li.select("l_orderkey", "l_suppkey").limit(50)
    pruned = semi_join_prune(
        li, keys, [("l_orderkey", "l_orderkey"), ("l_suppkey", "l_suppkey")]
    )
    assert 0 < pruned.count() <= li.count()
