"""Salted-join equivalence and bucketed-join shuffle elimination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.skew import (
    salted_join,
    skew_safe_count_distinct,
)
from biglake_iceberg_pipeline_spark.sinks import bucketed


def _skewed_frames(spark):
    # key 1 owns 90% of the fact side (planted hot key)
    fact = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1))
        .otherwise(F.col("id"))
        .alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    dim = spark.range(0, 1000, 1).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_join_matches_plain_inner(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, "k").select("k", "v", "name")
    salted = salted_join(fact, dim, ["k"], n_salts=8).select("k", "v", "name")
    assert sorted(plain.collect()) == sorted(salted.collect())
    assert salted.count() == 1000


def test_salted_join_left_keeps_unmatched(spark):
    fact, dim = _skewed_frames(spark)
    dim_missing_hot = dim.where(F.col("k") != 1)  # hot key unmatched
    plain = fact.join(dim_missing_hot, "k", "left").select("k", "v", "name")
    salted = salted_join(fact, dim_missing_hot, ["k"], 8, "left").select(
        "k", "v", "name"
    )
    assert sorted(plain.collect(), key=str) == sorted(
        salted.collect(), key=str
    )
    # each unmatched hot row appears exactly once, with NULL name
    assert salted.where(F.col("name").isNull()).count() == 900


def test_salted_join_rejects_outer(spark):
    fact, dim = _skewed_frames(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, ["k"], how="full")


def test_skew_safe_count_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (3, None), (3, "z")],
        "k long, x string",
    )
    got = {
        r["k"]: r["n_distinct"]
        for r in skew_safe_count_distinct(df, ["k"], "x").collect()
    }
    # NULL counts as a groupBy value here (a distinct bucket), unlike
    # COUNT(DISTINCT x); document via the expectation:
    assert got == {1: 2, 2: 1, 3: 2}


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("b")
    )
    bucketed.drop_table(spark, "t_left_bkt")
    bucketed.drop_table(spark, "t_right_bkt")
    bucketed.write_bucketed(left, "t_left_bkt", ["k"], 8, sort_cols=["k"])
    bucketed.write_bucketed(right, "t_right_bkt", ["k"], 8, sort_cols=["k"])
    try:
        # disable broadcast so the join would otherwise shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed.read_table(spark, "t_left_bkt").join(
            bucketed.read_table(spark, "t_right_bkt"), "k"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 10_000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        bucketed.drop_table(spark, "t_left_bkt")
        bucketed.drop_table(spark, "t_right_bkt")
