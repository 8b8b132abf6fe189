"""Incremental gold refresh: CDC scan + additive merge semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.plans import incremental
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def _orders(spark, sf="/root/testdata/sf0.001"):
    return spark.read.parquet(f"{sf}/orders.parquet")


def _expected(df):
    return {
        r["sale_date"]: (r["order_count"], round(r["revenue"], 2))
        for r in incremental.daily_sales_partial(df).collect()
    }


def test_incremental_refresh_matches_full_recompute(spark, tmp_path):
    orders = _orders(spark)
    b1 = orders.where("o_orderkey % 3 = 0")
    b2 = orders.where("o_orderkey % 3 = 1")
    b3 = orders.where("o_orderkey % 3 = 2")

    bronze = LakehouseTable(str(tmp_path / "bronze"))
    gold = LakehouseTable(str(tmp_path / "gold"))

    bronze.append(b1)
    assert incremental.refresh_daily_sales(spark, bronze, gold) is not None
    got = {
        r["sale_date"]: (r["order_count"], round(r["revenue"], 2))
        for r in gold.read(spark).collect()
    }
    assert got == _expected(b1)

    # second batch folds additively into the same keys
    bronze.append(b2)
    incremental.refresh_daily_sales(spark, bronze, gold)
    got = {
        r["sale_date"]: (r["order_count"], round(r["revenue"], 2))
        for r in gold.read(spark).collect()
    }
    assert got == _expected(b1.unionByName(b2))

    # no new data -> no-op, same snapshot
    snap = gold.current_snapshot_id()
    assert incremental.refresh_daily_sales(spark, bronze, gold) is None
    assert gold.current_snapshot_id() == snap

    # third batch
    bronze.append(b3)
    incremental.refresh_daily_sales(spark, bronze, gold)
    got = {
        r["sale_date"]: (r["order_count"], round(r["revenue"], 2))
        for r in gold.read(spark).collect()
    }
    assert got == _expected(orders)


def test_refresh_raises_on_rewrite_then_rebaselines(spark, tmp_path):
    orders = _orders(spark)
    bronze = LakehouseTable(str(tmp_path / "bronze"))
    gold = LakehouseTable(str(tmp_path / "gold"))
    bronze.append(orders.where("o_orderkey % 2 = 0"))
    incremental.refresh_daily_sales(spark, bronze, gold)

    # a rewrite (delete) invalidates the file-level CDC feed
    bronze.delete_where(spark, "o_totalprice < 1000")
    bronze.append(orders.where("o_orderkey % 2 = 1"))
    with pytest.raises(ValueError, match="rewrite"):
        incremental.refresh_daily_sales(spark, bronze, gold)

    # re-baseline: full recompute, watermark resets, increments resume
    incremental.full_refresh(
        spark, bronze, gold, incremental.daily_sales_partial
    )
    got = {
        r["sale_date"]: (r["order_count"], round(r["revenue"], 2))
        for r in gold.read(spark).collect()
    }
    assert got == _expected(bronze.read(spark))
    assert incremental.refresh_daily_sales(spark, bronze, gold) is None


def test_incremental_uniques_via_hll_sketch(spark, tmp_path):
    """COUNT DISTINCT maintained incrementally as mergeable sketch
    state: estimates after N incremental refreshes match a full
    recompute's estimates exactly (same sketch algorithm, same
    merges-vs-aggregate result within HLL determinism)."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    b1 = events.where("event_id % 2 = 0")
    b2 = events.where("event_id % 2 = 1")

    bronze = LakehouseTable(str(tmp_path / "bronze"))
    gold = LakehouseTable(str(tmp_path / "gold"))
    bronze.append(b1)
    incremental.refresh_daily_uniques(spark, bronze, gold)
    bronze.append(b2)
    incremental.refresh_daily_uniques(spark, bronze, gold)

    got = {
        r["event_date"]: (r["n_events"], r["approx_users"])
        for r in incremental.daily_uniques_estimate(
            gold.read(spark)
        ).collect()
    }
    exact = {
        r["event_date"]: (r["n"], r["d"])
        for r in events.groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("d"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for d, (n, est) in got.items():
        assert n == exact[d][0]  # counts are exact
        # HLL estimate within 5% of true distinct count
        true = exact[d][1]
        assert abs(est - true) <= max(1, 0.05 * true)
