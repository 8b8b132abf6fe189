"""SCD2 dimension merges + expectation gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import expectations
from biglake_iceberg_pipeline_spark.sinks import scd
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def test_scd2_versions_history_and_asof(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "dim"))
    v1 = spark.createDataFrame(
        [(1, "alice", "MA"), (2, "bob", "NY")],
        "id long, name string, state string",
    )
    scd.scd2_merge(spark, t, v1, ["id"], "2024-01-01 00:00:00")

    # alice moves; bob unchanged; carol appears
    v2 = spark.createDataFrame(
        [(1, "alice", "CA"), (2, "bob", "NY"), (3, "carol", "TX")],
        "id long, name string, state string",
    )
    scd.scd2_merge(spark, t, v2, ["id"], "2024-06-01 00:00:00")

    rows = t.read(spark).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["id"], []).append(r)
    # alice: closed v1 + current v2; bob: single untouched version
    assert len(by_key[1]) == 2 and len(by_key[2]) == 1 and len(by_key[3]) == 1
    cur = {r["id"]: r for r in rows if r[scd.IS_CURRENT]}
    assert cur[1]["state"] == "CA" and cur[2]["state"] == "NY"
    old_alice = [r for r in by_key[1] if not r[scd.IS_CURRENT]][0]
    assert old_alice["state"] == "MA"
    assert str(old_alice[scd.VALID_TO]).startswith("2024-06-01")

    # as-of reconstruction
    asof_feb = {r["id"]: r["state"] for r in scd.as_of(spark, t, "2024-02-01").collect()}
    assert asof_feb == {1: "MA", 2: "NY"}
    asof_jul = {r["id"]: r["state"] for r in scd.as_of(spark, t, "2024-07-01").collect()}
    assert asof_jul == {1: "CA", 2: "NY", 3: "TX"}

    # unchanged feed -> no new versions
    pre = t.read(spark).count()
    scd.scd2_merge(spark, t, v2, ["id"], "2024-07-15 00:00:00")
    assert t.read(spark).count() == pre

    # partial feed touches only its keys
    scd.scd2_merge(
        spark,
        t,
        spark.createDataFrame([(2, "bob", "NJ")], "id long, name string, state string"),
        ["id"],
        "2024-08-01 00:00:00",
    )
    cur = {r["id"]: r["state"] for r in scd.as_of(spark, t, "2024-09-01").collect()}
    assert cur == {1: "CA", 2: "NJ", 3: "TX"}

    with pytest.raises(ValueError, match="duplicate"):
        scd.scd2_merge(
            spark,
            t,
            spark.createDataFrame([(9, "x", "a"), (9, "y", "b")],
                                  "id long, name string, state string"),
            ["id"],
            "2024-09-01 00:00:00",
        )


def test_expectations_warn_drop_fail(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 2.0)], "id long, v double"
    )
    rules = {
        "v_not_null": F.col("v").isNotNull(),
        "v_positive": F.col("v").isNull() | (F.col("v") > 0),
    }
    out, metrics = expectations.check(df, rules, on_violation="warn")
    assert metrics == {"v_not_null": 1, "v_positive": 1}
    assert out.count() == 4

    out, metrics = expectations.check(df, rules, on_violation="drop")
    assert sorted(r["id"] for r in out.collect()) == [1, 4]

    with pytest.raises(expectations.ExpectationsFailed) as ei:
        expectations.check(df, rules, on_violation="fail")
    assert ei.value.metrics["v_not_null"] == 1

    clean = spark.createDataFrame([(1, 1.0)], "id long, v double")
    out, metrics = expectations.check(clean, rules, on_violation="fail")
    assert metrics == {"v_not_null": 0, "v_positive": 0}
