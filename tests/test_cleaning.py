"""Unit tests for cleaning/coercion operators without oracle queries
(mirrors reference tests/test_cleaning.py + test_core.py coverage)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import cleaning, coercion
from biglake_iceberg_pipeline_spark.operators.medallion import dedup_latest


def test_snake_case():
    sc = cleaning.snake_case
    assert sc("Order ID") == "order_id"
    assert sc("firstName") == "first_name"
    assert sc("UPPER") == "upper"
    assert sc("weird  spaces!!") == "weird_spaces"
    assert sc("") == "col"


def test_normalize_column_names_dedups(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["Order ID", "order id", "x"])
    out = cleaning.normalize_column_names(df)
    assert out.columns == ["order_id", "order_id_1", "x"]


def test_clean_string_pipeline(spark):
    df = spark.createDataFrame(
        [("  Hello World  ",), ("N/A",), ("  ",), ("-",)], "v string"
    )
    out = df.select(
        cleaning.clean_string("v", case="title").alias("t"),
        cleaning.clean_string("v", case="lower").alias("l"),
    ).collect()
    assert out[0]["t"] == "Hello World"
    assert out[0]["l"] == "hello world"
    assert out[1]["t"] is None  # sentinel
    assert out[2]["t"] is None  # blank
    assert out[3]["t"] is None  # dash


def test_replace_unknown_chars(spark):
    df = spark.createDataFrame([("bad�char",), ("clean",)], "v string")
    out = [r[0] for r in df.select(cleaning.replace_unknown_chars("v")).collect()]
    assert out == ["badchar", "clean"]


def test_standardize_date(spark):
    df = spark.createDataFrame(
        [("2020-01-02 03:04:05",), ("not a date",)], "v string"
    )
    out = [r[0] for r in df.select(cleaning.standardize_date("v")).collect()]
    assert out == ["2020-01-02", "not a date"]


def test_cast_rename_drop(spark):
    df = spark.createDataFrame([("12", "x")], "a string, b string")
    out = cleaning.cast_column(df, "a", "int")
    assert dict(out.dtypes)["a"] == "int"
    bad = cleaning.cast_column(
        spark.createDataFrame([("xyz",)], "a string"), "a", "int"
    )
    assert bad.collect()[0]["a"] is None  # try_cast, no ANSI error
    assert cleaning.rename_column(df, "b", "c").columns == ["a", "c"]
    assert cleaning.drop_column(df, "b").columns == ["a"]


def test_extract_currency_variants(spark):
    df = spark.createDataFrame(
        [("$1,234.56",), ("EUR 99.00",), ("£5",), ("¥1000",), ("12.5",), ("n/a",)],
        "price string",
    )
    rows = cleaning.extract_currency(df, "price").collect()
    got = [(r["price_value_type"], r["price_clean"]) for r in rows]
    assert got[0] == ("dollars", 1234.56)
    assert got[1] == ("euros", 99.0)
    assert got[2] == ("pounds", 5.0)
    assert got[3] == ("yen", 1000.0)
    assert got[4] == (None, 12.5)  # plain number: no symbol, still parsed
    assert got[5][1] is None


def test_add_processed_at_single_stamp(spark):
    out = cleaning.add_processed_at(spark.range(3))
    vals = {r["processed_at"] for r in out.collect()}
    assert len(vals) == 1  # plan-constant timestamp


def test_flag_overflow_rows(spark):
    df = spark.createDataFrame(
        [("1.5", "2"), ("oops", "3"), (None, "4")], "a string, b string"
    )
    out = coercion.flag_overflow_rows(df, ["a"]).collect()
    assert [r["is_shifted"] for r in out] == [False, True, False]


def test_dedup_latest_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "2020-01-01", "x"), (1, "2020-01-01", "y"), (2, "2020-01-01", "z")],
        "k long, ts string, v string",
    )
    out = dedup_latest(df, ["k"], "ts", tiebreak=["v"]).collect()
    got = {r["k"]: r["v"] for r in out}
    assert got == {1: "y", 2: "z"}  # ties broken deterministically (desc)


def test_recommend_types_leading_zeros_blocked(spark):
    df = spark.createDataFrame(
        [("01234", "true"), ("05678", "false")], "zip string, flag string"
    )
    out = {
        r["column_name"]: r["recommended_type"]
        for r in coercion.recommend_types(df).collect()
    }
    assert "zip" not in out  # leading zeros → stay string
    assert out["flag"] == "BOOLEAN"


def test_sample_rows_and_get_processed_at(spark):
    from biglake_iceberg_pipeline_spark.operators.cleaning import (
        add_processed_at,
        get_processed_at,
        sample_rows,
    )

    df = spark.range(100)
    assert sample_rows(df, 7).count() == 7
    stamped = add_processed_at(df)
    ts = get_processed_at(stamped)
    assert ts is not None
    empty = add_processed_at(spark.range(0))
    assert get_processed_at(empty) is None


def test_describe_table(spark):
    from biglake_iceberg_pipeline_spark.operators.schema_evolution import (
        describe_table,
    )

    df = spark.createDataFrame([(1, "x", 2.5)], "a long, b string, c double")
    rows = {
        r["column_name"]: r["column_type"]
        for r in describe_table(spark, df).collect()
    }
    assert rows == {"a": "BIGINT", "b": "VARCHAR", "c": "DOUBLE"}


def test_quality_report_structure_and_status(spark):
    import json

    from biglake_iceberg_pipeline_spark.operators.report import quality_report

    clean = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "id long, name string, v double",
    )
    rep = quality_report(clean, "clean_tbl")
    assert rep["overall_status"] == "pass" and rep["row_count"] == 3
    assert {c["column_name"] for c in rep["schema"]} == {"id", "name", "v"}
    idcol = next(c for c in rep["schema"] if c["column_name"] == "id")
    assert idcol["min"] == 1 and idcol["max"] == 3 and idcol["avg"] == 2.0
    json.dumps(rep)  # must be JSON-serializable as persisted

    warn = spark.createDataFrame(
        [(1, "N/A"), (1, "N/A"), (3, None)], "id long, name string"
    )
    rep2 = quality_report(warn)
    assert rep2["overall_status"] == "warn"
    kinds = {f["kind"] for f in rep2["findings"]}
    assert "null_like_values" in kinds and "duplicate_rows" in kinds

    crit = spark.createDataFrame(
        [(None,), (None,), (None,), (1.0,)], "v double"
    )
    # 75% nulls → warning; make it critical with one more null row
    crit2 = spark.createDataFrame([(None,)] * 99 + [(1.0,)], "v double")
    assert quality_report(crit)["overall_status"] == "warn"
    rep3 = quality_report(crit2)
    assert rep3["overall_status"] == "fail"
    assert rep3["status_reason"].startswith("1 critical")


def test_cleaning_report_deltas(spark):
    from pyspark.sql import functions as F

    from biglake_iceberg_pipeline_spark.operators.cleaning import (
        null_sentinels_to_null,
    )
    from biglake_iceberg_pipeline_spark.operators.report import (
        cleaning_report,
    )

    before = spark.createDataFrame(
        [(1, "a"), (2, "N/A"), (2, "N/A"), (3, "b")], "id long, name string"
    )
    after = before.withColumn(
        "name", null_sentinels_to_null("name")
    ).dropDuplicates()
    rep = cleaning_report(
        before, after, ["null_sentinels_to_null", "dropDuplicates"], "t"
    )
    assert rep["summary"]["before_rows"] == 4
    assert rep["summary"]["after_rows"] == 3
    assert rep["summary"]["rows_removed"] == 1
    assert rep["null_deltas"]["name"] == {"before": 0, "after": 1}
    assert rep["operations"] == ["null_sentinels_to_null", "dropDuplicates"]
