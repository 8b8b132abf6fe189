"""Oracle type-parity lint — the gate that makes the HUGEINT class of
driver hash mismatch impossible to reintroduce (VERDICT r3 item 2).

DuckDB's SUM over integers returns HUGEINT (int128); Spark returns
BIGINT. The driver's value hash is type-sensitive, so even value-equal
results hash-diverge. Same for any cross-engine type-class divergence
(int vs double renders "5" vs "5.0"; naive vs tz-aware timestamps).
This lint DESCRIBEs every oracle under DuckDB, analyzes every Spark
query's schema (no execution), and fails on any class mismatch or any
DuckDB type Spark cannot emit.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tools.lint_oracles import (
    canon_duck,
    canon_spark,
    duck_schema,
    lint_output_types,
    lint_pair,
)

ORACLES = entrymod.oracle_sql()
ROWS_ONLY_KEYS = sorted(set(entrymod.queries()) - set(ORACLES))


@pytest.mark.parametrize("key", list(ORACLES))
def test_oracle_type_parity(spark, duck, key):
    qs = entrymod.queries()
    dcols = duck_schema(duck, ORACLES[key])
    sfields = qs[key](spark, SF_SMOKE).schema.fields
    problems = lint_pair(key, dcols, sfields)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_output_types(spark, key):
    """Rows-only queries also flow through the driver canonicalizer,
    so the array/map output ban (doctrine rule 6) applies to them."""
    qs = entrymod.queries()
    fields = qs[key](spark, SF_SMOKE).schema.fields
    problems = lint_output_types(key, fields)
    assert not problems, "\n".join(problems)


def test_lint_detects_array_output(spark):
    """Self-test for the r4 red: a query emitting a raw array column
    must be flagged (the driver's pandas canonicalizer cannot hash
    list cells)."""
    fields = spark.range(1).selectExpr("array(id) AS emb").schema.fields
    problems = lint_output_types("planted", fields)
    assert problems and "array" in problems[0]
    mfields = (
        spark.range(1).selectExpr("map('k', id) AS m").schema.fields
    )
    assert lint_output_types("planted", mfields)


def test_lint_detects_hugeint(duck):
    """Self-test: an uncast integer SUM must be flagged."""
    dcols = duck_schema(duck, "SELECT SUM(1) AS n_unit")
    assert dcols[0][1].upper() == "HUGEINT"
    problems = lint_pair("planted", dcols, [])
    assert problems and "HUGEINT" in problems[0].upper()


def test_lint_detects_column_name_mismatch(spark, duck):
    """Self-test: a misnamed oracle column (n_user vs n_users) must be
    flagged — the driver hash-fails on name sets, so the lint must
    too."""
    dcols = duck_schema(duck, "SELECT 1::BIGINT AS n_user")
    sfields = spark.range(1).selectExpr("id AS n_users").schema.fields
    problems = lint_pair("planted", dcols, sfields)
    assert problems and "column names differ" in problems[0]


def test_lint_detects_class_mismatch(spark, duck):
    """Self-test: oracle DOUBLE vs Spark BIGINT must be flagged."""
    dcols = duck_schema(duck, "SELECT 1.5::DOUBLE AS x")
    sfields = spark.range(1).selectExpr("id AS x").schema.fields
    problems = lint_pair("planted", dcols, sfields)
    assert problems and "type class differs" in problems[0]


def test_canonical_maps_agree_on_basics(spark, duck):
    """int/float/str/date/timestamp/bool/list round-trip to the same
    canonical class in both engines."""
    duck_sql = (
        "SELECT 1::BIGINT a, 1.0::DOUBLE b, 'x' c, DATE '2024-01-01' d, "
        "TIMESTAMP '2024-01-01 00:00:00' e, TRUE f, [1::BIGINT] g"
    )
    spark_sql = (
        "SELECT CAST(1 AS BIGINT) a, CAST(1.0 AS DOUBLE) b, 'x' c, "
        "DATE'2024-01-01' d, TIMESTAMP'2024-01-01 00:00:00' e, true f, "
        "array(CAST(1 AS BIGINT)) g"
    )
    dmap = {n: canon_duck(t) for n, t in duck_schema(duck, duck_sql)}
    smap = {
        f.name: canon_spark(f.dataType)
        for f in spark.sql(spark_sql).schema.fields
    }
    assert dmap == smap
