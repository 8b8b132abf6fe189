"""Driver-contract tests: entry() runs, every queries() entry runs at
sf0.001 and matches its oracle_sql() on DuckDB."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE, assert_matches_oracle


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_query_keys_subset_of_oracle_domain():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "no queries registered"
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle keys without query: {unknown}"


@pytest.mark.parametrize("key", list(entrymod.queries()))
def test_query_matches_oracle(spark, duck, key):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[key](spark, SF_SMOKE)
    if key in oracles:
        assert_matches_oracle(df, duck, oracles[key])
    else:
        assert df.collect() is not None
