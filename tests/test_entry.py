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


def test_correctness_window_holds_exactly_50_keys():
    """The driver hash-checks only the FIRST 50 queries() keys; the
    registry rotation must put priority + stalest keys inside and
    nothing non-demoted outside."""
    from biglake_iceberg_pipeline_spark.registry import (
        DEMOTED_KEYS,
        PRIORITY_KEYS,
    )

    keys = list(entrymod.queries())
    window = keys[:50]
    # priority keys lead the window (the registry skips any declared
    # priority key whose query isn't registered yet)
    present_priority = [k for k in PRIORITY_KEYS if k in set(keys)]
    assert present_priority == window[: len(present_priority)]
    leaked = [k for k in keys[50:] if k not in DEMOTED_KEYS]
    assert not leaked, f"non-demoted keys outside the window: {leaked}"


@pytest.mark.parametrize("key", list(entrymod.queries()))
def test_query_matches_oracle(spark, duck, key):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[key](spark, SF_SMOKE)
    if key in oracles:
        assert_matches_oracle(df, duck, oracles[key])
    else:
        assert df.collect() is not None
