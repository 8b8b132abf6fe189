"""Central registry of (query, oracle) pairs across all plan modules.

Every operator claimed done in SURVEY.md §2 registers here; the driver
contract (__spark_entry__.py) re-exports it.

Key ORDER is part of the contract: the driver's correctness gate checks
the first 50 keys only. Keys are therefore emitted as:

1. ``PRIORITY_KEYS`` — queries needing a driver row THIS round: fixes
   to re-verify (rounding sweep, events-loader regression) and queries
   added this round.
2. Modules never driver-checked through round 2 (the r1/r2 window ended
   at ``dedup_simhash``): the rest of llm_ops, streaming_schema,
   analytics, curation, temporal.
3. Everything else (driver-green in r1/r2; their status is on record).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Re-verify fixes (rounding sweep + events-loader regression) and
# round-3 additions. Keep len(PRIORITY_KEYS) + never-checked <= 50.
PRIORITY_KEYS = (
    "q9_profit_by_nation",
    "gold_customer_metrics",
    "gold_product_performance",
    "currency_convert",
    "silver_dedup_events",
    "profile_column_stats",
    "profile_type_distribution",
    "users_enriched",
)

# Already driver-checked in r1/r2 (the old window ended inside llm_ops)
# — push behind every never-checked key so the 50-row window lands on
# queries with no driver row yet.
DEMOTED_KEYS = frozenset(
    {"dedup_exact", "dedup_minhash", "dedup_simhash"}
)


def _modules():
    from biglake_iceberg_pipeline_spark.plans import (
        analytics,
        curation,
        gold,
        llm_ops,
        profiling_quality,
        streaming_schema,
        temporal,
        tpch,
        tpch2,
    )

    # Never-driver-checked modules first (llm_ops's first three keys
    # WERE checked, but its tail wasn't — the dedup/ann/text family).
    return [
        llm_ops,
        streaming_schema,
        analytics,
        curation,
        temporal,
        tpch,
        tpch2,
        gold,
        profiling_quality,
    ]


def _ordered(raw: dict):
    out = {}
    for key in PRIORITY_KEYS:
        if key in raw:
            out[key] = raw[key]
    for key, val in raw.items():
        if key not in out and key not in DEMOTED_KEYS:
            out[key] = val
    for key, val in raw.items():
        if key not in out:
            out[key] = val
    return out


def spark_queries() -> dict[str, QueryFn]:
    raw: dict[str, QueryFn] = {}
    for mod in _modules():
        for key, fn in mod.QUERIES.items():
            if key in raw:
                raise ValueError(f"duplicate query key {key!r}")
            raw[key] = fn
    return _ordered(raw)


def oracle_queries() -> dict[str, str]:
    raw: dict[str, str] = {}
    for mod in _modules():
        raw.update(getattr(mod, "ORACLE", {}))
    return _ordered(raw)
