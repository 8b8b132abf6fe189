"""Central registry of (query, oracle) pairs across all plan modules.

Every operator claimed done in SURVEY.md §2 registers here; the driver
contract (__spark_entry__.py) re-exports it.

Key ORDER is part of the contract: the driver's correctness gate checks
the first 50 keys only. Keys are therefore emitted as:

1. ``PRIORITY_KEYS`` — queries needing a driver row THIS round: last
   round's red fixes to re-verify plus queries added this round.
2. Non-demoted keys in module order — the stalest keys (no driver row
   in the most recent round), filling the window to exactly 50.
3. ``DEMOTED_KEYS`` — checked green in the latest round (their status
   is on record); they rotate back as the window moves.

Per-round rotation recipe: promote fixes+new to PRIORITY, demote the
latest CORRECTNESS_rN green set, then assert
``len([k for k in queries() if k not in DEMOTED_KEYS]) == 50``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Round-5 window: re-verify product_catalog (the only r4 red — array
# output column, now a scalar digest) plus queries added this round.
# Everything else in the window is the stalest set: the 49 keys whose
# last driver row is r2/r3 (they were demoted in r4), including the
# VERDICT-requested q6/q7/q9/q10/q1, gold_customer_metrics,
# currency_convert, silver_dedup_events.
PRIORITY_KEYS = (
    "product_catalog",
    "ann_ivf_int8",
    "dedup_incremental",
)

# The 49 keys the r4 driver window checked green (CORRECTNESS_r04) —
# their status is on record, so they rotate behind the stale set.
# product_catalog (r4's one red) stays in the window for re-verify.
DEMOTED_KEYS = frozenset({
    "embedding_stats",
    "ngram_contamination",
    "span_boilerplate",
    "events_sessions",
    "events_funnel",
    "product_catalog_ann",
    "customer_lookalike",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "ann_ivf_kmeans",
    "text_bpe_tokens",
    "embedding_quantization",
    "q3_top_orders",
    "q5_region_revenue",
    "q8_market_share",
    "q13_order_distribution",
    "q15_top_supplier",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q2_min_cost_supplier",
    "q4_priority_waiting",
    "q11_important_parts",
    "q12_priority_shipping",
    "q16_supplier_variety",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "silver_orders",
    "clean_customer",
    "gold_daily_sales",
    "gold_orders_enriched",
    "cohort_retention",
    "customer_profiles",
    "rfm_segments",
    "address_standardize",
    "profile_nulls",
    "profile_date_potential",
    "profile_number_potential",
    "quality_duplicates",
    "quality_approx_duplicates",
    "quality_type_pollution",
    "quality_null_like",
    "safe_type_coercion",
    "flag_duplicates",
    "extract_currency",
    "clean_documents",
    "drop_empty_rows",
    # r3-green, demoted to make room for ann_ivf_int8 in the window
    "ann_topk",
    # r3-green, demoted to make room for dedup_incremental (r5)
    "compare_schemas",
})


def _modules():
    from biglake_iceberg_pipeline_spark.plans import (
        analytics,
        curation,
        gold,
        llm_ops,
        product_catalog,
        profiling_quality,
        streaming_schema,
        temporal,
        tpch,
        tpch2,
    )

    return [
        llm_ops,
        streaming_schema,
        analytics,
        curation,
        temporal,
        product_catalog,
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
