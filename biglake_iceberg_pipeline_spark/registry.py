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

# Round-9 window: the thirteen r6-stale TPC-H overflow keys lead (no
# driver row since r6 — the verdict's rotation target: after this
# round no key's latest row is older than r7), then new r9 queries.
# The rest of the window fills with the r7-green keys in module
# order; the 50 r8-green keys demote, plus eleven r7-green keys so
# the window holds exactly 50.
PRIORITY_KEYS = (
    # new in r9
    "quality_classifier_score",
    "ccnet_ppl_buckets",
    "token_budget_mixture",
    # r6-stale TPC-H overflow — rows most urgently needed
    "q8_market_share",
    "q15_top_supplier",
    "q13_order_distribution",
    "q14_promo_effect",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q2_min_cost_supplier",
    "q4_priority_waiting",
    "q11_important_parts",
    "q12_priority_shipping",
    "q16_supplier_variety",
    "q20_excess_suppliers",
    "q22_idle_customers",
)

# The 50 keys green in CORRECTNESS_r08 (their status is on record),
# plus eleven r7-green keys keeping the window at exactly 50; the
# remaining 37 r7-green keys fill the r9 window after the priorities.
DEMOTED_KEYS = frozenset({
    # r8-green set
    "lakehouse_point_lookup",
    "lakehouse_bloom_lookup",
    "semantic_dedup",
    "source_quota_sample",
    "dedup_best_quality",
    "dedup_paragraph_corpus",
    "sample_mixture",
    "pii_redaction",
    "text_repetition",
    "multimodal_features",
    "approx_event_stats",
    "url_extraction",
    "strip_markup",
    "doc_chunks",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "ann_topk",
    "ann_ivf_kmeans",
    "ann_ivf_pq",
    "pack_training_sequences",
    "text_bpe_tokens",
    "embedding_quantization",
    "events_sessions",
    "compare_schemas",
    "events_funnel",
    "product_catalog_ann",
    "customer_lookalike",
    "q3_top_orders",
    "q5_region_revenue",
    "q21_waiting_suppliers",
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
    # r7-green overflow — rotate back in r10
    "revenue_pivot_by_priority",
    "order_value_percentiles",
    "top_parts_per_brand",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q10_returned_items",
    "q9_profit_by_nation",
    "silver_dedup_events",
    "gold_customer_metrics",
    "gold_product_performance",
    "currency_convert",
    "users_enriched",
    "profile_column_stats",
    "profile_type_distribution",
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
