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

# Round-10 window: new r10 queries and the two whose registered code
# changed this round (semantic_dedup's capped centroid collect,
# multimodal_features' real PNG decode) lead, then the fourteen
# r7-stale keys (the verdict's rotation target: after this round no
# key's latest row is older than r8). The rest of the window fills
# with r8-green keys in module order; the 50 r9-green keys demote,
# plus the sixteen r8-green overflow keys so the window holds
# exactly 50 (they rotate back in r11).
PRIORITY_KEYS = (
    # new in r10
    "gopher_quality_filter",
    "hash_split",
    # registered code changed in r10 — need fresh rows
    "semantic_dedup",
    "multimodal_features",
    # r7-stale — rows most urgently needed
    "currency_convert",
    "gold_customer_metrics",
    "gold_product_performance",
    "order_value_percentiles",
    "profile_column_stats",
    "profile_type_distribution",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q9_profit_by_nation",
    "q10_returned_items",
    "revenue_pivot_by_priority",
    "silver_dedup_events",
    "top_parts_per_brand",
    "users_enriched",
)

# The 50 keys green in CORRECTNESS_r09 (their status is on record)
# plus sixteen r8-green keys keeping the window at exactly 50; the
# other 32 r8-green keys fill the r10 window after the priorities.
DEMOTED_KEYS = frozenset({
    # r9-green set
    "quality_classifier_score",
    "ccnet_ppl_buckets",
    "token_budget_mixture",
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
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_embedding",
    "ann_ivf",
    "ann_ivf_int8",
    "text_lang_id",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "embedding_stats",
    "events_windowed",
    "describe_customer",
    "events_json_extract",
    "skew_safe_segment_activity",
    "orders_with_returns",
    "customers_without_orders",
    "revenue_rollup",
    "small_quantity_revenue",
    "revenue_running_total",
    "tfidf_keywords",
    "text_lm_score",
    "ngram_contamination",
    "span_boilerplate",
    "dedup_exact_substrings",
    "decontaminate_corpus",
    "asof_last_purchase",
    "range_join_incidents",
    "events_hypertable_rollup",
    "events_gapfill",
    "events_attribution",
    "product_catalog",
    "q1_pricing_summary",
    "drop_empty_rows",
    # r8-green overflow — rotate back in r11
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
