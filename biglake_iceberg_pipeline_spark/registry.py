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

# Round-8 window: the two r7-red connector queries lead (fixed: the
# queries now enable spark.sql.python.filterPushdown.enabled at
# runtime — the driver's vanilla session lacks it), then
# semantic_dedup (re-shaped this round: k scales with the corpus,
# max(4, n // 150) deterministic data-derived centroids — needs a
# fresh row on the new shape), then the eight r5-stale overflow keys.
# The rest is the r6-green set minus ten TPC-H overflow keys (listed
# at the bottom of DEMOTED_KEYS) that wait for r9 — the window holds
# exactly 50.
PRIORITY_KEYS = (
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
)

# The 48 keys green in CORRECTNESS_r07 (their status is on record),
# plus ten r6-green TPC-H keys overflowing to keep the window at
# exactly 50; those ten lead the r9 rotation.
DEMOTED_KEYS = frozenset({
    # r7-green set
    "dedup_exact_substrings",
    "decontaminate_corpus",
    "drop_empty_rows",
    "embedding_stats",
    "ngram_contamination",
    "span_boilerplate",
    "events_json_extract",
    "describe_customer",
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
    "events_windowed",
    "skew_safe_segment_activity",
    "order_value_percentiles",
    "revenue_pivot_by_priority",
    "top_parts_per_brand",
    "orders_with_returns",
    "customers_without_orders",
    "revenue_rollup",
    "small_quantity_revenue",
    "revenue_running_total",
    "tfidf_keywords",
    "text_lm_score",
    "asof_last_purchase",
    "range_join_incidents",
    "events_hypertable_rollup",
    "events_gapfill",
    "events_attribution",
    "product_catalog",
    "q1_pricing_summary",
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
    # r6-green overflow — rotate back in r9
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
