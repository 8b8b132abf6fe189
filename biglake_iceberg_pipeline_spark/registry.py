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

# Round-12 window: the three queries added this round (the MoR-tail
# connector read and the two new ANN recall audits) plus the three
# whose registered code changed (ann_ivf_pq now probes the trained-
# coarse IVF-PQ index; dedup_clusters/dedup_best_quality now read
# through the cluster-assignment matview) lead, then the twenty
# r9-stale keys (the verdict's rotation target: after this round no
# key's latest row is older than r10). The window fills to exactly
# 50 with the stalest r10-green keys in module order; everything
# else (r11-green plus the remaining r10-green) demotes and rotates
# back as the window moves.
PRIORITY_KEYS = (
    "lakehouse_mor_read",
    "lakehouse_branch_read",
    "ann_recall_audit_int8",
    "ann_recall_audit_quantized",
    "ann_kmeans_filtered",
    "ann_ivf_pq",
    "dedup_clusters",
    "dedup_best_quality",
    "ann_ivf_int8",
    "customers_without_orders",
    "dedup_embedding",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "describe_customer",
    "embedding_stats",
    "events_json_extract",
    "events_windowed",
    "orders_with_returns",
    "q22_idle_customers",
    "quality_classifier_score",
    "revenue_rollup",
    "revenue_running_total",
    "skew_safe_segment_activity",
    "small_quantity_revenue",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_tokens",
)

# Keys green on their latest driver row (r11's full window plus the
# r10-green keys not needed to fill this window); they rotate back
# in later rounds.
DEMOTED_KEYS = frozenset({
    "dedup_paragraph_corpus",
    "source_quota_sample",
    "address_standardize",
    "ann_ivf",
    "ann_ivf_filtered",
    "ann_recall_audit",
    "asof_last_purchase",
    "ccnet_ppl_buckets",
    "clean_customer",
    "clean_documents",
    "cohort_retention",
    "currency_convert",
    "customer_lookalike",
    "customer_profiles",
    "decontaminate_corpus",
    "dedup_exact_substrings",
    "doc_chunks",
    "drop_empty_rows",
    "events_attribution",
    "events_funnel",
    "events_gapfill",
    "events_hypertable_rollup",
    "extract_currency",
    "flag_duplicates",
    "gold_customer_metrics",
    "gold_daily_sales",
    "gold_orders_enriched",
    "gold_product_performance",
    "multimodal_features",
    "ngram_contamination",
    "product_catalog",
    "product_catalog_ann",
    "profile_column_stats",
    "profile_date_potential",
    "profile_nulls",
    "profile_number_potential",
    "profile_type_distribution",
    "q10_returned_items",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_order_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q1_pricing_summary",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q3_top_orders",
    "q4_priority_waiting",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation",
    "quality_approx_duplicates",
    "quality_duplicates",
    "quality_null_like",
    "quality_type_pollution",
    "range_join_incidents",
    "rfm_segments",
    "safe_type_coercion",
    "silver_dedup_events",
    "silver_orders",
    "span_boilerplate",
    "strip_markup",
    "text_lm_score",
    "tfidf_keywords",
    "token_budget_mixture",
    "url_extraction",
    "users_enriched",
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
