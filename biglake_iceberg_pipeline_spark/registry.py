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

# Round-13 window: the five queries added this round (the batch
# change feed through the connector, the connector WAP publish loop,
# the deletion-vector connector read,
# and the two audit-selected ANN probes) plus the four whose registered code changed (the MoR
# overlay planner now ships big position tails by reference —
# lakehouse_mor_read / lakehouse_branch_read re-verify the connector;
# dedup_clusters / dedup_best_quality now read through the
# snapshot-guarded artifact cache) lead, then the twenty-five
# r10-stale keys (the verdict's rotation target: after this round no
# key's latest row is older than r11). The window fills to exactly
# 50 with the stalest r11-green keys in module order; everything
# else (r12-green plus the remaining r11-green) demotes and rotates
# back as the window moves.
PRIORITY_KEYS = (
    "lakehouse_batch_cdf",
    "lakehouse_wap_publish",
    "lakehouse_dv_read",
    "ann_selected",
    "product_catalog_ann_selected",
    "lakehouse_mor_read",
    "lakehouse_branch_read",
    "dedup_clusters",
    "dedup_best_quality",
    "clean_customer",
    "currency_convert",
    "customer_lookalike",
    "dedup_paragraph_corpus",
    "doc_chunks",
    "events_funnel",
    "gold_customer_metrics",
    "gold_daily_sales",
    "gold_product_performance",
    "product_catalog_ann",
    "profile_column_stats",
    "profile_type_distribution",
    "q10_returned_items",
    "q21_waiting_suppliers",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q9_profit_by_nation",
    "silver_dedup_events",
    "silver_orders",
    "source_quota_sample",
    "strip_markup",
    "url_extraction",
    "users_enriched",
)

# Keys green on their latest driver row (r12's full window plus the
# r11-green keys not needed to fill this window); they rotate back
# in later rounds.
DEMOTED_KEYS = frozenset({
    "drop_empty_rows",
    "gold_orders_enriched",
    "ann_ivf_int8",
    "ann_ivf_kmeans",
    "ann_ivf_pq",
    "ann_kmeans_filtered",
    "ann_recall_audit_int8",
    "ann_recall_audit_quantized",
    "ann_topk",
    "approx_event_stats",
    "compare_schemas",
    "customers_without_orders",
    "dedup_embedding",
    "dedup_exact",
    "dedup_incremental",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "describe_customer",
    "embedding_quantization",
    "embedding_stats",
    "events_json_extract",
    "events_sessions",
    "events_windowed",
    "gopher_quality_filter",
    "hash_split",
    "lakehouse_bloom_lookup",
    "lakehouse_point_lookup",
    "multimodal_features",
    "ngram_contamination",
    "order_value_percentiles",
    "orders_with_returns",
    "pack_training_sequences",
    "pii_redaction",
    "product_catalog",
    "profile_date_potential",
    "profile_nulls",
    "profile_number_potential",
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
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q4_priority_waiting",
    "q8_market_share",
    "quality_approx_duplicates",
    "quality_classifier_score",
    "quality_duplicates",
    "quality_null_like",
    "quality_type_pollution",
    "range_join_incidents",
    "revenue_pivot_by_priority",
    "revenue_rollup",
    "revenue_running_total",
    "rfm_segments",
    "safe_type_coercion",
    "sample_mixture",
    "semantic_dedup",
    "skew_safe_segment_activity",
    "small_quantity_revenue",
    "span_boilerplate",
    "text_bpe_tokens",
    "text_fingerprint",
    "text_lang_id",
    "text_lm_score",
    "text_quality",
    "text_repetition",
    "text_tokens",
    "tfidf_keywords",
    "token_budget_mixture",
    "top_parts_per_brand",
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
