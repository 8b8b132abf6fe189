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

# Round-11 window: the new filtered-ANN query and the four queries
# whose registered code changed this round (shared pair artifact for
# dedup_clusters/dedup_best_quality, include_cols on ann_ivf's index,
# PNG Adam7/16-bit under multimodal_features) lead, then the sixteen
# r8-stale keys (the verdict's rotation target: after this round no
# key's latest row is older than r9). The rest of the window fills
# with r9-green keys in module order; the 48 remaining r10-green keys
# demote, plus nineteen r9-green overflow keys keeping the window at
# exactly 50 (they rotate back in r12).
PRIORITY_KEYS = (
    "ann_ivf_filtered",
    "ann_recall_audit",
    "dedup_clusters",
    "dedup_best_quality",
    "ann_ivf",
    "multimodal_features",
    "address_standardize",
    "clean_documents",
    "cohort_retention",
    "customer_profiles",
    "extract_currency",
    "flag_duplicates",
    "gold_orders_enriched",
    "profile_date_potential",
    "profile_nulls",
    "profile_number_potential",
    "quality_approx_duplicates",
    "quality_duplicates",
    "quality_null_like",
    "quality_type_pollution",
    "rfm_segments",
    "safe_type_coercion",
)

# The 48 keys green in CORRECTNESS_r10 not re-promoted above, plus
# nineteen r9-green overflow keys (window stays exactly 50; the other
# r9-green keys fill the r11 window after the priorities).
DEMOTED_KEYS = frozenset({
    # r10-green set (minus the four promoted back for code changes)
    "gopher_quality_filter",
    "hash_split",
    "semantic_dedup",
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
    "approx_event_stats",
    "lakehouse_point_lookup",
    "lakehouse_bloom_lookup",
    "pii_redaction",
    "text_repetition",
    "sample_mixture",
    "source_quota_sample",
    "dedup_paragraph_corpus",
    "doc_chunks",
    "strip_markup",
    "url_extraction",
    "events_funnel",
    "product_catalog_ann",
    "customer_lookalike",
    "q3_top_orders",
    "q5_region_revenue",
    "q21_waiting_suppliers",
    "silver_orders",
    "clean_customer",
    "gold_daily_sales",
    # r9-green overflow — rotate back in r12
    "dedup_incremental",
    "q22_idle_customers",
    "dedup_ngram_jaccard",
    "dedup_embedding",
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
    "quality_classifier_score",
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
