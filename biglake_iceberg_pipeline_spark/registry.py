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

# Round-7 window: lakehouse_point_lookup (F35's first driver row,
# reading THROUGH spark.read.format("lakehouse") with pushed-filter
# file skipping) is new this round; the four r4-stale keys
# (drop_empty_rows displaced in r6, plus the r4-green overflow trio)
# lead the window. The rest is the full r5-green set minus five
# overflow keys (listed at the bottom of DEMOTED_KEYS) that wait for
# r8 — the window holds exactly 50.
PRIORITY_KEYS = (
    "lakehouse_point_lookup",
    "dedup_exact_substrings",
    "lakehouse_bloom_lookup",
    "decontaminate_corpus",
    "drop_empty_rows",
    "embedding_stats",
    "ngram_contamination",
    "span_boilerplate",
    "events_json_extract",
    "describe_customer",
)

# The 50 keys the r6 driver window checked (CORRECTNESS_r06 — all
# green: 45 hash-matches + 5 rows-only by design), plus eight r5-green
# keys overflowing to keep the window at exactly 50; those eight
# rotate back in r8.
DEMOTED_KEYS = frozenset({
    # r6-green set
    "address_standardize",
    "ann_ivf_kmeans",
    "ann_ivf_pq",
    "ann_topk",
    "clean_customer",
    "clean_documents",
    "cohort_retention",
    "compare_schemas",
    "customer_lookalike",
    "customer_profiles",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "embedding_quantization",
    "events_funnel",
    "events_sessions",
    "extract_currency",
    "flag_duplicates",
    "gold_daily_sales",
    "gold_orders_enriched",
    "pack_training_sequences",
    "product_catalog_ann",
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
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q3_top_orders",
    "q4_priority_waiting",
    "q5_region_revenue",
    "q8_market_share",
    "quality_approx_duplicates",
    "quality_duplicates",
    "quality_null_like",
    "quality_type_pollution",
    "rfm_segments",
    "safe_type_coercion",
    "semantic_dedup",
    "silver_orders",
    "text_bpe_tokens",
    # r5-green overflow — rotate back in r8
    "sample_mixture",
    "pii_redaction",
    "text_repetition",
    "multimodal_features",
    "approx_event_stats",
    "url_extraction",
    "strip_markup",
    "doc_chunks",
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
