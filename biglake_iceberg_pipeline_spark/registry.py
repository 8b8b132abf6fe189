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

# Round-4 window: re-verify the five HUGEINT-oracle fixes (red in r3,
# fixed in commit e6e15ef) plus the two new product_catalog queries.
PRIORITY_KEYS = (
    "embedding_stats",
    "ngram_contamination",
    "span_boilerplate",
    "events_sessions",
    "events_funnel",
    "product_catalog",
    "product_catalog_ann",
    "customer_lookalike",
)

# Every key the r3 driver window already checked (all green except the
# five PRIORITY re-verifies above) — pushed behind the keys whose last
# driver row is r1/r2, so the 50-key window lands exactly on 8
# priority + 42 stalest. q1_pricing_summary is demoted despite being
# r2-stale to keep the window at 50: it is the entry() flagship, so
# the driver smoke-checks it every round regardless.
DEMOTED_KEYS = frozenset({
    "q1_pricing_summary",
    # r2-green stable-plan queries, demoted to fit this round's new
    # keys (ann_ivf_kmeans, text_bpe_tokens) in the 50-key window;
    # rotate back next round
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q10_returned_items",
    "q9_profit_by_nation",
    "gold_customer_metrics",
    "gold_product_performance",
    "currency_convert",
    "silver_dedup_events",
    "profile_column_stats",
    "profile_type_distribution",
    "users_enriched",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_embedding",
    "ann_topk",
    "ann_ivf",
    "text_lang_id",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "multimodal_features",
    "events_windowed",
    "compare_schemas",
    "describe_customer",
    "events_json_extract",
    "skew_safe_segment_activity",
    "order_value_percentiles",
    "revenue_pivot_by_priority",
    "top_parts_per_brand",
    "orders_with_returns",
    "customers_without_orders",
    "revenue_rollup",
    "small_quantity_revenue",
    "revenue_running_total",
    "approx_event_stats",
    "pii_redaction",
    "text_repetition",
    "sample_mixture",
    "tfidf_keywords",
    "text_lm_score",
    "doc_chunks",
    "strip_markup",
    "url_extraction",
    "asof_last_purchase",
    "range_join_incidents",
    "events_hypertable_rollup",
    "events_gapfill",
    "events_attribution",
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
