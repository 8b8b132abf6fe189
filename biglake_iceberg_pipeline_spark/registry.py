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

# Round-6 window: ann_ivf_pq (G29's driver row) and
# pack_training_sequences (G30) are new this round. The rest of the
# window is the stalest set: ann_topk + compare_schemas (last driver
# row r3) and 46 of the 49 r4-green keys (the three listed at the
# bottom of DEMOTED_KEYS wait for r7 — the window holds exactly 50).
PRIORITY_KEYS = (
    "ann_ivf_pq",
    "pack_training_sequences",
    "semantic_dedup",
    "ann_topk",
    "compare_schemas",
)

# The 50 keys the r5 driver window checked (CORRECTNESS_r05 — all
# green: 48 hash-matches + 2 rows-only by design), plus three
# r4-green keys (embedding_stats, ngram_contamination,
# span_boilerplate) to keep the window at exactly 50; those three
# rotate back in r7.
DEMOTED_KEYS = frozenset({
    # r5-green set
    "product_catalog",
    "ann_ivf_int8",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_embedding",
    "ann_ivf",
    "text_lang_id",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "multimodal_features",
    "events_windowed",
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
    # r4-green overflow — rotate back in r7
    "embedding_stats",
    "ngram_contamination",
    "span_boilerplate",
    # displaced when semantic_dedup entered the r6 window — r7
    "drop_empty_rows",
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
