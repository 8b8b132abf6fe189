"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: scan-agg, selective join, multiway join + the heaviest
# LLM-pipeline operators once implemented.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q9_profit_by_nation",
    "q12_priority_shipping",
    "q21_waiting_suppliers",
    "gold_customer_metrics",
    "gold_daily_sales",
    "gold_product_performance",
    "dedup_minhash",
    "ann_topk",
    "text_quality",
    "tfidf_keywords",
    "text_lm_score",
    "events_sessions",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from biglake_iceberg_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    keys = [k for k in HEADLINE if k in qs]

    # warmup: JVM/codegen spin-up on the smallest SF so per-query timings
    # measure the plan, not first-call overhead. Warm every headline
    # query — each compiles distinct codegen stages (hash fns, window,
    # session logic) whose JIT otherwise lands in its sf0.1 timing.
    for key in keys:
        try:
            qs[key](spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass

    # Variance control: container timings are load-sensitive (the same
    # q1 plan measured 0.23s-1.08s across one day on this host), so
    # take the best of N reps per query — min is the right estimator
    # for "plan cost" because noise (GC, CPU contention) only ever
    # adds time.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    for key in keys:
        best = float("inf")
        for _rep in range(reps):
            t0 = time.perf_counter()
            df = qs[key](spark, sf_dir)
            n = df.count() if hasattr(df, "count") else len(df)
            best = min(best, time.perf_counter() - t0)
            _ = n
        timings[key] = round(best, 3)
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
