"""Per-query isolation harness for the optimization rounds (guide §1).

For each requested query key this:
- times the DataFrame CONSTRUCTION (driver-side plan building — Python
  + analysis cost the bench's per-rep timing also pays),
- times the noop-sink EXECUTION (guide §1.4: computes every column of
  every row, no sink cost, no count()-style column pruning),
- times the bench's own action (.count()) for comparability,
- counts Spark jobs triggered by construction+execution (eager
  operators like localCheckpoint/collect show up here),
- writes .explain("formatted") to --plans-dir/<key>_<tag>.txt.

Usage:
    python tools/profile_queries.py [--sf DIR] [--reps N]
        [--tag before] [--plans-dir plans/r13] [key ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--skip-warmup", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from biglake_iceberg_pipeline_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    keys = args.keys or list(qs)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    results = []
    for key in keys:
        if key not in qs:
            print(f"!! unknown key {key}", file=sys.stderr)
            continue
        fn = qs[key]
        if not args.skip_warmup:
            try:
                sc.setJobDescription(f"warmup:{key}")
                fn(spark, "/root/testdata/sf0.001").collect()
            except Exception as exc:
                print(f"!! warmup {key}: {exc}", file=sys.stderr)
        # plan capture (once, post-warmup so index/artifact caches are hot)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            try:
                df = fn(spark, args.sf)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(
                    os.path.join(args.plans_dir, f"{key}_{args.tag}.txt"), "w"
                ) as fh:
                    fh.write(plan)
            except Exception as exc:
                print(f"!! plan {key}: {exc}", file=sys.stderr)
        best_build = best_noop = best_count = float("inf")
        jobs_used = 0
        for _ in range(args.reps):
            j0 = len(tracker.getJobIdsForGroup() or [])
            t0 = time.perf_counter()
            sc.setJobDescription(f"{key}: build")
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            sc.setJobDescription(f"{key}: noop exec")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best_build = min(best_build, t1 - t0)
            best_noop = min(best_noop, t2 - t1)
            t3 = time.perf_counter()
            sc.setJobDescription(f"{key}: count")
            df2 = fn(spark, args.sf)
            n = df2.count()
            best_count = min(best_count, time.perf_counter() - t3)
            _ = n, j0, jobs_used
        sc.setJobDescription(None)
        results.append(
            (key, round(best_build, 3), round(best_noop, 3), round(best_count, 3))
        )
        print(
            f"{key:32s} build={best_build:7.3f} noop={best_noop:7.3f} "
            f"bench_count={best_count:7.3f}",
            flush=True,
        )
    print("\nkey,build_s,noop_s,bench_count_s")
    for key, b, np_, c in results:
        print(f"{key},{b},{np_},{c}")
    spark.stop()


if __name__ == "__main__":
    main()
