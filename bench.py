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


def bench_lakehouse_ops(spark, sf_dir: str, reps: int) -> dict[str, float]:
    """Fixed op set over a generated 8-file orders table — the
    lakehouse/connector hot paths the query set never exercises
    (VERDICT r7 item 5: regressions there were invisible). Each rep
    builds a FRESH table (the ops are stateful), timings are
    best-of-reps per op:

    - lh_append: 8-file repartitioned append (staging + footer stats
      + manifest commit).
    - lh_mor_delete: merge-on-read DELETE of ~1% of rows (position-
      delete file; O(matched), no rewrite).
    - lh_connector_read_tail (r12): the same point lookup THROUGH
      the connector while the MoR delete tail is still
      unmaterialized — times the driver-side overlay planning +
      executor-side masked read (F45), the read path a table lives
      on between a MoR write and its next compaction.
    - lh_dv_rewrite / lh_connector_read_dv (r13, F51): consolidate
      the position tail into deletion vectors (no data rewrite),
      then the same point lookup through the DV-encoded tail.
    - lh_connector_read: point lookup THROUGH
      spark.read.format("lakehouse") with pushed-filter file skipping
      on the delete-materialized table.
    - lh_materialize: targeted delete materialization (rewrites only
      delete-affected files).
    - lh_maintain: compaction + expiry + orphan sweep on the
      fragmented result.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from biglake_iceberg_pipeline_spark.sinks.lakehouse import (
        LakehouseTable,
    )
    from biglake_iceberg_pipeline_spark.streaming.source import (
        LakehouseStreamSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakehouseStreamSource)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders8 = orders.repartition(8, "o_custkey")
    orders8.count()  # materialize the shuffle read path once (warm)
    best: dict[str, float] = {}

    def clock(name: str, fn):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if name not in best or dt < best[name]:
            best[name] = dt

    for rep in range(reps):
        root = tempfile.mkdtemp(prefix="bench_lh_")
        try:
            t = LakehouseTable(os.path.join(root, "t"))
            clock("lh_append", lambda: t.append(orders8))
            clock(
                "lh_mor_delete",
                lambda: t.delete_where(
                    spark,
                    F.col("o_orderkey") % 97 == 0,
                    mode="merge-on-read",
                ),
            )
            key = orders.agg(F.max("o_orderkey")).first()[0]
            clock(
                "lh_connector_read_tail",
                lambda: spark.read.format("lakehouse")
                .option("path", t.path)
                .load()
                .filter(F.col("o_orderkey") == key)
                .collect(),
            )
            clock(
                "lh_batch_cdf",
                # r13 (F48): classified change feed of the whole
                # history (append + MoR delete) as one bounded batch
                lambda: spark.read.format("lakehouse")
                .option("path", t.path)
                .option("readChangeFeed", "true")
                .option("startingSnapshotId", "0")
                .load()
                .count(),
            )
            def _branch_stage():
                # r13 (F49): connector-staged branch write (the WAP
                # write side), then drop the branch so reps are clean
                t.create_branch("bench_wip")
                orders8.limit(10_000).write.format("lakehouse").option(
                    "path", t.path
                ).option("branch", "bench_wip").mode("append").save()
                t.delete_branch("bench_wip")
            clock("lh_branch_stage", _branch_stage)
            clock(
                "lh_materialize", lambda: t.materialize_deletes(spark)
            )
            clock(
                "lh_connector_read",
                lambda: spark.read.format("lakehouse")
                .option("path", t.path)
                .load()
                .filter(F.col("o_orderkey") == key)
                .collect(),
            )
            clock(
                "lh_maintain",
                lambda: t.maintain(
                    spark, max_files=4, keep_snapshots=1
                ),
            )
            # r13 (F51) — LAST, with its own unclocked delete setup,
            # so every pre-existing datapoint keeps measuring exactly
            # what it measured in prior rounds (lh_materialize stays
            # the raw position-tail path, like-for-like)
            t.delete_where(
                spark,
                F.col("o_orderkey") % 89 == 0,
                mode="merge-on-read",
            )
            clock(
                "lh_dv_rewrite",
                # consolidate the position tail into deletion
                # vectors (no data rewrite)
                lambda: t.rewrite_position_deletes(
                    spark, as_dv=True
                ),
            )
            clock(
                "lh_connector_read_dv",
                # the same point lookup through the DV-encoded tail:
                # blob shipped by reference, executor decodes one row
                lambda: spark.read.format("lakehouse")
                .option("path", t.path)
                .load()
                .filter(F.col("o_orderkey") == key)
                .collect(),
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    return {k: round(v, 3) for k, v in best.items()}


# The expensive non-headline tail (VERDICT r9 item 6): the costliest
# registered queries outside HEADLINE. Regressions here used to be
# visible only in ad-hoc cold sweeps; timing them WARM per round makes
# them round-over-round comparable without inflating the headline
# total ("value" stays comparable across rounds).
EXPENSIVE_TAIL = [
    "quality_classifier_score",
    "dedup_clusters",
    "dedup_best_quality",
    "dedup_exact_substrings",
    "semantic_dedup",
]


def bench_expensive_tail(
    spark, qs: dict, sf_dir: str, reps: int
) -> dict[str, float]:
    """Best-of-reps warm timings for the EXPENSIVE_TAIL queries —
    same protocol as the headline loop (sf0.001 warmup first).

    The shared near-dup pair artifact (VERDICT r10 item 5) is timed
    EXPLICITLY as ``dedup_pair_artifact`` with its cache cleared
    first: both cluster consumers ride it afterwards, so without
    this row the candidate+verify build cost would vanish from the
    bench the moment it stopped being re-paid per consumer."""
    out: dict[str, float] = {}
    try:
        from biglake_iceberg_pipeline_spark.plans import llm_ops

        llm_ops.cluster_assignment_artifact(
            spark, "/root/testdata/sf0.001"
        ).count()  # warm codegen
        llm_ops._CLUSTER_ARTIFACT.clear()
        t0 = time.perf_counter()
        llm_ops.cluster_assignment_artifact(spark, sf_dir).count()
        out["dedup_pair_artifact"] = round(
            time.perf_counter() - t0, 3
        )
    except Exception as exc:
        out["dedup_pair_artifact_error"] = str(exc)[:120]  # type: ignore[assignment]
    # the trained quality model (r12): same protocol — the fit cost
    # is timed once from scratch as quality_clf_train; the
    # quality_classifier_score row below then times SCORING with the
    # model artifact warm, the way production pays these costs
    try:
        from biglake_iceberg_pipeline_spark.plans import curation

        curation.trained_quality_model(
            spark, "/root/testdata/sf0.001"
        )  # warm codegen
        curation._CLF_MODEL.clear()
        t0 = time.perf_counter()
        curation.trained_quality_model(spark, sf_dir)
        out["quality_clf_train"] = round(time.perf_counter() - t0, 3)
    except Exception as exc:
        out["quality_clf_train_error"] = str(exc)[:120]  # type: ignore[assignment]
    # the audit-driven tier selection (r13, G44): registration builds
    # BOTH coarse quantizers and runs the recall audit — the cost a
    # production CREATE VECTOR INDEX pays once; timed from scratch
    # here so it stays visible round-over-round
    try:
        from biglake_iceberg_pipeline_spark.plans import llm_ops

        llm_ops._tier_root(spark, "/root/testdata/sf0.001")  # warm
        llm_ops._TIER_ROOTS.clear()
        t0 = time.perf_counter()
        llm_ops._tier_root(spark, sf_dir)
        out["ann_tier_select"] = round(time.perf_counter() - t0, 3)
    except Exception as exc:
        out["ann_tier_select_error"] = str(exc)[:120]  # type: ignore[assignment]
    for key in EXPENSIVE_TAIL:
        if key not in qs:
            continue
        try:
            qs[key](spark, "/root/testdata/sf0.001").collect()
        except Exception:
            pass
        best = float("inf")
        try:
            for _rep in range(reps):
                t0 = time.perf_counter()
                qs[key](spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            out[key] = round(best, 3)
        except Exception as exc:  # never fail the bench over one query
            out[key] = -1.0
            out[f"{key}_error"] = str(exc)[:120]  # type: ignore[assignment]
    return out


def calibration_op(spark, reps: int) -> float:
    """Fixed-cost, data-independent op timed alongside the queries
    (VERDICT r8 item 3): a constant-size in-memory hash aggregation —
    20M generated rows over 997 keys, no I/O, no sf dependence. On a
    quiet host it's a constant; under load it inflates by the same
    host factor as every query, so a driver row where the headline
    total looks regressed but calibration_s also inflated is HOST
    NOISE, not a plan change. Normalize:
    total_normalized ≈ total × (calibration_quiet / calibration_s)
    using the quiet-host calibration pin from SURVEY §6."""
    # warm the op's own codegen stage once (matching the per-query
    # sf0.001 warmup): with reps=1 the first timed rep would absorb
    # JIT cost, inflating calibration_s and DEFLATING normalized
    # totals — a real regression could then pass as host noise
    spark.range(0, 1_000_000, 1, 32).selectExpr(
        "id % 997 AS k", "id AS v"
    ).groupBy("k").sum("v").count()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        n = (
            spark.range(0, 20_000_000, 1, 32)
            .selectExpr("id % 997 AS k", "id AS v")
            .groupBy("k")
            .sum("v")
            .count()
        )
        best = min(best, time.perf_counter() - t0)
        assert n == 997
    return round(best, 3)


def calibration_io_op(spark, reps: int) -> float:
    """Second calibration axis (VERDICT r11 item 6): a fixed parquet
    SCAN+aggregate — 32 duplicate splits of the pinned sf0.001
    lineitem file, summed. The CPU-only ``calibration_op`` measures
    pure in-memory codegen throughput; this one exercises the scan
    path (task scheduling, parquet footer+page decode, page-cache
    reads), so the two axes separate CPU throttling from I/O/
    scheduler contention: scan-bound queries (q1, q6, point lookups)
    normalize against THIS number, shuffle/CPU-bound ones (q9, q18,
    dedup) against calibration_s — the r11 adjudication gap was one
    axis trying to arbitrate both classes. Both pins live in
    SURVEY §6."""
    path = "/root/testdata/sf0.001/lineitem.parquet"
    paths = [path] * 32

    def op():
        return (
            spark.read.parquet(*paths)
            .selectExpr(
                "sum(l_extendedprice) AS s", "count(*) AS c"
            )
            .collect()
        )

    op()  # warm codegen + page cache (matches calibration_op)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        op()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from biglake_iceberg_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_before = os.getloadavg()
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
    calibration = calibration_op(spark, reps)
    try:
        calibration_io = calibration_io_op(spark, reps)
    except Exception as exc:  # never fail the bench over a pin file
        calibration_io = f"error: {str(exc)[:120]}"
    # Per-section calibration stamps (VERDICT r13 item 3): one
    # single-rep re-probe of the SAME fixed op after each section, so
    # a mid-run host throttle is attributable section-by-section
    # instead of invalidating the whole run (r13 lost its entire
    # 32-core comparison to one contended window). Additive output
    # only — calibration_s keeps measuring exactly what it always
    # did (best-of-reps at run start).
    calibration_probes: dict[str, float] = {"start": calibration}
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
    try:
        calibration_probes["post_headline"] = calibration_op(spark, 1)
    except Exception:
        pass
    # second section: lakehouse/connector op latencies (not part of
    # the headline total — "value" stays comparable across rounds)
    try:
        lakehouse_ops = bench_lakehouse_ops(
            spark, sf_dir, min(reps, 2)
        )
    except Exception as exc:  # never fail the query bench over this
        lakehouse_ops = {"error": str(exc)[:200]}
    try:
        calibration_probes["post_lakehouse"] = calibration_op(spark, 1)
    except Exception:
        pass
    # third section: the expensive registered tail, warm (VERDICT r9
    # item 6) — also outside the headline total
    try:
        expensive_tail = bench_expensive_tail(
            spark, qs, sf_dir, min(reps, 2)
        )
    except Exception as exc:
        expensive_tail = {"error": str(exc)[:200]}
    try:
        calibration_probes["end"] = calibration_op(spark, 1)
    except Exception:
        pass
    load_after = os.getloadavg()
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "lakehouse_ops": lakehouse_ops,
                "expensive_tail": expensive_tail,
                # host-state diagnostics (VERDICT r8 item 3): an
                # inflated row is self-diagnosing — high loadavg or
                # an inflated calibration_s means host noise, not a
                # plan regression. Quiet-host calibration pin and the
                # normalization recipe live in SURVEY §6.
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_after": [round(x, 2) for x in load_after],
                "calibration_s": calibration,
                "calibration_io_s": calibration_io,
                # single-rep re-probes bracketing each section (see
                # above): start / post_headline / post_lakehouse / end
                "calibration_probes": calibration_probes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
