"""Plan-shape regression guards: the §6 scale invariants asserted on
executed plans for flagship queries, so a refactor that silently
introduces a cartesian product, drops a broadcast, or loses pushdown
fails CI — not just the (manually run) explain audit."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry


def _executed_plan(spark, key, sf_dir):
    df = entry.queries()[key](spark, sf_dir)
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


FLAGSHIPS = {
    # key: (min broadcast joins, pushed-filter scans required)
    "q5_region_revenue": (2, True),
    "q9_profit_by_nation": (3, True),
    "gold_orders_enriched": (2, False),
    "tfidf_keywords": (1, False),
    "asof_last_purchase": (0, True),
    "dedup_minhash": (0, False),
}


def test_no_rdd_access_in_operators():
    """No operator may touch ``.rdd`` — a DataFrame→RDD conversion
    materializes the whole plan as an RDD on the driver (and loses
    Catalyst/Tungsten downstream). Partition-count probes use
    inputFiles() / defaultParallelism instead."""
    import ast
    import os

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "biglake_iceberg_pipeline_spark",
    )
    offenders = []
    for root, _dirs, names in os.walk(pkg):
        for name in names:
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            with open(path) as f:
                tree = ast.parse(f.read(), filename=path)
            for node in ast.walk(tree):
                if isinstance(node, ast.Attribute) and node.attr == "rdd":
                    offenders.append(f"{path}:{node.lineno}")
    assert not offenders, "\n".join(offenders)


def test_gold_customer_metrics_plan_shape(spark, sf_dir):
    """Pin the r5 A/B decision (VERDICT r4 item 3): the returns side
    pre-aggregates lineitem at l_orderkey grain WITH a map-side
    partial combine before any join — the probe side of the big-big
    join is |orders|, not |lineitem|. A refactor that silently reverts
    to joining raw lineitem rows changes this plan, failing here
    instead of resurfacing as driver-bench drift."""
    plan = _executed_plan(spark, "gold_customer_metrics", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # dims broadcast at this scale; facts never sort-merge
    assert "SortMergeJoin" not in plan
    # the grain trick: partially-combined count at l_orderkey BEFORE
    # the orders join
    assert re.search(
        r"HashAggregate\(keys=\[l_orderkey#\d+L?\], "
        r"functions=\[partial_count",
        plan,
    ), plan
    # and the final rollup still lands on the customer key
    assert re.search(r"HashAggregate\(keys=\[o_custkey#\d+L?\]", plan)


@pytest.mark.parametrize("key", sorted(FLAGSHIPS))
def test_flagship_plan_invariants(spark, sf_dir, key):
    min_bhj, needs_pushdown = FLAGSHIPS[key]
    plan = _executed_plan(spark, key, sf_dir)
    assert "CartesianProduct" not in plan, key
    assert "BroadcastNestedLoopJoin" not in plan, key
    assert plan.count("BroadcastHashJoin") >= min_bhj, key
    # facts must not sort-merge against dims at this scale
    assert "SortMergeJoin" not in plan, key
    if needs_pushdown:
        assert re.search(r"PushedFilters: \[[^\]]+\]", plan), key
    # hot path is compiled
    assert "*(" in plan or "WholeStageCodegen" in plan, key
