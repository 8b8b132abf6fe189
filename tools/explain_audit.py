"""Plan-quality audit: for every registered query, inspect the
executed/optimized plan for the scale invariants SURVEY.md §6 claims:

- parquet scans carry PushedFilters when the query filters a scan col
- no CartesianProduct / BroadcastNestedLoopJoin anywhere
- WholeStageCodegen present (the hot path is compiled)
- report join strategies + exchange count per query

Usage: python tools/explain_audit.py [key ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    import __spark_entry__ as e
    from biglake_iceberg_pipeline_spark.session import get_spark

    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    keys = sys.argv[1:] or list(qs)
    bad = 0
    for key in keys:
        df = qs[key](spark, SF_DIR)
        n_rows = len(df.collect())  # let AQE finalize
        plan = df._jdf.queryExecution().executedPlan().toString()
        exchanges = len(re.findall(r"Exchange (hash|range|Single)", plan))
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        shj = plan.count("ShuffledHashJoin")
        # in executed-plan strings codegen stages show as "*(n)" prefixes
        codegen = "*(" in plan or "WholeStageCodegen" in plan
        cartesian = (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        )
        pushed = len(re.findall(r"PushedFilters: \[[^\]]+\]", plan))
        flags = []
        if cartesian and "ann_" not in key and "cross" not in key:
            # brute-force ANN intentionally crosses with a 1-row literal
            flags.append("CARTESIAN")
        if not codegen and n_rows > 0:
            # empty results legitimately collapse to LocalTableScan
            flags.append("NO-CODEGEN")
        if flags:
            bad += 1
        print(
            f"{key:28s} exch={exchanges:2d} bhj={bhj} smj={smj} shj={shj} "
            f"pushed={pushed} {'!! ' + ','.join(flags) if flags else 'ok'}"
        )
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
