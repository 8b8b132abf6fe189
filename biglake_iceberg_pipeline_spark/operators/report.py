"""Structured quality-report builder.

Parity: the reference agent's report tool
(services/data-cleaning-agent/datagrunt_agent/tools/report.py) emits a
self-contained JSON document — report id, per-column schema snapshot
(type, null count/rate, approx uniques, min/max/avg), structured
findings with severities, and an overall pass/warn/fail rolled up from
severity counts (any critical → fail, any warning → warn).

Spark-first shape: the whole schema snapshot is ONE aggregation pass
(no per-column jobs — every null count, NDV sketch, and min/max
merges map-side in a single stage), findings add one small job each,
and the result is a plain dict ready for JSON/Pub-Sub persistence.
The report is metadata-sized regardless of table size, so driver-side
assembly is correct here — this is the one place collect() belongs.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from biglake_iceberg_pipeline_spark.operators.cleaning import NULL_SENTINELS

REPORT_SCHEMA_VERSION = "1.0.0"

# finding severity thresholds (mirroring the reference's defaults:
# criticals fail the table, warnings flag it)
NULL_RATE_WARN = 0.5
NULL_RATE_CRITICAL = 0.95
DUP_ROW_WARN = 0.01


def _overall_status(severities: list[str]) -> tuple[str, str | None]:
    crit = severities.count("critical")
    warn = severities.count("warning")
    if crit:
        return "fail", f"{crit} critical finding(s)"
    if warn:
        return "warn", f"{warn} warning finding(s)"
    return "pass", None


def quality_report(df: DataFrame, table_name: str = "") -> dict[str, Any]:
    """Build the reference-shaped quality report for a DataFrame."""
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.NumericType)
    }
    stringy = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType)
    }
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in df.columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}"))
        aggs.append(F.approx_count_distinct(c).alias(f"__u_{c}"))
        if c in numeric:
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
            aggs.append(F.avg(c).alias(f"__avg_{c}"))
        if c in stringy:
            aggs.append(
                F.sum(
                    F.lower(F.trim(c)).isin(*NULL_SENTINELS).cast("long")
                ).alias(f"__s_{c}")
            )
    row = df.agg(*aggs).head().asDict()
    total = row["__rows"]

    schema_snapshot = []
    findings: list[dict[str, Any]] = []
    for c, dtype in df.dtypes:
        nulls = row[f"__n_{c}"]
        rate = round(nulls / total, 4) if total else 0.0
        schema_snapshot.append(
            {
                "column_name": c,
                "column_type": dtype,
                "null_count": nulls,
                "null_rate": rate,
                "approx_unique": row[f"__u_{c}"],
                "min": row.get(f"__min_{c}"),
                "max": row.get(f"__max_{c}"),
                "avg": row.get(f"__avg_{c}"),
            }
        )
        if total and rate >= NULL_RATE_CRITICAL:
            findings.append(
                {
                    "kind": "null_rate",
                    "column": c,
                    "severity": "critical",
                    "detail": f"{rate:.0%} null",
                }
            )
        elif total and rate >= NULL_RATE_WARN:
            findings.append(
                {
                    "kind": "null_rate",
                    "column": c,
                    "severity": "warning",
                    "detail": f"{rate:.0%} null",
                }
            )
        sentinels = row.get(f"__s_{c}", 0)
        if sentinels:
            findings.append(
                {
                    "kind": "null_like_values",
                    "column": c,
                    "severity": "warning",
                    "detail": f"{sentinels} sentinel value(s)",
                }
            )

    # full-row duplicates: count − distinct over all columns (the
    # reference's approximate_duplicates check), one extra job
    dup_rows = total - df.distinct().count()
    if total and dup_rows / total >= DUP_ROW_WARN:
        findings.append(
            {
                "kind": "duplicate_rows",
                "column": None,
                "severity": "warning",
                "detail": f"{dup_rows} duplicate row(s)",
            }
        )

    status, reason = _overall_status([f["severity"] for f in findings])
    return {
        "report_id": f"dqr_{uuid.uuid4().hex[:12]}",
        "schema_version": REPORT_SCHEMA_VERSION,
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "table_name": table_name,
        "row_count": total,
        "schema": schema_snapshot,
        "findings": findings,
        "severity_counts": {
            s: [f["severity"] for f in findings].count(s)
            for s in ("critical", "warning")
        },
        "overall_status": status,
        "status_reason": reason,
    }


def cleaning_report(
    before: DataFrame,
    after: DataFrame,
    operations: list[str],
    table_name: str = "",
) -> dict[str, Any]:
    """Before/after cleaning summary (reference
    tools/cleaning_report.py): row delta, per-column null deltas, and
    the operation list that produced the change. Two single-pass
    aggregations (one per side) — metadata-sized output."""

    def _null_counts(df: DataFrame) -> tuple[int, dict[str, int]]:
        aggs = [F.count(F.lit(1)).alias("__rows")] + [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__n_{c}")
            for c in df.columns
        ]
        row = df.agg(*aggs).head().asDict()
        return row["__rows"], {c: row[f"__n_{c}"] for c in df.columns}

    b_rows, b_nulls = _null_counts(before)
    a_rows, a_nulls = _null_counts(after)
    shared = [c for c in after.columns if c in b_nulls]
    return {
        "report_id": f"dcr_{uuid.uuid4().hex[:12]}",
        "schema_version": REPORT_SCHEMA_VERSION,
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "table_name": table_name,
        "operations": list(operations),
        "summary": {
            "before_rows": b_rows,
            "after_rows": a_rows,
            "rows_removed": b_rows - a_rows,
            "columns_added": [c for c in after.columns if c not in b_nulls],
            "columns_removed": [c for c in before.columns if c not in a_nulls],
        },
        "null_deltas": {
            c: {"before": b_nulls[c], "after": a_nulls[c]}
            for c in shared
            if b_nulls[c] != a_nulls[c]
        },
    }
