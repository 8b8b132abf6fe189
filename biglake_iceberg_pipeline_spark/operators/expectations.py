"""Declarative data-quality expectations (DLT-style gates).

Parity: the reference's quality family (sql/quality/*) REPORTS issues;
production medallion pipelines also need to ACT on them at write time
— expectations attached to a frame that warn, drop, or fail the batch.
Same model as Delta Live Tables' ``expect / expect_or_drop /
expect_or_fail``, expressed engine-agnostically.

Plan shape: ONE aggregate pass computes every rule's violation count
(conditional counts fold map-side); the drop path is a single
conjunctive filter that pushes down like any predicate. Rules are
plain Column expressions, so Catalyst sees through them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExpectationsFailed(ValueError):
    def __init__(self, metrics: dict[str, int]):
        self.metrics = metrics
        failing = {k: v for k, v in metrics.items() if v > 0}
        super().__init__(f"expectations violated: {failing}")


def check(
    df: DataFrame,
    rules: dict[str, Column],
    on_violation: str = "drop",
) -> tuple[DataFrame, dict[str, int]]:
    """Apply expectations; returns (gated_df, violation_counts).

    ``rules`` maps rule name → a Column that is TRUE for GOOD rows.
    ``on_violation``:
      - 'warn': pass every row through, report counts
      - 'drop': keep only rows satisfying ALL rules (single pushable
        conjunctive filter)
      - 'fail': raise ExpectationsFailed if any rule has violations

    The metrics come from one aggregate job over the input — no
    per-rule scans.
    """
    if on_violation not in ("warn", "drop", "fail"):
        raise ValueError(f"unknown on_violation {on_violation!r}")
    counts = df.agg(
        *[
            F.count(F.when(~cond, 1)).alias(name)
            for name, cond in rules.items()
        ]
    ).collect()[0]
    metrics = {name: int(counts[name]) for name in rules}
    if on_violation == "fail" and any(v > 0 for v in metrics.values()):
        raise ExpectationsFailed(metrics)
    if on_violation == "drop":
        keep = F.lit(True)
        for cond in rules.values():
            keep = keep & cond
        return df.where(keep), metrics
    return df, metrics
