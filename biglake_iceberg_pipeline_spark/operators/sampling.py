"""Deterministic sampling and source-mixture weighting.

A 100 TB training-data pipeline needs sampling that is (a)
reproducible run-to-run and machine-to-machine, (b) independent of
partitioning and row order, and (c) expressible as a pushable filter.
``df.sample()`` fails (a)/(b): it seeds per-partition RNGs, so adding
one input file reshuffles every decision. Hash-gating on a stable key
fails none: a row's fate depends only on its key.

The gate compares a fixed-width prefix of ``md5(key)`` against the
fraction's hex threshold. md5 is bit-identical in every engine (the
DuckDB oracles run the same expression), and the first 8 hex chars
(32 bits) give fraction resolution of 2^-32 — far below any sampling
noise that matters.

Mixture weighting (`mixture_sample`) applies a per-source fraction —
the "20% web, 50% code, 100% books" recipe every LLM data pipeline
runs — as ONE filter expression: no per-source scans, no union, a
single pass that Catalyst pushes to the parquet scan.

Parity anchor: the reference samples via DuckDB ``USING SAMPLE`` in
its profiling templates (sql/common/sample_rows.sql); hash-gating is
the distributed, order-stable equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_CHARS = 8  # 32 bits of md5 → threshold resolution 2^-32
_SPACE = 16**_PREFIX_CHARS


def hash_threshold(fraction: float) -> str:
    """Hex threshold t such that P[md5_prefix < t] = fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = int(round(fraction * _SPACE))
    if n >= _SPACE:
        # 'g' sorts after every hex digit, so every prefix passes —
        # 16^8 itself would format to 9 chars and break the
        # fixed-width lexicographic compare.
        return "g"
    return format(n, f"0{_PREFIX_CHARS}x")


def hash_gate(key: Column, fraction: float) -> Column:
    """Boolean sampling gate: stable per key, pushable, engine-portable."""
    prefix = F.substring(F.md5(key.cast("string").cast("binary")), 1, _PREFIX_CHARS)
    return prefix < F.lit(hash_threshold(fraction))


def sample_by_hash(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, decided by key hash."""
    return df.where(hash_gate(F.col(key_col), fraction))


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic train/valid/test assignment: a ``split`` label
    decided ONLY by md5(salt|key) — stable across runs, machines,
    partitionings AND corpus growth, the property that matters: a
    document keeps its split forever, so yesterday's validation rows
    can never leak into tomorrow's training set when new data
    arrives (df.randomSplit reshuffles on any input change).

    ``splits`` maps label -> fraction in iteration order (must sum to
    1 within hash resolution); boundaries are cumulative hex
    thresholds on the md5 prefix, the hash_gate convention, so the
    whole assignment is ONE no-shuffle CASE expression the oracle
    replays verbatim. ``salt`` re-deals every assignment (new salt =
    a fresh independent split) without touching the data."""
    if splits is None:
        splits = {"train": 0.9, "valid": 0.05, "test": 0.05}
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    key = F.col(key_col).cast("string")
    if salt:
        key = F.concat_ws("|", F.lit(salt), key)
    prefix = F.substring(F.md5(key.cast("binary")), 1, _PREFIX_CHARS)
    names = list(splits)
    expr = F.lit(names[-1])
    cum = 0.0
    cases = []
    for name in names[:-1]:
        cum += splits[name]
        cases.append((hash_threshold(cum), name))
    for threshold, name in reversed(cases):
        expr = F.when(prefix < F.lit(threshold), name).otherwise(expr)
    # a NULL key must label NULL, not silently land in the LAST split
    # (md5(NULL) is NULL, every WHEN is NULL, the otherwise would
    # catch it — contaminating 'test' with an arbitrary
    # subpopulation; /code-review r10). Surfacing NULL lets the
    # caller decide; split == 'test' filters never pick them up.
    expr = F.when(F.col(key_col).isNull(), F.lit(None)).otherwise(expr)
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-source sampling rates as one filter: the mixture recipe.

    Rows whose source is missing from ``fractions`` get
    ``default_fraction``. The decision hash mixes source into the key
    so two sources sharing a key space don't correlate."""
    key = F.concat_ws("|", F.col(source_col), F.col(key_col).cast("string"))
    gate: Column = F.lit(False)
    for src, frac in fractions.items():
        gate = gate | ((F.col(source_col) == src) & hash_gate(key, frac))
    if default_fraction > 0.0:
        known = F.col(source_col).isin(*fractions.keys())
        gate = gate | (~known & hash_gate(key, default_fraction))
    return df.where(gate)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quota: int,
    prefilter_fraction: float | None = None,
) -> DataFrame:
    """At most ``quota`` rows per group, chosen DETERMINISTICALLY by
    md5-hash rank — the per-domain cap every web-scale curation
    pipeline runs (C4 / RefinedWeb "at most N pages per domain"):
    reproducible run-to-run, independent of partitioning and row
    order, engine-portable (the DuckDB oracle replays the same
    expression). Returns the surviving rows plus ``sel_rank``
    (1-based rank within the group).

    Selection = the ``quota`` smallest ``md5(key)`` values per group
    (ties by key). Because the selector is the HASH ORDER, a
    hash-threshold pre-gate composes consistently: every rank-k
    survivor has one of the k smallest hashes, so gating to
    ``hash < t`` first can only drop rows the rank would drop anyway
    — provided at least ``quota`` rows pass the gate.

    Scale shape: ONE hash shuffle on ``group_col`` + a per-group
    window sort. For billion-row groups (the skewed-domain case) the
    sort dominates: pass ``prefilter_fraction`` to hash-gate the
    group down BEFORE ranking (e.g. 1e-3 when quota/n_g ~ 1e-5); the
    selection is unchanged as long as the expected survivor count
    comfortably exceeds ``quota`` — size it with margin, it is a
    performance knob, not a correctness one, and the composition
    property above makes under-gating the only failure mode."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    from pyspark.sql import Window

    key = F.col(key_col).cast("string")
    h = F.md5(key.cast("binary"))
    out = df
    if prefilter_fraction is not None:
        out = out.where(hash_gate(F.col(key_col), prefilter_fraction))
    w = (
        Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    )
    return (
        out.withColumn("sel_rank", F.row_number().over(w))
        .where(F.col("sel_rank") <= F.lit(quota))
    )


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    token_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
) -> DataFrame:
    """Per-source TOKEN budgets — how real pretraining mixtures are
    actually specified ("2B tokens of web, 1B of code", the Llama /
    Pile / Dolma recipe sheet), where per-DOC fractions (G16) or
    per-doc quotas (G34) misallocate whenever document lengths differ
    across sources.

    Within each group, documents line up in deterministic md5-hash
    order (an unbiased, partitioning-independent shuffle — the
    cap_per_group selector) and are kept while they START within the
    budget: a doc survives iff the running token sum BEFORE it is
    strictly below the group's budget. The boundary doc is kept (so a
    budget smaller than the first doc still yields it — "packing
    until full" semantics), every later doc is cut. Returns the
    survivors plus ``cum_tokens`` (running total through the doc).

    Scale shape: ONE hash shuffle on ``group_col`` + a per-group
    window cumsum. For billion-row skewed groups, the cap_per_group
    hash-gate composition applies identically (the order IS the hash
    order) — gate first with a fraction whose expected token mass
    comfortably exceeds the budget."""
    bad = {g: b for g, b in budgets.items() if b < 0}
    if bad or default_budget < 0:
        raise ValueError(f"budgets must be >= 0, got {bad or default_budget}")
    from pyspark.sql import Window

    key = F.col(key_col).cast("string")
    h = F.md5(key.cast("binary"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(h, F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget: Column = F.lit(int(default_budget))
    for src, b in budgets.items():
        budget = F.when(F.col(group_col) == src, F.lit(int(b))).otherwise(
            budget
        )
    cum = F.sum(F.col(token_col)).over(w)
    return (
        df.withColumn("cum_tokens", cum)
        .where(
            (F.col("cum_tokens") - F.col(token_col)) < budget
        )
    )
