"""Skew-mitigation operators: salted joins and skew-safe distinct
counts.

AQE's skew-join splitting (on in session.py) handles moderately skewed
SORT-MERGE joins at runtime, but it cannot split a hot key finer than
one task per map partition, and it does nothing for the hot-key
build-side of a shuffled hash join. When one key owns a double-digit
percentage of a 100 TB fact table (the classic null-key / default-id /
power-user case), explicit salting is the reliable plan:

- ``salted_join``: spread the skewed side over ``n_salts`` sub-keys
  (deterministic row hash, no RNG), replicate the other side once per
  salt (explode — JVM-side, one narrow stage), join on (key, salt).
  The hot key's rows now land on ``n_salts`` reducers instead of one.
  Cost: other side shuffles n_salts× its size — use when other ≪
  skewed, which is exactly the hot-key dim-join case.
- ``skew_safe_count_distinct``: exact COUNT(DISTINCT x) per key
  without funneling a hot key's values through one reducer: groupBy
  (key, x) first (partial agg collapses duplicates map-side), then
  count per key. Two balanced shuffles instead of one hot one.

Salting changes the physical plan only — results are provably
identical to the unsalted join (tests/test_skew.py asserts equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` to ``other`` on ``on``, spreading each join key
    over ``n_salts`` shuffle sub-keys.

    ``how`` may be ``inner`` or ``left`` (outer semantics preserved:
    an unmatched skewed row appears exactly once because its single
    salt value misses in the replicated side exactly once). ``right``/
    ``full`` would multiply unmatched ``other`` rows per salt — use a
    flipped ``left`` instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # deterministic near-uniform salt from the full row (no RNG: same
    # input → same plan, and identical rows co-locating is harmless)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), n_salts)
    s = skewed.withColumn(_SALT, salt)
    # int salt vs the long row-hash salt: equality coerces, no cast needed
    o = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = [s[c] == o[c] for c in on] + [s[_SALT] == o[_SALT]]
    joined = s.join(o, cond, how)
    drop = [o[c] for c in on] + [s[_SALT], o[_SALT]]
    for c in drop:
        joined = joined.drop(c)
    return joined


def skew_safe_count_distinct(
    df: DataFrame, keys: list[str], col: str, out_name: str = "n_distinct"
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col) as two balanced shuffles.

    A plain ``groupBy(keys).agg(countDistinct(col))`` expands to
    Expand + single aggregation where a hot key's whole value set
    crowds one reducer. Grouping by (keys, col) first dedups with
    map-side partial agg spread across (key, value) — the hot key's
    cardinality is distributed — then the second agg only counts
    already-distinct rows.
    """
    return (
        df.groupBy(*keys, col)
        .agg(F.lit(1).alias("__one"))
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_name))
    )
