"""Medallion-layer building blocks (bronze → silver → gold).

Parity: the reference's silver transformations all share one shape —
ROW_NUMBER() OVER (PARTITION BY key ORDER BY processed_at DESC) = 1
after filtering is_duplicate_in_file
(test_data/thelook_ecommerce/silver/transformations/users.sql:10-19).

Scale notes: dedup_latest is a single shuffle on the dedup key; at
100 TB the key (an id) is high-cardinality and uniform, so no skew.
When the downstream plan joins or aggregates on the same key, the
exchange is reused by Catalyst — dedup is effectively free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep the most recent row per key.

    ``order_col`` descending (the reference orders by processed_at
    DESC); ``tiebreak`` columns make the result deterministic when
    order_col ties — the reference leaves ties unspecified, we don't.
    """
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def flag_duplicates(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Mark all-but-first duplicate rows (reference
    cleaning/flag_duplicates.sql + the agent's is_duplicate_in_file).

    Without an explicit rowid we define "first" by the full key order
    itself: a row is a duplicate when an identical key tuple appears
    more than once, and it is not the one with the lowest monotonic id.
    Single shuffle on the key hash.
    """
    cols = keys or df.columns
    w = Window.partitionBy(*[F.col(c) for c in cols]).orderBy(
        *[F.col(c) for c in cols]
    )
    cnt = F.count(F.lit(1)).over(
        Window.partitionBy(*[F.col(c) for c in cols])
    )
    return df.withColumn(
        "is_duplicate_in_file",
        (cnt > 1) & (F.row_number().over(w) > 1),
    )
