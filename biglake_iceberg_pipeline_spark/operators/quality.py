"""Data-quality checks.

Parity: reference datagrunt_agent/sql/quality/*.sql
(duplicate_detection, approximate_duplicates, type_pollution,
null_like_values).

Scale: each check is one shuffle (groupBy on the checked key / one
global agg). duplicate_detection's top-50 uses a full deterministic
tie-break ordering so results are stable across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.cleaning import NULL_SENTINELS


def duplicate_detection(
    df: DataFrame, cols: list[str] | None = None, limit: int = 50
) -> DataFrame:
    """Key groups appearing more than once, largest first
    (quality/duplicate_detection.sql)."""
    cols = cols or df.columns
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("duplicate_count"))
        .where(F.col("duplicate_count") > 1)
        .orderBy(F.desc("duplicate_count"), *cols)
        .limit(limit)
    )


def approximate_duplicates(df: DataFrame) -> DataFrame:
    """Whole-row duplicate estimate: rows − distinct row-hashes
    (quality/approximate_duplicates.sql). One global aggregation; the
    md5 is computed map-side so only hashes shuffle."""
    h = F.md5(
        F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in df.columns]
        )
    )
    return df.select(h.alias("__h")).agg(
        (F.count(F.lit(1)) - F.countDistinct("__h")).alias(
            "approximate_duplicates"
        )
    )


def type_pollution(df: DataFrame, col: str, limit: int = 10) -> DataFrame:
    """Non-numeric values polluting a supposedly-numeric column
    (quality/type_pollution.sql)."""
    c = F.col(col)
    return (
        df.where(c.try_cast("double").isNull() & c.isNotNull())
        .groupBy(c.alias("value"))
        .agg(F.count(F.lit(1)).alias("occurrence_count"))
        .orderBy(F.desc("occurrence_count"), "value")
        .limit(limit)
    )


def null_like_values(df: DataFrame, col: str) -> DataFrame:
    """Sentinel strings that should be NULL
    (quality/null_like_values.sql)."""
    c = F.col(col)
    return (
        df.where(F.lower(F.trim(c.cast("string"))).isin(*NULL_SENTINELS))
        .groupBy(c.alias("value"))
        .agg(F.count(F.lit(1)).alias("occurrence_count"))
        .orderBy(F.desc("occurrence_count"), "value")
    )
