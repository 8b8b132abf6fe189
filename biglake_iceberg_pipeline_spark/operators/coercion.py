"""Safe type-coercion analysis.

Parity: reference datagrunt_agent/sql/ingestion/safe_type_coercion.sql
— analyze string columns, recommend BOOLEAN/BIGINT/DOUBLE only when
every non-null value parses losslessly (and no leading zeros, which
would destroy zip codes).

Spark-first: one aggregation pass over all candidate columns (regex
counts are map-side, codegen'd); no unpivot materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INT_RE = r"^-?[0-9]+$"
FLOAT_RE = r"^-?[0-9]*\.?[0-9]+([eE][+-]?[0-9]+)?$"
LEADING_ZERO_RE = r"^-?0[0-9]+"


def recommend_types(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column_name, recommended_type) for safely castable columns."""
    cols = cols or [c for c, t in df.dtypes if t == "string"]
    aggs = []
    for i, c in enumerate(cols):
        v = F.trim(F.col(c).cast("string"))
        nonblank = F.col(c).isNotNull() & (v != "")
        aggs += [
            F.count(F.when(nonblank, 1)).alias(f"__nn_{i}"),
            F.count(F.when(v.rlike(INT_RE), 1)).alias(f"__int_{i}"),
            F.count(F.when(v.rlike(FLOAT_RE), 1)).alias(f"__flt_{i}"),
            F.count(F.when(F.lower(v).isin("true", "false"), 1)).alias(
                f"__bool_{i}"
            ),
            F.count(F.when(v.rlike(LEADING_ZERO_RE), 1)).alias(f"__lz_{i}"),
        ]
    one = df.agg(*aggs)
    rows = []
    for i, c in enumerate(cols):
        nn, iq, fq, bq, lz = (
            F.col(f"__nn_{i}"),
            F.col(f"__int_{i}"),
            F.col(f"__flt_{i}"),
            F.col(f"__bool_{i}"),
            F.col(f"__lz_{i}"),
        )
        rec = (
            F.when((nn > 0) & (nn == bq), "BOOLEAN")
            .when((nn > 0) & (nn == iq) & (lz == 0), "BIGINT")
            .when((nn > 0) & (nn == fq) & (lz == 0), "DOUBLE")
            .otherwise(F.lit(None))
        )
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"), rec.alias("recommended_type")
            )
        )
    return (
        one.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.*")
        .where(F.col("recommended_type").isNotNull())
    )


def flag_overflow_rows(df: DataFrame, check_cols: list[str]) -> DataFrame:
    """Add is_shifted=true when any check column fails numeric parse
    (reference ingestion/repair_overflow.sql flags rows whose values
    landed in the wrong columns after a delimiter shift)."""
    cond = None
    for c in check_cols:
        bad = F.col(c).isNotNull() & F.trim(
            F.col(c).cast("string")
        ).try_cast("double").isNull()
        cond = bad if cond is None else (cond | bad)
    return df.withColumn("is_shifted", F.coalesce(cond, F.lit(False)))
