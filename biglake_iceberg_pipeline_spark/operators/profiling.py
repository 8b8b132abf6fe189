"""Column profiling operators.

Parity: reference datagrunt_agent/sql/profiling/*.sql (column_stats,
null_analysis, type_distribution, date_potential, number_potential).

Design: every profiler runs as ONE distributed aggregation over the
input (a single job, map-side partial aggs), then reshapes the 1-row
result with ``stack`` — never a per-column job, never a driver loop
over ``.collect()``. At 100 TB profiling N columns costs one scan.

Divergence note: the reference's column_stats uses DuckDB SUMMARIZE's
``approx_unique``; we report an exact distinct count (needed for the
cross-engine oracle). On a cluster swap in ``approx_count_distinct``
for the same single-pass cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, T.NumericType)


def null_analysis(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column null counts/percentages (profiling/null_analysis.sql)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.count(F.col(c)).alias(f"__nn_{i}") for i, c in enumerate(cols)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{i}" for i, c in enumerate(cols)
    )
    return one.selectExpr(
        "__total", f"stack({len(cols)}, {stack_args}) AS (column_name, non_null_count)"
    ).select(
        "column_name",
        F.col("__total").alias("total_rows"),
        "non_null_count",
        (F.col("__total") - F.col("non_null_count")).alias("null_count"),
        F.round(
            (F.col("__total") - F.col("non_null_count"))
            * 100.0
            / F.col("__total"),
            2,
        ).alias("null_percentage"),
    )


def column_stats(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column stats table (profiling/column_stats.sql / SUMMARIZE).

    Numeric min/max/avg land in numeric columns; string min/max in
    string columns — so no engine-specific float formatting leaks into
    the output.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__total")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__du_{i}"))
        if _is_numeric(fields[c]):
            aggs.append(F.round(F.min(c).cast("double"), 4).alias(f"__mn_{i}"))
            aggs.append(F.round(F.max(c).cast("double"), 4).alias(f"__mx_{i}"))
            aggs.append(F.round(F.avg(F.col(c).cast("double")), 4).alias(f"__av_{i}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__smn_{i}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__smx_{i}"))
    one = df.agg(*aggs)
    rows = []
    for i, c in enumerate(cols):
        numeric = _is_numeric(fields[c])
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(dtypes[c]).alias("column_type"),
                F.col(f"__du_{i}").alias("distinct_count"),
                F.round(
                    (F.col("__total") - F.col(f"__nn_{i}"))
                    * 100.0
                    / F.col("__total"),
                    2,
                ).alias("null_percentage"),
                (F.col(f"__mn_{i}") if numeric else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__mx_{i}") if numeric else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"__av_{i}") if numeric else F.lit(None).cast("double")).alias("avg_num"),
                (F.lit(None).cast("string") if numeric else F.col(f"__smn_{i}")).alias("min_str"),
                (F.lit(None).cast("string") if numeric else F.col(f"__smx_{i}")).alias("max_str"),
            )
        )
    return one.select(
        F.explode(F.array(*rows)).alias("s")
    ).select("s.*")


def type_distribution(df: DataFrame, col: str) -> DataFrame:
    """Classify a string column's values by shape
    (profiling/type_distribution.sql — there `typeof` over DuckDB's
    union-typed CSV columns; here a deterministic regex classifier,
    which is what the agent needs the answer for).
    """
    c = F.trim(F.col(col))
    detected = (
        F.when(c.isNull(), None)
        .when(c.rlike(r"^-?[0-9]+$"), "integer")
        .when(c.rlike(r"^-?[0-9]*\.[0-9]+([eE][+-]?[0-9]+)?$"), "float")
        .when(F.lower(c).isin("true", "false"), "boolean")
        .otherwise("varchar")
    )
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(detected.alias("detected_type"))
        .agg(F.count(F.lit(1)).alias("row_count"))
    )
    total = F.sum("row_count").over(Window.partitionBy())
    return counts.select(
        "detected_type",
        "row_count",
        F.round(F.col("row_count") * 100.0 / total, 2).alias("percentage"),
    )


def date_potential(df: DataFrame, col: str) -> DataFrame:
    """Count values parseable as dates (profiling/date_potential.sql:
    ISO cast OR m/d/Y strptime)."""
    c = F.trim(F.col(col).cast("string"))
    parseable = (
        F.try_to_timestamp(c).isNotNull()
        | F.try_to_timestamp(c, F.lit("MM/dd/yyyy")).isNotNull()
    )
    return df.agg(
        F.count(F.when(parseable, 1)).alias("date_parseable_count")
    )


def number_potential(df: DataFrame, col: str) -> DataFrame:
    """Count values numeric after stripping $ % , formatting
    (profiling/number_potential.sql)."""
    c = F.regexp_replace(
        F.col(col).cast("string"), r"[\$%,]", ""
    )
    parseable = c.try_cast("double").isNotNull() & F.col(col).isNotNull()
    return df.agg(
        F.count(F.when(parseable, 1)).alias("number_parseable_count")
    )
