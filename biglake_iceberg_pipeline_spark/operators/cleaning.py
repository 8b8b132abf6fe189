"""Column-cleaning operators.

Parity targets (reference data-cleaning agent,
services/data-cleaning-agent/datagrunt_agent/sql/cleaning/*.sql and
core/column_normalizer.py): trim, null-sentinel normalization, case
normalization, empty-string normalization, unknown-char removal,
duplicate flagging, currency-symbol extraction, snake_case column
names, processed_at stamping.

All operators are expression-level (Catalyst, codegen'd) — the hot
path never leaves the JVM, so they cost one projection regardless of
data size. Applied before a shuffle they also shrink shuffle bytes
(trimmed/nulled strings compress better).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference sentinel list: sql/quality/null_like_values.sql and the
# silver transformations' CASE WHEN ... IN (...) guards.
NULL_SENTINELS = ("null", "none", "n/a", "na", "-", "--", "", "#n/a", "nan", "missing")

# Currency symbols the agent extracts into `{col}_value_type`
# companions (DEMO.md §1 step 4, §4).
CURRENCY_SYMBOLS = {
    "$": "dollars",
    "€": "euros",
    "EUR": "euros",
    "£": "pounds",
    "¥": "yen",
}


def trim_whitespace(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(c)


def null_sentinels_to_null(col: Column | str) -> Column:
    """Sentinel strings ('N/A', 'none', '-', ...) → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(F.trim(c))
    return F.when(lowered.isin(*NULL_SENTINELS), F.lit(None)).otherwise(c)


def clean_string(col: Column | str, case: str | None = None) -> Column:
    """trim → sentinel-null → optional case normalization.

    ``case``: None | 'lower' | 'upper' | 'title' (INITCAP).
    Composite of the reference's trim_whitespace + normalize_null_like +
    normalize_case templates, applied in the same order the agent does.
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    c = F.when(F.lower(c).isin(*NULL_SENTINELS), F.lit(None)).otherwise(c)
    if case == "lower":
        c = F.lower(c)
    elif case == "upper":
        c = F.upper(c)
    elif case == "title":
        c = F.initcap(F.lower(c))
    return c


def normalize_empty_strings(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)


def replace_unknown_chars(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit("�"), F.lit(""))


def extract_currency(df: DataFrame, col: str) -> DataFrame:
    """Split '$12.34' / 'EUR 99' style values into a numeric column and
    a `{col}_value_type` companion (DEMO.md §4 story arc).

    Pure regexp expressions — one projection, no UDF.
    """
    raw = F.trim(F.col(col))
    sym = F.regexp_extract(raw, r"^(\$|€|£|¥|EUR)\s*", 1)
    value_type = (
        F.when(sym == "$", "dollars")
        .when(sym == "€", "euros")
        .when(sym == "EUR", "euros")
        .when(sym == "£", "pounds")
        .when(sym == "¥", "yen")
        .otherwise(F.lit(None))
    )
    numeric = F.try_to_number(
        F.regexp_replace(raw, r"^(\$|€|£|¥|EUR)\s*|,", ""),
        F.lit("999999999999.99"),
    ).cast("double")
    return df.withColumn(f"{col}_value_type", value_type).withColumn(
        f"{col}_clean", numeric
    )


def snake_case(name: str) -> str:
    """Column-name normalization (reference core/column_normalizer.py):
    'Order ID' → 'order_id', 'firstName' → 'first_name'."""
    s = re.sub(r"[^\w]+", "_", name.strip())
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
    s = re.sub(r"_+", "_", s).strip("_").lower()
    return s or "col"


def normalize_column_names(df: DataFrame) -> DataFrame:
    seen: dict[str, int] = {}
    out = []
    for c in df.columns:
        base = snake_case(c)
        n = seen.get(base, 0)
        seen[base] = n + 1
        out.append(f"{base}_{n}" if n else base)
    return df.toDF(*out)


def add_processed_at(df: DataFrame) -> DataFrame:
    """Stamp ingestion time (reference ingestion/add_processed_at.sql).
    current_timestamp() is plan-constant: evaluated once per query, not
    per row, so rows in one batch share one stamp — same semantics as
    the reference's single UPDATE."""
    return df.withColumn("processed_at", F.current_timestamp())


def sample_rows(df: DataFrame, n: int = 10) -> DataFrame:
    """First-n preview (reference common/sample_rows.sql). limit()
    short-circuits the scan — Spark stops after one partition when it
    has n rows, so previewing a 100 TB table reads one file."""
    return df.limit(n)


def get_processed_at(df: DataFrame):
    """The batch's ingestion stamp (reference
    ingestion/get_processed_at.sql): one value, since add_processed_at
    stamps a batch uniformly. Returns None on an empty frame."""
    row = df.select("processed_at").limit(1).collect()
    return row[0][0] if row else None


def drop_empty_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Drop rows where every (string) column is NULL or blank
    (reference ingestion/delete_empty_rows.sql)."""
    cols = subset or df.columns
    any_filled = None
    for c in cols:
        filled = F.col(c).isNotNull() & (
            F.trim(F.col(c).cast("string")) != ""
        )
        any_filled = filled if any_filled is None else (any_filled | filled)
    return df.where(any_filled)


def cast_column(df: DataFrame, col: str, dtype: str) -> DataFrame:
    """try_cast semantics (reference cleaning/cast_column_type.sql uses
    DuckDB TRY_CAST): unparseable values become NULL, never errors."""
    return df.withColumn(col, F.col(col).try_cast(dtype))


def rename_column(df: DataFrame, old: str, new: str) -> DataFrame:
    return df.withColumnRenamed(old, new)


def drop_column(df: DataFrame, col: str) -> DataFrame:
    return df.drop(col)


def standardize_date(col: Column | str) -> Column:
    """String date → ISO 'yyyy-MM-dd' when parseable, else unchanged
    (reference cleaning/standardize_date.sql)."""
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.try_to_timestamp(F.trim(c))
    return F.when(
        parsed.isNotNull(), F.date_format(parsed, "yyyy-MM-dd")
    ).otherwise(c)
