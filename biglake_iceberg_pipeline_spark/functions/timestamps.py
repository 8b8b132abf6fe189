"""Multi-format timestamp parsing.

Parity: the reference's silver transformations parse 7 timestamp
formats via a COALESCE(SAFE.PARSE_TIMESTAMP(...)) chain
(test_data/thelook_ecommerce/silver/transformations/users.sql:84-92).
Spark-first: a coalesce of try_to_timestamp calls — pure Catalyst
expressions, whole-stage-codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (Spark pattern, strptime pattern) pairs, most common first.
TS_FORMATS: list[tuple[str, str]] = [
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("yyyy/MM/dd HH:mm:ss", "%Y/%m/%d %H:%M:%S"),
    ("MM/dd/yyyy HH:mm:ss", "%m/%d/%Y %H:%M:%S"),
    ("MM-dd-yyyy HH:mm:ss", "%m-%d-%Y %H:%M:%S"),
    ("MMM dd yyyy HH:mm:ss", "%b %d %Y %H:%M:%S"),
    ("dd MMM yyyy HH:mm:ss", "%d %b %Y %H:%M:%S"),
    ("MMMM dd, yyyy HH:mm:ss", "%B %d, %Y %H:%M:%S"),
]


def parse_multi_format_ts(col: Column | str) -> Column:
    """COALESCE over the 7 reference formats; NULL if none match."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    return F.coalesce(
        *[F.try_to_timestamp(c, F.lit(fmt)) for fmt, _ in TS_FORMATS]
    )


def duckdb_parse_multi_format_sql(expr: str) -> str:
    """The DuckDB-equivalent COALESCE chain (oracle side)."""
    parts = ", ".join(
        f"try_strptime(TRIM({expr}), '{fmt}')" for _, fmt in TS_FORMATS
    )
    return f"COALESCE({parts})"
