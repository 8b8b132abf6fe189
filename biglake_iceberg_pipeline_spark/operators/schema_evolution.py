"""Schema comparison and safe widening.

Parity: reference sql/schema/compare_schemas.sql (full-outer-join
diff), sql/schema/type_widening.sql (ALTER COLUMN SET DATA TYPE), and
the loader's create-or-append behavior (services/loader/
bigquery_manager.py adds missing columns / widens on append).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Spark dtype → engine-neutral SQL name (DuckDB vocabulary, so the
# comparison output is oracle-checkable).
_TYPE_NAMES = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}

# Lossless widenings the loader may apply automatically.
SAFE_WIDENINGS = {
    ("TINYINT", "SMALLINT"),
    ("TINYINT", "INTEGER"),
    ("TINYINT", "BIGINT"),
    ("SMALLINT", "INTEGER"),
    ("SMALLINT", "BIGINT"),
    ("INTEGER", "BIGINT"),
    ("INTEGER", "DOUBLE"),
    ("BIGINT", "DOUBLE"),
    ("FLOAT", "DOUBLE"),
    ("DATE", "TIMESTAMP"),
    ("VARCHAR", "VARCHAR"),
}

#: The subset of SAFE_WIDENINGS the parquet SCAN can apply to files
#: that keep the NARROWER physical type (probe-verified against the
#: Spark 4 vectorized reader; matches Iceberg's type-promotion rules,
#: which exist for exactly this reason): every INT32-physical source
#: (tinyint/smallint/int) upcasts to wider ints and double, and
#: FLOAT upcasts to DOUBLE. BIGINT->DOUBLE and DATE->TIMESTAMP are
#: value-safe for CAST (so appends may align INCOMING data through
#: them) but NOT read-safe — a committed-schema overlay on old files
#: would fail with PARQUET_COLUMN_DATA_TYPE_MISMATCH, so
#: metadata-only evolution of live files through them is refused
#: (rewrite via merge/overwrite/compact instead).
READ_SAFE_WIDENINGS = {
    ("TINYINT", "SMALLINT"),
    ("TINYINT", "INTEGER"),
    ("TINYINT", "BIGINT"),
    ("TINYINT", "DOUBLE"),
    ("SMALLINT", "INTEGER"),
    ("SMALLINT", "BIGINT"),
    ("SMALLINT", "DOUBLE"),
    ("INTEGER", "BIGINT"),
    ("INTEGER", "DOUBLE"),
    ("FLOAT", "DOUBLE"),
}


def normalize_type(spark_dtype: str) -> str:
    return _TYPE_NAMES.get(spark_dtype, spark_dtype.upper())


def describe_table(spark: SparkSession, df: DataFrame) -> DataFrame:
    """(column_name, column_type, is_nullable) rows — reference
    sql/schema/describe_table.sql. Pure metadata: no scan."""
    rows = [
        (f.name, normalize_type(f.dataType.simpleString()), f.nullable)
        for f in df.schema.fields
    ]
    return spark.createDataFrame(
        rows, "column_name string, column_type string, is_nullable boolean"
    )


def compare_schemas(
    spark: SparkSession, df_a: DataFrame, df_b: DataFrame
) -> DataFrame:
    """Column-level diff of two frames' schemas — same output contract
    as compare_schemas.sql (added/removed/type_changed rows only)."""
    a = spark.createDataFrame(
        [(c, normalize_type(t)) for c, t in df_a.dtypes],
        "column_name string, type_in_a string",
    )
    b = spark.createDataFrame(
        [(c, normalize_type(t)) for c, t in df_b.dtypes],
        "column_name string, type_in_b string",
    )
    j = a.join(b, "column_name", "full_outer")
    change = (
        F.when(F.col("type_in_a").isNull(), "added")
        .when(F.col("type_in_b").isNull(), "removed")
        .when(F.col("type_in_a") != F.col("type_in_b"), "type_changed")
        .otherwise("unchanged")
    )
    return (
        j.select("column_name", "type_in_a", "type_in_b", change.alias("change_type"))
        .where(F.col("change_type") != "unchanged")
        .orderBy("change_type", "column_name")
    )


def widening_plan(df_incoming: DataFrame, df_target: DataFrame) -> list[dict]:
    """Per-column action list for appending ``df_incoming`` into a
    table shaped like ``df_target``: 'ok' | 'widen' | 'add_column' |
    'incompatible'. The loader applies 'widen'/'add_column'
    automatically and rejects 'incompatible' (type_widening.sql)."""
    return widening_plan_types(df_incoming.schema, df_target.schema)


def _schema_dtypes(schema) -> list[tuple[str, str]]:
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def widening_plan_types(incoming, target_schema) -> list[dict]:
    """``widening_plan`` on StructTypes directly — no DataFrames, no
    SparkSession: callable from driver-side commit workers (e.g. the
    streaming sink's ``commit``) that must not boot a session."""
    target = {
        c: normalize_type(t) for c, t in _schema_dtypes(target_schema)
    }
    plan = []
    for c, t in _schema_dtypes(incoming):
        t_in = normalize_type(t)
        if c not in target:
            plan.append({"column": c, "action": "add_column", "to": t_in})
        elif t_in == target[c]:
            plan.append({"column": c, "action": "ok", "to": target[c]})
        elif (t_in, target[c]) in SAFE_WIDENINGS:
            plan.append({"column": c, "action": "ok", "to": target[c]})
        elif (target[c], t_in) in SAFE_WIDENINGS:
            plan.append({"column": c, "action": "widen", "to": t_in})
        else:
            plan.append(
                {"column": c, "action": "incompatible", "to": target[c]}
            )
    return plan


def evolve_schema(df_incoming: DataFrame, df_target: DataFrame):
    """The loader's create-or-append schema result: the target schema
    with (a) columns widened in place where the incoming type is the
    safely-wider one, and (b) incoming-only columns APPENDED — never
    dropped (reference loader adds missing columns on append). Raises
    on any 'incompatible' column. Returns a StructType."""
    return evolve_schema_types(df_incoming.schema, df_target.schema)


def evolve_schema_types(incoming_schema, target_schema):
    """``evolve_schema`` on StructTypes directly (session-free)."""
    from pyspark.sql.types import StructField, StructType

    plan = {
        p["column"]: p
        for p in widening_plan_types(incoming_schema, target_schema)
    }
    bad = [p for p in plan.values() if p["action"] == "incompatible"]
    if bad:
        raise ValueError(f"incompatible append: {bad}")
    incoming = {f.name: f for f in incoming_schema.fields}
    fields = []
    for f in target_schema.fields:
        p = plan.get(f.name)
        if p is not None and p["action"] == "widen":
            fields.append(
                StructField(f.name, incoming[f.name].dataType, True)
            )
        else:
            fields.append(StructField(f.name, f.dataType, True))
    target_names = {f.name for f in target_schema.fields}
    for f in incoming_schema.fields:
        if f.name not in target_names:
            fields.append(StructField(f.name, f.dataType, True))
    return StructType(fields)


def align_to_schema(df: DataFrame, schema) -> DataFrame:
    """Cast/reorder/null-fill ``df`` to a StructType (union-by-name
    semantics with safe casts)."""
    incoming = {f.name for f in df.schema.fields}
    out_cols = []
    for field in schema.fields:
        if field.name in incoming:
            out_cols.append(
                F.col(field.name).cast(field.dataType).alias(field.name)
            )
        else:
            out_cols.append(
                F.lit(None).cast(field.dataType).alias(field.name)
            )
    return df.select(*out_cols)


def align_for_append(df: DataFrame, target: DataFrame) -> DataFrame:
    """Align ``df`` for appending into a table shaped like ``target``
    under loader semantics: safe widenings apply to the TABLE (not a
    down-cast of the data), and incoming-only columns are kept — the
    result's schema is ``evolve_schema(df, target)``."""
    return align_to_schema(df, evolve_schema(df, target))
