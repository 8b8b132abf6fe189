"""Oracle type-parity lint (see tests/test_oracle_lint.py for the gate).

The driver's value hash renders cells type-sensitively: DuckDB HUGEINT
(int128, the default SUM-over-integer result) hashes differently from
Spark BIGINT even when every value is equal — this silently cost rounds
1–3 (VERDICT r3 "What's wrong"). The mechanical guard: DESCRIBE each
oracle under DuckDB, analyze each Spark query's schema (no execution),
map both to canonical type classes, and fail on any divergence or any
banned DuckDB type.

Usage: python tools/lint_oracles.py  (prints one line per problem)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: DuckDB types Spark can never emit → banned outright in oracle output.
BANNED_DUCK = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")


def canon_duck(t: str) -> str:
    """DuckDB DESCRIBE type string → canonical class."""
    t = t.strip()
    if t.endswith("[]"):
        return f"list<{canon_duck(t[:-2])}>"
    u = t.upper()
    if u in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "INT", "INT4", "INT8"):
        return "int"
    if u in BANNED_DUCK:
        return u.lower()  # never matches a Spark class → always flagged
    if u in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    m = re.match(r"DECIMAL\(\s*\d+\s*,\s*(\d+)\s*\)", u)
    if m:
        return f"decimal({m.group(1)})"
    if u == "VARCHAR":
        return "str"
    if u == "DATE":
        return "date"
    if u.startswith("TIMESTAMP WITH TIME ZONE"):
        return "timestamptz"
    if u.startswith("TIMESTAMP"):
        return "timestamp"
    if u == "BOOLEAN":
        return "bool"
    if u == "BLOB":
        return "binary"
    return u.lower()


def canon_spark(dt) -> str:
    """pyspark DataType → canonical class."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.scale})"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"list<{canon_spark(dt.elementType)}>"
    return dt.simpleString()


def duck_schema(con, sql: str) -> list[tuple[str, str]]:
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows]


def lint_output_types(key: str, spark_fields) -> list[str]:
    """Doctrine rule 6 (the r4 red): no ArrayType/MapType column may
    appear in ANY registered query's output — the driver canonicalizer
    pandas-sorts the frame and dies on unhashable list/dict cells
    (`product_catalog`, CORRECTNESS_r04). Emit a scalar digest (the
    fingerprint BIGINT or a sequential-fold checksum) instead."""
    from pyspark.sql import types as T

    problems = []
    for f in spark_fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            problems.append(
                f"{key}: output column {f.name!r} is "
                f"{f.dataType.simpleString()} — array/map/struct outputs "
                f"crash the driver canonicalizer; emit a scalar digest"
            )
    return problems


def lint_pair(key: str, duck_cols, spark_fields) -> list[str]:
    """Return problem strings for one (oracle, query) pair."""
    problems = lint_output_types(key, spark_fields)
    for name, t in duck_cols:
        for banned in BANNED_DUCK:
            if re.search(rf"\b{banned}\b", t.upper()):
                problems.append(
                    f"{key}: oracle column {name!r} is {t} — Spark cannot "
                    f"emit this type; cast (e.g. CAST(SUM(..) AS BIGINT))"
                )
    dmap = {n: canon_duck(t) for n, t in duck_cols}
    smap = {f.name: canon_spark(f.dataType) for f in spark_fields}
    # Column ORDER may differ (the driver sorts by name before
    # hashing) but the NAME SETS must match exactly — a misnamed,
    # missing, or extra column hash-fails at driver time.
    only_oracle = sorted(set(dmap) - set(smap))
    only_spark = sorted(set(smap) - set(dmap))
    if only_oracle or only_spark:
        problems.append(
            f"{key}: column names differ — only in oracle: "
            f"{only_oracle}, only in spark: {only_spark}"
        )
    for name in sorted(set(dmap) & set(smap)):
        if dmap[name] != smap[name]:
            problems.append(
                f"{key}: column {name!r} type class differs — "
                f"oracle={dmap[name]} spark={smap[name]}"
            )
    return problems


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from biglake_iceberg_pipeline_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark("lint")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    problems = []
    for key, sql in oracles.items():
        try:
            dcols = duck_schema(con, sql)
        except Exception as e:  # noqa: BLE001
            problems.append(f"{key}: DESCRIBE failed: {e}")
            continue
        try:
            sfields = qs[key](spark, SF_DIR).schema.fields
        except Exception as e:  # noqa: BLE001
            problems.append(f"{key}: spark analysis failed: {e}")
            continue
        problems.extend(lint_pair(key, dcols, sfields))
    # rows-only queries (no oracle) still flow through the driver's
    # canonicalizer — the array/map ban applies to them too
    for key in sorted(set(qs) - set(oracles)):
        try:
            sfields = qs[key](spark, SF_DIR).schema.fields
        except Exception as e:  # noqa: BLE001
            problems.append(f"{key}: spark analysis failed: {e}")
            continue
        problems.extend(lint_output_types(key, sfields))
    for p in problems:
        print(p)
    print(f"-- {len(oracles)} oracles checked, {len(problems)} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
