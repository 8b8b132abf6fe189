"""Self-check harness mimicking the driver's t2 correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at
sf0.01, compares row count, column names, and an order-insensitive
value hash. Usage:

    python tools/check_oracle.py [key ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = __import__("os").environ.get("CHECK_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    # Full-precision repr — no %.6g normalization, so a local FAIL/OK here
    # predicts the driver's hash verdict (VERDICT r2 item 3).
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main():
    import __spark_entry__ as e
    from biglake_iceberg_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = e.queries()
    oracles = e.oracle_sql()
    keys = sys.argv[1:] or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    from tools.lint_oracles import lint_output_types

    failures = 0
    for key in keys:
        sdf = qs[key](spark, SF_DIR)
        # the DRIVER's canonicalizer (pandas sort_values) dies on
        # list/dict cells — norm_cell below stringifies them, which
        # masked the r4 product_catalog red; fail loudly instead
        type_problems = lint_output_types(key, sdf.schema.fields)
        if type_problems:
            failures += 1
            print(f"{key:32s} FAIL {'; '.join(type_problems)}")
            continue
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if key not in oracles:
            print(f"{key:32s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        dres = con.execute(oracles[key])
        dcols = [d[0] for d in dres.description]
        drows = dres.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = value_hash(srows, scols)
        dh = value_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{key:32s} {status} rows {len(srows)}/{len(drows)} "
            f"cols={'OK' if ok_cols else (scols, dcols)} hash {sh}/{dh}"
        )
        if status == "FAIL" and len(srows) <= 10 and len(drows) <= 10:
            print("  spark:", sorted(srows)[:5])
            print("  duck :", sorted(drows)[:5])
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
