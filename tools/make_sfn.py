"""Synthesize an sfN dataset as N disjoint replica universes of a
base sf directory (the round-6 sf1 procedure, made reproducible).

/root/testdata tops out at sf0.1; scale smoke tests above that use
N copies of it with every entity key offset by i*10_000_000 per copy
so the universes never join across copies (region/nation are shared
dims — tiny and genuinely global). Document text is salted with a
per-copy token suffix on EVERY word so shingles are disjoint across
copies: duplicate-cluster sizes stay constant and LSH/gram pair
counts scale Nx, not N^2x. Embedding vec_ids offset; vectors get a
copy-specific jitter on one dimension so cosine near-dup pair counts
also scale Nx.

Usage: python tools/make_sfn.py <base_sf_dir> <out_dir> <copies>
e.g.   python tools/make_sfn.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

OFFSET = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED = ["region", "nation"]


def main() -> None:
    base, out, copies = (
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]),
    )
    from pyspark.sql import functions as F

    from biglake_iceberg_pipeline_spark.session import get_spark

    spark = get_spark("make-sfn")
    os.makedirs(out, exist_ok=True)
    for t in SHARED:
        spark.read.parquet(f"{base}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(f"{t}: shared copy")
    for t, keys in KEY_COLS.items():
        src = spark.read.parquet(f"{base}/{t}.parquet")
        parts = []
        for i in range(copies):
            df = src
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            if t == "documents":
                # salt EVERY word so no shingle crosses copies
                df = df.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"_c{i}")),
                        ),
                        " ",
                    ),
                )
            if t == "embeddings":
                # one-dimension jitter: copies are near but not
                # identical, so cosine pair counts scale Nx
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda v, j: F.when(
                            j == 0, v + F.lit(float(i)) * F.lit(0.01)
                        ).otherwise(v),
                    ).cast("array<float>"),
                )
            parts.append(df)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
        full.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {copies} copies -> {n} rows")


if __name__ == "__main__":
    main()
