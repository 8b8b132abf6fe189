"""Synthesize an sfN dataset as N disjoint replica universes of a
base sf directory (the round-6 sf1 procedure, made reproducible).

/root/testdata tops out at sf0.1; scale smoke tests above that use
N copies of it with every entity key offset by i*10_000_000 per copy
so the universes never join across copies (region/nation are shared
dims — tiny and genuinely global). Document text is salted with a
per-copy token suffix on EVERY word so shingles are disjoint across
copies: duplicate-cluster sizes stay constant and LSH/gram pair
counts scale Nx, not N^2x. Embedding vec_ids offset; vectors are
ROLLED by i dimensions per copy — a permutation preserves every
within-copy dot product exactly (pair structure identical per copy)
while cross-copy cosines collapse to noise, so cosine near-dup pair
counts scale Nx, not N^2x (a small additive jitter would leave
cross-copy cosines at ~1 and quadratically inflate pair counts).

Usage: python tools/make_sfn.py <base_sf_dir> <out_dir> <copies>
e.g.   python tools/make_sfn.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

# runnable from anywhere: python puts the SCRIPT's dir on sys.path,
# not the repo root
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

OFFSET = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    # label is offset too: it buckets similarity work
    # (dedup_embedding), and shared labels across copies would grow
    # buckets Nx -> within-bucket pairs N^2x
    "embeddings": ["vec_id", "label"],
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
        if t == "embeddings":
            # roll modulo the ACTUAL dimension: a hardcoded 64 makes
            # copy i=64 (and multiples) an unrolled duplicate, and a
            # dim below 64 aliases the roll mod the dim — cross-copy
            # cosines return to ~1 and pair counts inflate
            # quadratically for those copies
            first = src.select("embedding").first()
            dim = len(first[0]) if first and first[0] else 0
            if copies > max(dim, 1):
                raise SystemExit(
                    f"copies={copies} > embedding dim {dim}: rolls "
                    "would alias and cross-copy near-dup pair counts "
                    "go quadratic — use a larger base or fewer copies"
                )
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
            if t == "embeddings" and i > 0:
                # roll the vector by i dims: within-copy geometry is
                # EXACTLY preserved (permutation), cross-copy cosine
                # is noise -> pair counts scale Nx
                roll = i % dim
                df = df.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(
                            F.col("embedding"),
                            roll + 1,
                            F.size("embedding") - roll,
                        ),
                        F.slice(F.col("embedding"), 1, roll),
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
