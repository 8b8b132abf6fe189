"""Vector similarity search over embedding columns.

Parity: DEMO.md §7 — BigQuery VECTOR_SEARCH with COSINE distance and
an IVF index over `gold.product_catalog(description_embedding)`.

Spark-first:
- brute_force_topk: the exact baseline. The query vector is a plan
  literal (broadcast by construction); scoring is a single projection
  over the fact scan (no shuffle), then a TakeOrdered top-k (no global
  sort materialization). At 100 TB this is one scan — the right answer
  for one-off queries.
- ivf_topk: the scale path for repeated queries. A deterministic
  sign-bit coarse quantizer (random-hyperplane LSH family, seeds
  fixed) buckets vectors; the search probes only buckets within
  ``nprobe`` hamming distance of the query's code — the scan prunes to
  a fraction of partitions. Lives entirely in JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.dedup import cosine


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    cos = cosine(F.col(vec_col), _vec_lit(query_vec))
    return (
        df.select(
            F.col(id_col).alias("vec_id2") if id_col != "vec_id" else F.col(id_col),
            cos.alias("__cos"),
        )
        .orderBy(F.desc("__cos"), id_col if id_col == "vec_id" else "vec_id2")
        .limit(k)
        .select(
            F.col(id_col if id_col == "vec_id" else "vec_id2").alias(id_col),
            F.round("__cos", 4).alias("cosine_sim"),
        )
    )


def signbit_code(vec_col: Column, planes: int = 8) -> Column:
    """Coarse quantizer: ``planes`` sign bits from fixed pseudo-random
    hyperplanes (hyperplane j weight for dim i = a deterministic ±1
    pattern derived from (i*planes + j) hashing — seed-free and
    engine-independent)."""
    dims = F.size(vec_col)
    # weight(i, j) = +1 if ((i*31 + j*17) % 7) < 3 else -1 — a fixed,
    # cheap pseudo-random ±1 pattern (documented so tests can replay it)
    def plane_dot(j: int) -> Column:
        prods = F.zip_with(
            vec_col,
            F.sequence(F.lit(0), dims - 1),
            lambda x, i: x.cast("double")
            * F.when(((i * 31 + j * 17) % 7) < 3, 1.0).otherwise(-1.0),
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)

    code = F.lit(0).cast("long")
    for j in range(planes):
        code = code + F.when(
            plane_dot(j) > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
    return code


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    planes: int = 8,
    nprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose sign-bit code is
    within ``nprobe_hamming`` of the query's code."""
    coded = df.select(
        F.col(id_col),
        F.col(vec_col),
        signbit_code(F.col(vec_col), planes).alias("__code"),
    )
    qcode = signbit_code(_vec_lit(query_vec), planes)
    probe = F.bit_count(F.col("__code").bitwiseXOR(qcode)) <= nprobe_hamming
    cos = cosine(F.col(vec_col), _vec_lit(query_vec))
    return (
        coded.where(probe)
        .select(F.col(id_col), cos.alias("__cos"))
        .orderBy(F.desc("__cos"), id_col)
        .limit(k)
        .select(F.col(id_col), F.round("__cos", 4).alias("cosine_sim"))
    )


def l2_norm(vec: Column) -> Column:
    """Euclidean norm of an array column (double math, sequential
    fold — bit-reproducible across engines)."""
    d = F.transform(vec, lambda x: x.cast("double"))
    return F.sqrt(
        F.aggregate(
            F.transform(d, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize an embedding (zero vectors pass through as
    zeros rather than dividing by zero) — run once at ingest so every
    downstream cosine is a plain dot product."""
    n = l2_norm(vec)
    return F.when(
        n == 0.0, F.transform(vec, lambda x: x.cast("double"))
    ).otherwise(
        F.transform(vec, lambda x: x.cast("double") / n)
    )
