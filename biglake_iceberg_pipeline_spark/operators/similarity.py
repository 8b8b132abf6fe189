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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot_unrolled(vec_col: Column, query_vec: list[float]) -> Column:
    """Dot product against a LITERAL query vector as an unrolled,
    whole-stage-codegen expression chain — no interpreted
    higher-order-function eval in the scan's hot path (SURVEY §6
    documents the HOF fold as a ~35x loss on MinHash; same physics
    here). Left-associated additions reproduce the sequential fold
    order bit-for-bit, so results hash-match the DuckDB oracle's
    list_reduce."""
    # Every term kept (even zero weights): dropping one would change
    # the IEEE addition sequence vs the oracle's fold over all dims.
    terms = [
        vec_col[i].cast("double") * float(q)
        for i, q in enumerate(query_vec)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def norm_unrolled(vec_col: Column, dim: int) -> Column:
    """L2 norm via unrolled codegen expressions (fixed, known dim).
    Same sequential-order guarantee as dot_unrolled."""
    x0 = vec_col[0].cast("double")
    acc = x0 * x0
    for i in range(1, dim):
        xi = vec_col[i].cast("double")
        acc = acc + xi * xi
    return F.sqrt(acc)


def cosine_vs_literal_unrolled(
    vec_col: Column, query_vec: list[float]
) -> Column:
    """Codegen cosine(vec, literal query): one unrolled dot + one
    unrolled norm per row; the query's norm folds to a plan constant
    computed driver-side with the same sequential IEEE op order.

    Trade-off measured at sf0.1: executes fast (whole-stage codegen)
    but the ~400-node expression tree costs ~1 s of Catalyst
    optimization PER QUERY — use for one-shot plans; repeated queries
    go through ``cosine_vs_literal`` (Arrow/numpy, small plan)."""
    qnorm = 0.0
    for q in query_vec:
        qnorm = qnorm + float(q) * float(q)
    qnorm = math.sqrt(qnorm)
    dim = len(query_vec)
    return F.try_divide(
        dot_unrolled(vec_col, query_vec),
        norm_unrolled(vec_col, dim) * F.lit(qnorm),
    )


def cosine_vs_literal(vec_col: Column, query_vec: list[float]) -> Column:
    """Arrow-batched cosine(vec, literal query): a pandas UDF whose
    numpy kernel is VECTORIZED ACROSS ROWS but SEQUENTIAL ACROSS
    DIMENSIONS — `acc = acc + col_i * q_i` left-associated exactly like
    the DuckDB oracle's list_reduce fold, so results stay bit-identical
    while each executor does SIMD column math. Plan stays tiny (one UDF
    node), so driver-side optimization time doesn't scale with dim —
    the failure mode the unrolled variant hits."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    q = [float(x) for x in query_vec]
    qnorm = 0.0
    for x in q:
        qnorm = qnorm + x * x
    qnorm = math.sqrt(qnorm)

    def kernel(v):
        import pandas as pd

        n = len(v)
        if n == 0:
            return pd.Series([], dtype="float64")
        # NULL or wrong-dim vectors → NULL cosine (the interpreted-HOF
        # fold's null propagation); vstack over a ragged batch would
        # instead crash the whole task.
        vals = v.to_numpy()
        good = [
            i for i in range(n)
            if vals[i] is not None and len(vals[i]) == len(q)
        ]
        result: list[float | None] = [None] * n
        if good:
            arr = np.vstack(vals[good]).astype(np.float64, copy=False)
            dot = arr[:, 0] * q[0]
            nrm = arr[:, 0] * arr[:, 0]
            for i in range(1, len(q)):
                dot = dot + arr[:, i] * q[i]
                nrm = nrm + arr[:, i] * arr[:, i]
            with np.errstate(divide="ignore", invalid="ignore"):
                out = dot / (np.sqrt(nrm) * qnorm)
            for j, i in enumerate(good):
                result[i] = float(out[j])
        return pd.Series(result, dtype=object)

    return pandas_udf(kernel, "double")(vec_col)


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    cos = cosine_vs_literal(F.col(vec_col), query_vec)
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


def plane_weight(i: int, j: int) -> float:
    """Deterministic ±1 hyperplane pattern: +1 if ((i*31 + j*17) % 7)
    < 3 else -1 — seed-free, engine-independent, replayable in tests
    and driver-side Python alike."""
    return 1.0 if ((i * 31 + j * 17) % 7) < 3 else -1.0


def signbit_code(
    vec_col: Column, planes: int = 8, dim: int | None = None
) -> Column:
    """Coarse quantizer: ``planes`` sign bits from the fixed ±1
    hyperplane pattern. With ``dim`` known the plane dot products are
    unrolled codegen expressions; without it, an interpreted HOF
    fallback handles ragged arrays (index path always passes dim)."""

    def plane_dot(j: int) -> Column:
        if dim is not None:
            acc = vec_col[0].cast("double") * plane_weight(0, j)
            for i in range(1, dim):
                acc = acc + vec_col[i].cast("double") * plane_weight(i, j)
            return acc
        dims = F.size(vec_col)
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


def signbit_code_py(vec: list[float], planes: int = 8) -> int:
    """Driver-side replica of signbit_code for a concrete vector —
    used to compute the query's code and enumerate probe buckets
    without touching the cluster."""
    code = 0
    for j in range(planes):
        acc = 0.0
        for i, x in enumerate(vec):
            acc = acc + float(x) * plane_weight(i, j)
        if acc > 0:
            code |= 1 << j
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
    """Approximate top-k WITHOUT a prebuilt index: codes are computed
    in the same scan that scores survivors (one pass, codegen
    throughout — but still a full scan). For repeated queries use
    operators/vector_index.py, which materializes the codes as a
    partition column so probes prune the scan itself."""
    dim = len(query_vec)
    qcode = signbit_code_py(query_vec, planes)
    coded = df.select(
        F.col(id_col),
        F.col(vec_col),
        signbit_code(F.col(vec_col), planes, dim=dim).alias("__code"),
    )
    probe = (
        F.bit_count(F.col("__code").bitwiseXOR(F.lit(qcode)))
        <= nprobe_hamming
    )
    cos = cosine_vs_literal(F.col(vec_col), query_vec)
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
