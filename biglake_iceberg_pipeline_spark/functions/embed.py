"""Text-embedding model seam (reference DEMO.md §7, "Auto-Embeddings on
Incremental Data": BigQuery ML.GENERATE_EMBEDDING populating
``gold.product_catalog.description_embedding`` on insert).

No embedding model ships in this container, so the seam follows the
same doctrine as functions/model_fn.py (AI.GENERATE_TEXT): a
DETERMINISTIC stand-in whose plumbing — column shape, JVM-side
expression tree, incremental-index maintenance, oracle replay — is the
real thing. Swap ``deterministic_embedding`` for an Arrow-batched model
UDF and nothing downstream changes (the vector index and ANN probes
only see ``array<double>``).

The stand-in maps text → R^dim via the engine-portable rolling
fingerprint (operators/text.py) expanded through ``dim`` affine
congruential steps: component_j = ((fp·a_j + b_j) mod P) / P · 2 − 1,
all integer math below 2^63 and every double op identical in Spark and
DuckDB, so embeddings are bit-reproducible across engines (the oracle
recomputes them from scratch). Identical descriptions → identical
vectors, which is exactly the property the dedup/ANN plumbing tests
need.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.dedup import HASH_PRIME

#: Knuth multiplicative constant; any odd constant < P works — it only
#: needs to be THE SAME in Spark, Python, and the DuckDB oracle.
_A0 = 2654435761
_B0 = 1000003

EMBED_DIM = 16


def _coef(j: int) -> tuple[int, int]:
    a = (_A0 * (j + 1) + 40503) % HASH_PRIME
    b = (_B0 * (j + 1) + 17) % HASH_PRIME
    return a, b


def deterministic_embedding(text_col: Column, dim: int = EMBED_DIM) -> Column:
    """array<double> embedding of a text column — pure codegen
    expressions (one fingerprint fold + ``dim`` affine steps), no UDF,
    no shuffle; at 100 TB this is a map-side projection."""
    from biglake_iceberg_pipeline_spark.operators.text import (
        rolling_fingerprint,
    )

    fp = rolling_fingerprint(text_col)
    comps = []
    for j in range(dim):
        a, b = _coef(j)
        h = (fp * F.lit(a).cast("long") + F.lit(b).cast("long")) % F.lit(
            HASH_PRIME
        ).cast("long")
        comps.append(h / F.lit(float(HASH_PRIME)) * 2.0 - 1.0)
    return F.array(*comps)


def deterministic_embedding_py(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Driver-side replica (same arithmetic, same IEEE op order) —
    used to build literal query vectors without a cluster job."""
    fp = 0
    for c in text:
        fp = (fp * 31 + ord(c)) % HASH_PRIME
    out = []
    for j in range(dim):
        a, b = _coef(j)
        h = (fp * a + b) % HASH_PRIME
        out.append(h / float(HASH_PRIME) * 2.0 - 1.0)
    return out


def fingerprint_sql(text_expr: str) -> str:
    """DuckDB fold replicating operators/text.rolling_fingerprint —
    compute it ONCE in a CTE, then expand with embedding_sql."""
    return (
        "list_reduce(list_prepend(0::BIGINT, "
        f"[ord(c)::BIGINT for c in string_split({text_expr}, '')]), "
        f"(a, b) -> (a * 31 + b) % {HASH_PRIME})"
    )


def embedding_sql(fp_expr: str, dim: int = EMBED_DIM) -> str:
    """DuckDB list expression expanding a precomputed fingerprint
    column into the identical embedding — lets oracles replay the
    model seam end-to-end."""
    comps = []
    for j in range(dim):
        a, b = _coef(j)
        comps.append(
            f"(({fp_expr} * {a} + {b}) % {HASH_PRIME}) "
            f"/ {HASH_PRIME}.0 * 2.0 - 1.0"
        )
    return "[" + ", ".join(comps) + "]"
