"""Product quantization (PQ) for embedding search — the compression
step that makes billion-vector ANN affordable (FAISS IVF-PQ shape).

int8 quantization (operators/quantization.py) is 4× smaller than
float32; PQ goes much further: split each vector into ``m``
subvectors, k-means each subspace into ``k`` centroids, store only
the ``m`` centroid ids — ``m`` bytes per vector (64-dim float32 →
8 bytes at m=8: 32×). Queries score WITHOUT reconstructing vectors
via ADC (asymmetric distance computation): precompute the query's
distance to every centroid of every subspace (an ``m × k`` table,
driver-side, microseconds), then a row's distance is ``m`` table
lookups summed — no float math against the corpus at all.

Scale shape: codebook training is a bounded-sample driver fit (same
bound as the IVF k-means and BPE training); encoding is one
Arrow-batched pass; probes read ``m``-byte codes instead of ``4d``
-byte vectors (32× less scan I/O) and the ADC kernel is a numpy
gather-sum. Compose with the IVF index (operators/vector_index.py)
by storing pq codes as the partition payload for IVF-PQ.

Embeddings here are unit-normalized (see `embedding_stats`), so L2
distance is monotone in cosine — ADC L2 ranking ≈ cosine ranking.

Determinism: k-means init takes evenly spaced points from the sample
sorted by subvector norm (no RNG — same corpus → same codebooks →
same codes), Lloyd iterations are order-independent means.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    sample_n: int = 4096,
    iters: int = 12,
) -> list:
    """Per-subspace codebooks as a nested list ``[m][k][d/m]``
    (JSON-serializable — persist next to the index). Driver-side
    Lloyd's on a bounded sample; deterministic init."""
    if k > 256:
        raise ValueError(f"k={k} > 256: codes are one uint8 per subspace")
    rows = df.select(vec_col).limit(sample_n).collect()
    vecs = [r[0] for r in rows if r[0] is not None]
    if not vecs:
        raise ValueError("train_pq_codebooks: no non-null vectors to fit")
    x = np.asarray(vecs, dtype=np.float64)
    n, d = x.shape
    if n < k:
        raise ValueError(
            f"train_pq_codebooks: sample has {n} vectors < k={k} "
            "centroids — lower k or raise sample_n"
        )
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = []
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        order = np.argsort(np.linalg.norm(sub, axis=1), kind="stable")
        init_idx = order[np.linspace(0, n - 1, k).astype(int)]
        cent = sub[init_idx].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            # deterministic reseed order: points by descending distance
            # to their assigned centroid; each empty cluster takes the
            # next UNUSED one (two empties in one iteration must not
            # collapse onto the same point)
            reseed_order = iter(
                np.argsort(-d2[np.arange(n), assign], kind="stable")
            )
            used: set[int] = set()
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
                else:
                    far = next(
                        (i for i in reseed_order if i not in used), None
                    )
                    if far is not None:
                        used.add(int(far))
                        cent[c] = sub[far]
        books.append(cent.tolist())
    return books


def pq_code_column(vec_col, codebooks: list):
    """Column expression: vector → m-byte PQ code (each byte the
    nearest centroid id in that subspace). Arrow-batched."""
    cents = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    m, _k, dsub = cents.shape
    if _k > 256:
        raise ValueError(
            f"codebook k={_k} > 256: uint8 codes would wrap centroid ids"
        )

    @pandas_udf("binary")
    def encode(vecs):
        import pandas as pd

        out = []
        for v in vecs:
            if v is None or len(v) != m * dsub:
                out.append(None)
                continue
            a = np.asarray(v, dtype=np.float64).reshape(m, dsub)
            # (m, k) distances: per-subspace against its codebook
            d2 = ((a[:, None, :] - cents) ** 2).sum(axis=2)
            out.append(bytes(d2.argmin(axis=1).astype(np.uint8)))
        return pd.Series(out)

    return encode(vec_col)


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, codebooks: list
) -> DataFrame:
    """(id, pq_code binary[m]): one Arrow-batched pass."""
    return df.select(
        F.col(id_col),
        pq_code_column(F.col(vec_col), codebooks).alias("pq_code"),
    )


def adc_column(code_col, codebooks: list, query_vec: list[float]):
    """Column expression: PQ code → ADC L2² estimate vs the query.
    The query's ``m × k`` centroid-distance table is built
    driver-side and rides the kernel closure; each row costs m byte
    lookups + a sum (numpy gather)."""
    cents = np.asarray(codebooks, dtype=np.float64)  # (m, K, dsub)
    m, _K, dsub = cents.shape
    q = np.asarray(query_vec, dtype=np.float64).reshape(m, dsub)
    table = ((q[:, None, :] - cents) ** 2).sum(axis=2)  # (m, K)

    @pandas_udf("double")
    def adc(blobs):
        import pandas as pd

        out = np.full(len(blobs), np.nan)
        valid = [i for i, b in enumerate(blobs) if b is not None]
        if valid:
            arr = np.frombuffer(
                b"".join(blobs.iloc[i] for i in valid), dtype=np.uint8
            ).reshape(len(valid), m)
            # gather-sum: one table lookup per subspace, summed
            scores = table[np.arange(m)[None, :], arr].sum(axis=1)
            out[valid] = scores
        return pd.Series(out)

    return adc(code_col)


def pq_topk(
    codes: DataFrame,
    id_col: str,
    codebooks: list,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Top-k by ADC distance (ascending L2² estimate). Returns
    (id, adc_dist)."""
    return (
        codes.select(
            F.col(id_col),
            adc_column(F.col("pq_code"), codebooks, query_vec).alias(
                "adc_dist"
            ),
        )
        .where(F.col("adc_dist").isNotNull())
        .orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_topk_rerank(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list,
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 100,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Production PQ probing: ADC over the compressed codes picks a
    ``shortlist`` (the cheap pass over the whole corpus — m bytes per
    row), then EXACT cosine re-ranks only the shortlist's float
    vectors (a semi-join-sized read). Recall is set by the shortlist
    size, not the quantizer — shortlist/k of 10× recovers near-exact
    results while the corpus-wide scan stays 32× lighter. Returns
    (id, cosine) descending.

    Pass the precomputed ``codes`` frame (``pq_encode`` output or a
    persisted code table) for repeated queries — without it each call
    re-encodes the float corpus, which forfeits the I/O win (the
    materialized form is ``build_ivf_index_pq``)."""
    from biglake_iceberg_pipeline_spark.operators.similarity import (
        cosine_vs_literal,
    )

    if codes is None:
        codes = pq_encode(df, id_col, vec_col, codebooks)
    short = pq_topk(codes, id_col, codebooks, query_vec, k=shortlist)
    return (
        df.join(F.broadcast(short.select(id_col)), id_col)
        .select(
            F.col(id_col),
            F.round(
                cosine_vs_literal(F.col(vec_col), list(query_vec)), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
