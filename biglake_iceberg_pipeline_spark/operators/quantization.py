"""Int8 embedding quantization: 4× storage cut for vector corpora.

At 100 TB an embedding column dominates table size (a 768-dim float32
vector is 3 KB/row). Symmetric per-vector int8 quantization stores
codes + one scale per row (~4× smaller, ~8× vs float64) with bounded
error — and COSINE is scale-invariant, so similarity search over the
quantized codes needs no dequantization at all: cos(s_a·a, s_b·b) =
cos(a, b).

Everything is elementwise arithmetic + sequential folds, so the full
pipeline (quantize → dequantize → error/cosine audit) replays in the
DuckDB oracle bit-for-bit — the same doctrine as the rest of the
vector family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vector_scale(vec: Column) -> Column:
    """Per-vector symmetric scale: max|x| / 127 (0-vectors scale 0)."""
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return mx / F.lit(127.0)


def quantize(vec: Column, scale: Column) -> Column:
    """int8 codes: round(x / scale) clipped to [-127, 127]; a zero
    vector quantizes to zeros."""
    return F.transform(
        vec,
        lambda x: F.when(scale == 0.0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.round(x.cast("double") / scale, 0)),
            )
        )
        .cast("int"),
    )


def dequantize(codes: Column, scale: Column) -> Column:
    return F.transform(codes, lambda c: c.cast("double") * scale)


def pack_codes(codes_col: Column) -> Column:
    """array<int> int8-range codes → a BINARY blob, one byte per
    component. Parquet stores ByteType arrays as physical INT32 plus
    per-element repetition levels — measured at ~0.6× the float
    layout, nowhere near the promised 4×. A packed blob is dim bytes
    + a length word per row with NO levels: the true quantized scan
    payload. Packing is bit-faithful (two's-complement int8), so
    unpack → dequantize reproduces exactly the values the array
    layout would."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    def kernel(v):
        import pandas as pd

        return pd.Series(
            [
                None
                if row is None
                else np.asarray(row, dtype=np.int8).tobytes()
                for row in v
            ],
            dtype=object,
        )

    return pandas_udf(kernel, "binary")(codes_col)


def cosine_int8_vs_literal(
    blob_col: Column, scale_col: Column, query_vec: list[float]
) -> Column:
    """cosine(dequantized codes, literal query) straight off the
    packed blobs: unpack int8, reconstruct component-wise as
    code·scale, then the canonical fold — VECTORIZED ACROSS ROWS,
    SEQUENTIAL ACROSS DIMS with recon_i = (code_i·scale)·q_i, the
    exact op order of the DuckDB oracle replay (doctrine rule 3), so
    quantized ANN stays hash-checkable end-to-end."""
    import math

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    q = [float(x) for x in query_vec]
    qnorm = 0.0
    for x in q:
        qnorm = qnorm + x * x
    qnorm = math.sqrt(qnorm)
    dim = len(q)

    def kernel(blobs, scales):
        import pandas as pd

        n = len(blobs)
        if n == 0:
            return pd.Series([], dtype="float64")
        vals = blobs.to_numpy()
        sc = scales.to_numpy(dtype=np.float64)
        good = [
            i
            for i in range(n)
            if vals[i] is not None and len(vals[i]) == dim
        ]
        result: list[float | None] = [None] * n
        if good:
            arr = np.vstack(
                [np.frombuffer(vals[i], dtype=np.int8) for i in good]
            ).astype(np.float64)
            s = sc[good]
            rec = arr[:, 0] * s
            dot = rec * q[0]
            nrm = rec * rec
            for i in range(1, dim):
                rec = arr[:, i] * s
                dot = dot + rec * q[i]
                nrm = nrm + rec * rec
            with np.errstate(divide="ignore", invalid="ignore"):
                out = dot / (np.sqrt(nrm) * qnorm)
            for j, i in enumerate(good):
                result[i] = float(out[j])
        return pd.Series(result, dtype=object)

    return pandas_udf(kernel, "double")(blob_col, scale_col)


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, q_scale, q_codes) — the storage layout. Map-side only."""
    scale = vector_scale(F.col(vec_col))
    return df.select(
        F.col(id_col),
        scale.alias("q_scale"),
        quantize(F.col(vec_col), scale).alias("q_codes"),
    )


def quantization_audit(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Per-vector quantization quality: scale, worst absolute
    reconstruction error (provably ≤ scale/2), and the cosine between
    the original and its dequantized reconstruction. One projection,
    no shuffle — run it before committing a corpus to int8."""
    from biglake_iceberg_pipeline_spark.functions.numeric import money_round
    from biglake_iceberg_pipeline_spark.operators.dedup import cosine

    scale = vector_scale(F.col(vec_col))
    codes = quantize(F.col(vec_col), scale)
    recon = dequantize(codes, scale)
    err = F.aggregate(
        F.zip_with(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            recon,
            lambda a, b: F.abs(a - b),
        ),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    # dedup.cosine is the canonical bit-reproducible fold (same
    # sequential order as the oracle's list_reduce)
    cos = cosine(F.col(vec_col), recon)
    return df.select(
        F.col(id_col),
        money_round(scale, 6).alias("q_scale"),
        money_round(err, 6).alias("max_abs_err"),
        money_round(cos, 4).alias("recon_cosine"),
    )
