"""Trained quality classifier over hashed token n-grams — the
DCLM/FineWeb-Edu-class TRAINED filter the curation stack's heuristic
scores (operators/text.py quality/repetition) stand below: learn
"looks like the reference corpus" from labeled examples, score every
document, gate on the score.

Reference parity: the reference has no trained filter (its agent is
schema-level); this implements the modern curation component the
mandate's LLM-training-data family calls for (FineWeb, Penedo et al.
2024 arXiv:2406.17557 §3.3; DCLM, Li et al. 2024 arXiv:2406.11794
use a fastText-style linear classifier over text features — a linear
model over hashed bag-of-words, which is exactly what lives here).

Two fits, one feature space:

- ``fit_logistic_driver`` — the production path: true logistic
  regression, full-batch gradient descent in numpy on a BOUNDED
  driver-side sample (the G24/G29 pattern: the model is KBs, the fit
  corpus-independent once the sample is capped). Deterministic: zero
  init, fixed iterations/learning rate, no RNG.
- ``train_surrogate_gd`` — the same GD run DISTRIBUTED as DataFrame
  aggregations with a clipped-linear sigmoid surrogate in the inner
  iterations. Every intermediate stays a DYADIC RATIONAL (halves /
  quarters times integer counts), so every SUM is exact and
  order-independent — bit-identical between Spark and a SQL replay,
  which is what lets the registered query carry a full DuckDB oracle
  (hash -> dot product -> sigmoid). The true sigmoid touches only
  the FINAL score, on bit-identical inputs.

Scoring is a broadcast join of the bucket-weight table (<= n_buckets
rows) against the exploded token stream — all JVM expressions, no
Python in the hot path (an Arrow UDF would ship every token batch to
Python for a dot product the JVM does for free).

Scale shape (100 TB): tokenize+bucket is one hash shuffle on
(doc_id, bucket); each GD iteration is one bucket-sized aggregation
(n_buckets rows, broadcastable) plus one per-doc aggregation; the
iteration count is a small constant. Nothing is quadratic; the model
never exceeds n_buckets floats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: md5-prefix bucketing: bit-identical in Spark (conv on the hex of
#: the utf-8 bytes) and DuckDB ('0x' || prefix cast) — verified to the
#: integer. 32 hash bits, modulo n_buckets.
_PREFIX_CHARS = 8


def hashed_bucket(col, n_buckets: int) -> F.Column:
    """Deterministic, engine-portable token -> bucket in
    [0, n_buckets): integer value of the first 8 md5 hex chars of the
    token's utf-8 bytes, mod n_buckets. DuckDB replays it as
    ``('0x' || substr(md5(w), 1, 8))::BIGINT % n``."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(
            F.substring(F.md5(c.cast("string").cast("binary")), 1, _PREFIX_CHARS),
            16,
            10,
        ).cast("long")
        % n_buckets
    ).alias("bucket")


def hashed_bucket_sql(expr: str, n_buckets: int) -> str:
    """The DuckDB fragment computing the identical bucket."""
    return (
        f"(('0x' || substr(md5({expr}), 1, {_PREFIX_CHARS}))::BIGINT"
        f" % {n_buckets})"
    )


def doc_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str | None = None,
    n_buckets: int = 512,
    df_max: float | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Hashed bag-of-words features: one row per (doc, bucket) with
    the token count ``x``. Tokenization is the corpus convention
    shared with text_lm_score (whitespace split of lower(trim())),
    so the oracle replays it verbatim.

    ``df_max`` drops tokens whose DOCUMENT FREQUENCY exceeds the
    fraction — the standard stopword/DF pruning every bag-of-words
    classifier runs (fastText's minCount twin): near-ubiquitous
    tokens carry no label signal but dominate the count mass, and
    their hashed buckets would drown the informative ones. One extra
    (word, doc) distinct + a word-sized broadcast semi-join; the
    comparison is exact (integer doc counts vs df_max * n_docs).

    ``n_docs`` (honored only WITH ``df_max``; ignored otherwise) is
    the DISTINCT document count — pass it to keep the threshold a
    literal (no scalar join in the plan); omit it and the count rides
    the plan as a broadcast one-row aggregate. Either way it must be
    COUNT(DISTINCT id), the convention the SQL oracles replay."""
    keep = [id_col] + ([label_col] if label_col else [])
    toks = docs.select(
        *keep,
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).where(F.col("w") != "")
    if df_max is not None:
        dfc = (
            toks.select(id_col, "w")
            .distinct()
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        if n_docs is not None:
            # caller supplied the doc count (one cheap pushed-down
            # count up front): the threshold is a literal and the
            # plan stays free of scalar joins
            rare = dfc.where(
                F.col("df") <= F.lit(float(df_max) * n_docs)
            ).select("w")
        else:
            # plan-side scalar: a broadcast 1-row aggregate (the
            # scalar-subquery shape; shows as a 1-row BNLJ)
            nd = docs.agg(
                F.count_distinct(F.col(id_col)).alias("_n_docs")
            )
            rare = (
                dfc.crossJoin(F.broadcast(nd))
                .where(
                    F.col("df")
                    <= F.lit(float(df_max)) * F.col("_n_docs")
                )
                .select("w")
            )
        toks = toks.join(F.broadcast(rare), "w", "left_semi")
    return toks.groupBy(
        *keep, hashed_bucket("w", n_buckets)
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))


def train_surrogate_gd(
    docs: DataFrame,
    feats: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "y",
    lr: float = 0.25,
) -> tuple[DataFrame, DataFrame]:
    """Two full-batch GD iterations for a linear classifier over the
    hashed features, computed as DataFrame aggregations with a
    CLIPPED-LINEAR sigmoid surrogate (sigma~(s) = clamp(0.5 + s/4,
    0, 1) — the true sigmoid's tangent at 0, hard-clipped) in the
    inner step. With lr a power of two, labels in {0,1}, and integer
    token counts, EVERY intermediate — residuals, gradients, weights,
    dot products — is a dyadic rational whose sums are exact in
    IEEE-754 regardless of accumulation order, so Spark and a SQL
    replay produce bit-identical weights. Returns (weights DataFrame
    [bucket, w], bias DataFrame [one row, column ``bias``]) — the
    bias rides the plan as a broadcast aggregate instead of a driver
    collect, so training + scoring compile to ONE job graph (three
    fewer driver round-trips per query). ``docs`` must carry one row
    per document with ``label_col`` in {0.0, 1.0} (documents with no
    tokens still contribute to the bias)."""
    r1 = F.col(label_col) - F.lit(0.5)
    w1 = feats.groupBy("bucket").agg(
        (F.lit(lr) * F.sum(F.col("x") * r1)).alias("w")
    )
    bias1 = docs.agg(
        (F.lit(lr) * F.sum(F.col(label_col) - F.lit(0.5))).alias(
            "bias"
        )
    )
    dots = (
        feats.join(F.broadcast(w1), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    scored = (
        docs.join(dots, id_col, "left")
        .crossJoin(F.broadcast(bias1))
        .select(
            id_col,
            label_col,
            (
                F.col("bias") + F.coalesce(F.col("dot"), F.lit(0.0))
            ).alias("s"),
        )
    )
    # clipped-linear surrogate: exact for dyadic s (s/4 and the
    # clamp introduce no rounding), so the second iteration's sums
    # stay order-independent — the reason the oracle can replay this
    p1 = F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), F.lit(0.5) + F.col("s") / 4)
    )
    resid = scored.select(
        id_col, (F.col(label_col) - p1).alias("r2")
    )
    grad2 = (
        feats.join(resid, id_col)
        .groupBy("bucket")
        .agg((F.lit(lr) * F.sum(F.col("x") * F.col("r2"))).alias("g"))
    )
    w2 = (
        w1.join(grad2, "bucket", "outer")
        .select(
            "bucket",
            (
                F.coalesce(F.col("w"), F.lit(0.0))
                + F.coalesce(F.col("g"), F.lit(0.0))
            ).alias("w"),
        )
    )
    bias2 = (
        resid.agg(
            (
                F.lit(lr) * F.coalesce(F.sum("r2"), F.lit(0.0))
            ).alias("_g")
        )
        .crossJoin(F.broadcast(bias1))
        .select((F.col("bias") + F.col("_g")).alias("bias"))
    )
    return w2, bias2


def score_documents(
    docs: DataFrame,
    feats: DataFrame,
    weights: DataFrame,
    bias: "DataFrame | float",
    id_col: str = "doc_id",
    digits: int = 6,
) -> DataFrame:
    """sigmoid(bias + x . w) per document via a broadcast join of the
    bucket-weight table — the one libm call in the whole pipeline,
    applied to bit-identical inputs and rounded with the portable
    floor-round so the value hashes across engines. ``bias`` is a
    float (the driver fit) or a one-row ``bias``-column DataFrame
    (the surrogate fit — rides the plan broadcast). Docs without
    tokens score sigmoid(bias)."""
    dots = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )
    joined = docs.join(dots, id_col, "left")
    if isinstance(bias, DataFrame):
        joined = joined.crossJoin(F.broadcast(bias))
        b = F.col("bias")
    else:
        b = F.lit(float(bias))
    s = b + F.coalesce(F.col("dot"), F.lit(0.0))
    scale = float(10**digits)
    score = (
        F.floor((F.lit(1.0) / (F.lit(1.0) + F.exp(-s))) * scale + 0.5)
        / scale
    )
    return joined.select(*docs.columns, score.alias("quality_score"))


def fit_logistic_driver(
    feats: DataFrame,
    labels: DataFrame,
    n_buckets: int = 512,
    id_col: str = "doc_id",
    label_col: str = "y",
    sample_docs: int = 4096,
    iters: int = 200,
    lr: float = 0.5,
) -> tuple[list[float], float]:
    """True logistic regression on a BOUNDED driver-side sample (the
    production fit; the distributed surrogate exists for the oracle
    replay). Deterministic: the sample is the lowest ``sample_docs``
    ids (no RNG), init is zeros, full-batch GD with fixed iters/lr.
    Returns (weights[n_buckets], bias). The collected matrix is
    O(sample_docs x avg buckets/doc) — KBs to MBs, independent of
    corpus size."""
    import numpy as np

    ids = [
        r[0]
        for r in labels.select(id_col)
        .orderBy(id_col)
        .limit(sample_docs)
        .collect()
    ]
    lab = {
        r[0]: r[1]
        for r in labels.where(F.col(id_col).isin(ids))
        .select(id_col, label_col)
        .collect()
    }
    rows = (
        feats.where(F.col(id_col).isin(ids))
        .select(id_col, "bucket", "x")
        .collect()
    )
    idx = {d: i for i, d in enumerate(sorted(lab))}
    X = np.zeros((len(idx), n_buckets))
    for r in rows:
        X[idx[r[0]], int(r[1])] += r[2]
    # raw counts (no row normalization): the learned weights then
    # compose directly with score_documents' x . w dot product
    y = np.array([lab[d] for d in sorted(lab)])
    w = np.zeros(n_buckets)
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = X.T @ (y - p) / len(y)
        w += lr * g
        b += lr * float(np.mean(y - p))
    return w.tolist(), b
