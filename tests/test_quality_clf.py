"""Trained quality classifier (G37, operators/quality_clf.py): hashed
bag-of-words features, DF pruning, the distributed surrogate-GD fit
behind the registered ★ query, and the driver-side true logistic fit.
Recall is pinned against the planted labels; determinism across
physical partitionings is pinned because the registered query's
oracle replays the weights bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.quality_clf import (
    doc_features,
    fit_logistic_driver,
    hashed_bucket,
    score_documents,
    train_surrogate_gd,
)


def _planted_docs(spark, n=200, noise_words=8):
    """Docs whose label signal is planted marker tokens on top of a
    shared-noise vocabulary (the corpus-shaped separability task)."""
    rows = []
    for i in range(n):
        noise = " ".join(f"w{(i * 7 + j) % noise_words}" for j in range(12))
        marker = f"good{i % 3}" if i % 2 == 0 else f"bad{i % 5}"
        rows.append((i, float(i % 2 == 0), f"{noise} {marker} {marker}"))
    return spark.createDataFrame(rows, "doc_id long, y double, text string")


def test_surrogate_gd_separates_and_is_partition_invariant(spark):
    docs = _planted_docs(spark)
    feats = doc_features(docs, label_col="y", df_max=0.5).persist()
    labels = docs.select("doc_id", "y")
    w, b = train_surrogate_gd(labels, feats)
    scored = score_documents(labels, feats, w, b)
    acc = (
        scored.select(
            (
                (F.col("quality_score") > 0.5).cast("int")
                == F.col("y").cast("int")
            ).cast("double").alias("ok")
        )
        .agg(F.avg("ok"))
        .head()[0]
    )
    assert acc >= 0.95, acc
    # bit-identical weights under a different physical partitioning:
    # every GD intermediate is a dyadic rational, sums exact
    docs2 = docs.repartition(13)
    feats2 = doc_features(docs2, label_col="y", df_max=0.5)
    w2, b2 = train_surrogate_gd(docs2.select("doc_id", "y"), feats2)
    assert b2.head()[0] == b.head()[0]
    wm = {r["bucket"]: r["w"] for r in w.collect()}
    wm2 = {r["bucket"]: r["w"] for r in w2.collect()}
    assert wm == wm2  # exact equality, not approx


def test_driver_logistic_fit_recall(spark):
    docs = _planted_docs(spark)
    feats = doc_features(docs, label_col="y", df_max=0.5).persist()
    labels = docs.select("doc_id", "y")
    w, b = fit_logistic_driver(
        feats.select("doc_id", "bucket", "x"), labels
    )
    wdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(w) if v != 0.0],
        "bucket long, w double",
    )
    scored = score_documents(labels, feats, wdf, b)
    acc = (
        scored.select(
            (
                (F.col("quality_score") > 0.5).cast("int")
                == F.col("y").cast("int")
            ).cast("double").alias("ok")
        )
        .agg(F.avg("ok"))
        .head()[0]
    )
    assert acc >= 0.9, acc
    # determinism: same sample, same fit
    w_again, b_again = fit_logistic_driver(
        feats.select("doc_id", "bucket", "x"), labels
    )
    assert w_again == w and b_again == b


def test_df_filter_drops_ubiquitous_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "common rare1 common"), (2, "common rare2"), (3, "common")],
        "doc_id long, text string",
    )
    unfiltered = doc_features(docs)
    filtered = doc_features(docs, df_max=0.5)
    bucket_of = lambda w: (  # noqa: E731
        spark.createDataFrame([(w,)], "w string")
        .select(hashed_bucket("w", 512))
        .head()[0]
    )
    common_b = bucket_of("common")
    assert unfiltered.where(F.col("bucket") == common_b).count() == 3
    assert filtered.where(F.col("bucket") == common_b).count() == 0
    # rare tokens survive; docs left with nothing simply have no rows
    assert filtered.select("doc_id").distinct().count() == 2


def test_empty_doc_scores_bias_only(spark):
    docs = spark.createDataFrame(
        [(1, 1.0, "good good"), (2, 0.0, "bad bad"), (3, 1.0, "")],
        "doc_id long, y double, text string",
    )
    feats = doc_features(docs, label_col="y")
    labels = docs.select("doc_id", "y")
    w, b = train_surrogate_gd(labels, feats)
    scored = score_documents(labels, feats, w, b)
    rows = {r["doc_id"]: r["quality_score"] for r in scored.collect()}
    assert len(rows) == 3 and rows[3] is not None
