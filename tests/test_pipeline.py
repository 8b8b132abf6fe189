"""End-to-end curation pipeline composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.plans.pipeline import curate_documents
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable


def test_curate_documents_end_to_end(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # plant a malformed row, an exact dup, and leave the corpus's own
    # near-dups to the LSH stage
    first = docs.first()
    extra = spark.createDataFrame(
        [
            (99001, first["text"], first["lang"], first["source"],
             first["n_chars"]),
            (99002, None, "en", "src0", 0),
            # violates BOTH gate rules (doc_id AND text null) — must be
            # counted as ONE dropped row, not two violations
            (None, None, "en", "src0", 0),
        ],
        docs.schema.names,
    ).select(*docs.columns)
    feed = docs.unionByName(extra)

    out = str(tmp_path / "curated")
    metrics = curate_documents(
        spark,
        feed,
        out,
        mixture={"src0": 1.0, "src1": 0.5},
        min_quality=0.2,
        chunk_size=200,
        chunk_overlap=40,
    )
    assert metrics["input"] == docs.count() + 3
    # exactly the two malformed rows — row-level funnel accounting
    assert metrics["gate_dropped"] == 2
    # the planted exact dup must be gone
    assert metrics["after_exact_dedup"] <= docs.count()
    assert metrics["after_near_dedup"] <= metrics["after_exact_dedup"]
    assert metrics["after_quality"] <= metrics["after_near_dedup"]
    assert metrics["after_mixture"] <= metrics["after_quality"]
    assert metrics["chunks_written"] >= metrics["after_mixture"]

    table = LakehouseTable(out)
    chunks = table.read(spark)
    assert chunks.count() == metrics["chunks_written"]
    assert {"doc_id", "chunk_id", "chunk_text"} <= set(chunks.columns)
    # mixture respected: no src1 overrepresentation (rate 0.5 of kept)
    assert chunks.where(F.length("chunk_text") == 0).count() == 0


def test_curate_documents_classifier_and_token_budget(
    spark, tmp_path, sf_dir
):
    """The r9 stages compose into the funnel: a trained-classifier
    gate (labels planted as marker tokens — even ids are 'reference')
    drops the negative class, then per-source token budgets cap the
    final allocation; the funnel stays monotone and accounted."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    marker = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("refmark"), (F.col("doc_id") % 3).cast("string")),
    ).otherwise(
        F.concat(F.lit("crawlmark"), (F.col("doc_id") % 5).cast("string"))
    )
    feed = docs.withColumn(
        "text", F.concat_ws(" ", F.col("text"), marker, marker, marker)
    )
    out = str(tmp_path / "curated")
    metrics = curate_documents(
        spark,
        feed,
        out,
        min_quality=0.0,
        classifier_label=(F.col("doc_id") % 2 == 0),
        classifier_min_score=0.5,
        token_budgets={"src0": 800},
        default_token_budget=400,
    )
    # funnel monotone through the new stages
    assert (
        metrics["after_quality"]
        >= metrics["after_classifier"]
        >= metrics["after_token_budget"]
    )
    # the classifier kept ~the even half (near-dup/dedup stages may
    # have dropped a few docs first)
    assert metrics["after_classifier"] <= metrics["after_quality"] * 0.6
    assert metrics["after_classifier"] > 0
    # budgets bite: strictly fewer docs than the classifier passed
    assert metrics["after_token_budget"] < metrics["after_classifier"]
    assert metrics["chunks_written"] > 0
