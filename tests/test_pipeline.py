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
