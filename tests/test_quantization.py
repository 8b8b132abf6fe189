"""Int8 embedding quantization: error bound, storage layout, and the
scale-invariance of cosine over codes."""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import quantization as Q
from biglake_iceberg_pipeline_spark.operators.dedup import cosine


def test_quantization_error_bounded_by_half_scale(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    audit = Q.quantization_audit(emb, "vec_id", "embedding").collect()
    assert len(audit) == 100
    for r in audit:
        # symmetric rounding: |x - code*scale| <= scale/2 (+ rounding
        # headroom from the audit's own 1e-6 rounding)
        assert r["max_abs_err"] <= r["q_scale"] / 2 + 1e-6, r
        assert r["recon_cosine"] >= 0.99, r  # int8 keeps direction


def test_codes_layout_and_cosine_scale_invariance(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    q = Q.quantize_embeddings(emb, "vec_id", "embedding")
    rows = q.collect()
    for r in rows:
        assert all(-127 <= c <= 127 for c in r["q_codes"])
    # cosine over RAW CODES equals cosine over dequantized vectors:
    # the per-vector scales cancel, so similarity search needs no
    # dequantization
    joined = q.alias("a").join(
        q.alias("b"), F.col("a.vec_id") < F.col("b.vec_id")
    ).limit(200)
    codes_a = F.transform(F.col("a.q_codes"), lambda c: c.cast("double"))
    codes_b = F.transform(F.col("b.q_codes"), lambda c: c.cast("double"))
    deq_a = Q.dequantize(F.col("a.q_codes"), F.col("a.q_scale"))
    deq_b = Q.dequantize(F.col("b.q_codes"), F.col("b.q_scale"))
    out = joined.select(
        cosine(codes_a, codes_b).alias("c_codes"),
        cosine(deq_a, deq_b).alias("c_deq"),
    ).collect()
    assert out
    for r in out:
        assert abs(r["c_codes"] - r["c_deq"]) < 1e-9, r
