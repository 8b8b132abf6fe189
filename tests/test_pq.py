"""Product quantization: deterministic codebooks, ADC recall floor,
and near-exact recall with shortlist re-ranking."""

from __future__ import annotations

import pytest

from biglake_iceberg_pipeline_spark.operators import pq, similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(emb):
    return pq.train_pq_codebooks(emb, "embedding", m=16, k=32)


def _truth(emb, q, k=10):
    return [
        r["vec_id"]
        for r in similarity.brute_force_topk(
            emb, "vec_id", "embedding", q, k=k
        ).collect()
    ]


def test_pq_codebooks_deterministic(emb):
    a = pq.train_pq_codebooks(emb, "embedding", m=8, k=16)
    b = pq.train_pq_codebooks(emb, "embedding", m=8, k=16)
    assert a == b  # no RNG anywhere in the fit


def test_pq_codes_shape_and_self_nearest(spark, emb, books):
    codes = pq.pq_encode(emb, "vec_id", "embedding", books)
    rows = codes.collect()
    assert all(len(r["pq_code"]) == 16 for r in rows)  # m bytes/vector
    # a vector's own code must rank it at (or effectively at) the top
    q = emb.where("vec_id = 3").select("embedding").first()[0]
    top = pq.pq_topk(codes, "vec_id", books, list(q), k=3).collect()
    assert 3 in [r["vec_id"] for r in top]


def test_pq_adc_recall_floor(emb, books):
    codes = pq.pq_encode(emb, "vec_id", "embedding", books)
    recalls = []
    for qid in (7, 42, 123):
        q = list(emb.where(f"vec_id = {qid}").select("embedding").first()[0])
        got = {
            r["vec_id"]
            for r in pq.pq_topk(codes, "vec_id", books, q, k=10).collect()
        }
        recalls.append(len(got & set(_truth(emb, q))) / 10)
    # 16 bytes/vector (16x compression): raw ADC keeps the majority
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_pq_rerank_recovers_exact(emb, books):
    for qid in (7, 42):
        q = list(emb.where(f"vec_id = {qid}").select("embedding").first()[0])
        got = [
            r["vec_id"]
            for r in pq.pq_topk_rerank(
                emb, "vec_id", "embedding", books, q, k=10, shortlist=100
            ).collect()
        ]
        truth = _truth(emb, q)
        # shortlist 10x the k: re-ranked results ≈ exact search
        assert len(set(got) & set(truth)) >= 9, (got, truth)
        assert got[0] == truth[0]  # the top hit is exact
