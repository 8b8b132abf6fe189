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


def test_pq_rejects_k_over_256(emb):
    with pytest.raises(ValueError, match="256"):
        pq.train_pq_codebooks(emb, "embedding", m=8, k=512)
    fake_books = [[[0.0] * 8] * 300] * 8  # 300 centroids/subspace
    with pytest.raises(ValueError, match="256"):
        pq.pq_encode(emb, "vec_id", "embedding", fake_books)


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


def test_ivf_pq_index_probe(spark, tmp_path, emb, books):
    """IVF-PQ: coarse partition pruning + PQ payload. The probe with
    re-ranking matches brute force within the probed partitions; the
    stored payload is the m-byte code (16 bytes/vector), not floats."""
    import pyarrow.parquet as pq_meta

    from biglake_iceberg_pipeline_spark.operators import vector_index as vi

    path = str(tmp_path / "ivfpq")
    vi.build_ivf_index_pq(emb, path, "vec_id", "embedding", books, planes=4)
    q = list(emb.where("vec_id = 42").select("embedding").first()[0])
    got = vi.ivf_probe_pq(
        spark, path, "vec_id", q, k=5, nprobe_hamming=1,
        rerank_source=emb, vec_col="embedding",
    ).collect()
    assert got[0]["vec_id"] == 42 and got[0]["cosine"] == 1.0
    assert len(got) == 5
    # ADC-only probe works and is ascending
    # planes comes from the index sidecar — no caller mismatch possible
    adc = vi.ivf_probe_pq(
        spark, path, "vec_id", q, k=5, nprobe_hamming=1
    ).collect()
    assert adc[0]["vec_id"] == 42
    dists = [r["adc_dist"] for r in adc]
    assert dists == sorted(dists)
    # payload check: pq_code column chunks are ~m bytes/row, far
    # below a float array layout (~4*dim plus levels)
    import glob
    import os

    total_code_bytes = 0
    total_rows = 0
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        meta = pq_meta.ParquetFile(f).metadata
        total_rows += meta.num_rows
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                if col.path_in_schema == "pq_code":
                    total_code_bytes += col.total_uncompressed_size
    assert total_rows == 500
    assert total_code_bytes / total_rows < 64  # ≪ 4*64 float bytes


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


def test_pq_train_guards(spark, emb):
    # sample smaller than k: clear error, not duplicate centroids
    with pytest.raises(ValueError, match="< k"):
        pq.train_pq_codebooks(emb, "embedding", m=8, k=32, sample_n=5)
    # empty / all-null input: clear error, not a shape-unpack crash
    empty = emb.where("vec_id < 0")
    with pytest.raises(ValueError, match="no non-null"):
        pq.train_pq_codebooks(empty, "embedding", m=8, k=4)


def test_kmeans_ivf_pq_index_probe(spark, tmp_path, emb, books):
    """Trained-coarse IVF-PQ (FAISS's IVFPQ composition, the r12
    audit-driven replacement for sign-bit coarse on this corpus):
    k-means cell pruning is plan-visible, the payload stays m
    bytes/row, re-ranked recall clears the registered audit floor."""
    import glob
    import os

    import pyarrow.parquet as pq_meta

    from biglake_iceberg_pipeline_spark.operators import vector_index as vi

    path = str(tmp_path / "kivfpq")
    cents = vi.build_kmeans_ivf_index_pq(
        emb, path, "vec_id", "embedding", books, n_centroids=16
    )
    assert len(cents) == 16
    q = list(emb.where("vec_id = 42").select("embedding").first()[0])
    probe = vi.kmeans_ivf_probe_pq(
        spark, path, "vec_id", q, k=10, nprobe=4,
        rerank_source=emb, vec_col="embedding",
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # pruned cells, not a full scan
    got = [r["vec_id"] for r in probe.collect()]
    assert got[0] == 42  # own vector's cell is always probed first
    truth = _truth(emb, q)
    assert len(set(got) & set(truth)) / 10 >= 0.5, (got, truth)
    # ADC-only probe: ascending distances, no float payload read
    adc = vi.kmeans_ivf_probe_pq(spark, path, "vec_id", q, k=5, nprobe=4)
    dists = [r["adc_dist"] for r in adc.collect()]
    assert dists == sorted(dists)
    # payload bound: pq_code column ~m bytes/row (16x under floats)
    total_code_bytes = 0
    total_rows = 0
    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        meta = pq_meta.ParquetFile(f).metadata
        total_rows += meta.num_rows
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for c in range(g.num_columns):
                col = g.column(c)
                if col.path_in_schema == "pq_code":
                    total_code_bytes += col.total_uncompressed_size
    assert total_rows > 0
    assert total_code_bytes / total_rows < 64
