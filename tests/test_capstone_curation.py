"""Round-5 capstone: the new pieces COMPOSE into the incremental
corpus-growth flow a training pipeline actually runs —

  standing corpus + new batch
    → incremental exact dedup against a persisted hash index
    → accepted rows exported as deterministic training shards
    → embeddings served through a compressed IVF-PQ index

Each stage's output feeds the next; the assertions tie them together
(accepted counts = shard totals, probe hits come from accepted ids).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import dedup, pq
from biglake_iceberg_pipeline_spark.operators import vector_index as vi
from biglake_iceberg_pipeline_spark.sinks import shards
from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable

SF = "/root/testdata/sf0.001"


def test_incremental_corpus_growth_capstone(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    corpus = docs.where("doc_id % 4 != 0")
    batch = docs.where("doc_id % 4 = 0")

    # 1. persisted hash index from the standing corpus; batch checked
    idx = LakehouseTable(str(tmp_path / "hash_idx"))
    idx.append(
        corpus.groupBy(F.md5("text").alias("content_hash")).agg(
            F.min("doc_id").alias("corpus_keep_id")
        )
    )
    verdicts = dedup.incremental_exact_dedup_vs_index(
        idx.read(spark), batch, "doc_id", "text"
    )
    accepted = verdicts.where(F.col("verdict") == "new")
    n_accepted = accepted.count()
    assert 0 < n_accepted <= batch.count()
    # index grows by exactly the accepted distinct contents
    before = idx.read(spark).count()
    idx.append(
        accepted.where(F.col("content_hash").isNotNull()).select(
            "content_hash", F.col("keep_id").alias("corpus_keep_id")
        )
    )
    assert idx.read(spark).count() == before + n_accepted

    # 2. accepted docs packed into training sequences (r6), then
    # exported as shards BY SEQUENCE so each shard holds whole
    # sequences; totals must tie through both stages
    from biglake_iceberg_pipeline_spark.operators.packing import (
        pack_sequences,
    )
    from biglake_iceberg_pipeline_spark.operators.text import token_counts

    accepted_docs = docs.join(
        F.broadcast(accepted.select("doc_id")), "doc_id"
    )
    ws, _bpe = token_counts(F.col("text"))
    packed = pack_sequences(
        accepted_docs.select("doc_id", ws.alias("n_tokens")),
        "doc_id",
        "n_tokens",
        cap=512,
    )
    assert packed.count() == n_accepted
    m = shards.write_training_shards(
        packed, str(tmp_path / "shards"), n_shards=4,
        id_col="seq_id", sum_col="n_tokens",
    )
    assert m["total_rows"] == n_accepted
    assert sum(s["rows"] for s in m["shards"].values()) == n_accepted
    # whole-sequence shards: a sequence never splits across shards
    seen: dict[int, int] = {}
    for k in range(4):
        for r in shards.read_shard(spark, str(tmp_path / "shards"), k).collect():
            assert seen.setdefault(r["seq_id"], k) == k

    # 3. accepted embeddings into an IVF-PQ index; a probe returns
    # only accepted ids, top hit exact
    acc_emb = emb.join(
        F.broadcast(accepted.select(F.col("doc_id").alias("vec_id"))),
        "vec_id",
    )
    books = pq.train_pq_codebooks(acc_emb, "embedding", m=16, k=16)
    vi.build_ivf_index_pq(
        acc_emb, str(tmp_path / "ivfpq"), "vec_id", "embedding",
        books, planes=2,
    )
    some_id = acc_emb.select("vec_id").first()[0]
    q = list(
        acc_emb.where(F.col("vec_id") == some_id)
        .select("embedding")
        .first()[0]
    )
    hits = vi.ivf_probe_pq(
        spark, str(tmp_path / "ivfpq"), "vec_id", q, k=5,
        rerank_source=acc_emb, vec_col="embedding",
    ).collect()
    assert hits[0]["vec_id"] == some_id and hits[0]["cosine"] == 1.0
    accepted_ids = {r["doc_id"] for r in accepted.collect()}
    assert all(r["vec_id"] in accepted_ids for r in hits)
