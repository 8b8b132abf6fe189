"""Corpus-trained BPE tokenizer: training determinism, exact encode
semantics, distributed application, compression property."""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import bpe


def test_encode_word_follows_merge_ranks():
    ranks = {("l", "o"): 0, ("lo", "w" + bpe._EOW): 1}
    assert bpe.encode_word("low", ranks) == ["low" + bpe._EOW]
    # unknown word: no merges apply -> one symbol per char (+EOW glued)
    assert bpe.encode_word("xyz", ranks) == ["x", "y", "z" + bpe._EOW]
    # lower shares the 'lo' merge but not the word-final one
    assert bpe.encode_word("lower", ranks)[0] == "lo"


def test_training_learns_frequent_pairs_deterministically(spark):
    docs = spark.createDataFrame(
        [(i, "the thermal theme there " * 5) for i in range(20)],
        "doc_id long, text string",
    )
    m1 = bpe.train_bpe_merges(docs, "text", n_merges=10, sample_docs=20)
    m2 = bpe.train_bpe_merges(docs, "text", n_merges=10, sample_docs=20)
    assert m1 == m2 and len(m1) == 10
    # 'th' dominates this corpus: it must be among the first merges
    assert ("t", "h") in m1[:3]


def test_corpus_token_counts_end_to_end(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    out = bpe.corpus_token_counts(
        docs, "doc_id", "text", n_merges=100, sample_docs=100
    )
    rows = {r["doc_id"]: r["bpe_tokens"] for r in out.collect()}
    assert len(rows) == 200 and all(n >= 1 for n in rows.values())
    # without merges every word costs ~len(word) symbols; 100 trained
    # merges must compress the corpus strictly
    base = {
        r["doc_id"]: r["bpe_tokens"]
        for r in docs.select(
            "doc_id",
            bpe.bpe_token_count(F.col("text"), []).alias("bpe_tokens"),
        ).collect()
    }
    assert sum(rows.values()) < sum(base.values())
    # and never below the whitespace word count (a word is >= 1 token)
    words = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n"),
        ).collect()
    }
    assert all(rows[d] >= words[d] for d in rows)
