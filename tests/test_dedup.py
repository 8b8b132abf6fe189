"""Dedup-family tests with planted duplicates — the correctness pin
for the xxhash-based ops (MinHash/SimHash) that have no SQL oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-word edit → near-dup
FAR = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, BASE), (3, NEAR), (4, FAR)]
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs, "id", "text").collect()
    by_copies = {r["n_copies"]: r for r in out}
    assert len(out) == 3  # BASE counted once
    assert by_copies[2]["keep_id"] == 1


def test_minhash_finds_planted_near_dup(spark, docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, "id", "text", num_hashes=64, bands=16, threshold=0.5
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found  # identical docs always collide
    assert (1, 3) in found or (2, 3) in found  # near-dup caught
    assert not any(4 in p for p in found)  # unrelated doc untouched
    exact = next(r for r in pairs if (r["id_a"], r["id_b"]) == (1, 2))
    assert exact["est_jaccard"] == 1.0


def test_simhash_finds_planted_near_dup(spark, docs):
    pairs = dedup.simhash_pairs(docs, "id", "text", max_hamming=10).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(1, 2)] == 0  # identical → identical signature
    assert (1, 3) in found  # near-dup within hamming 10
    assert (1, 4) not in found and (2, 4) not in found


def test_ngram_jaccard_exact_scores(spark, docs):
    d = docs.withColumn("part", F.lit("x"))
    pairs = dedup.ngram_jaccard_pairs(
        d, "id", "text", "part", n=3, threshold=0.5
    ).collect()
    scores = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert scores[(1, 2)] == 1.0
    assert 0.8 <= scores[(1, 3)] < 1.0
    assert (1, 4) not in scores


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], "a"),
        (2, [0.99, 0.1, 0.0], "a"),
        (3, [0.0, 1.0, 0.0], "a"),
        (4, [1.0, 0.0, 0.0], "b"),  # other bucket — never paired
    ]
    df = spark.createDataFrame(
        rows, "id long, vec array<double>, bucket string"
    )
    pairs = dedup.embedding_near_dup_pairs(
        df, "id", "vec", "bucket", threshold=0.9
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert found == {(1, 2)}


def test_flag_duplicates_marks_all_but_first(spark):
    from biglake_iceberg_pipeline_spark.operators.medallion import (
        flag_duplicates,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k int, v string"
    )
    out = flag_duplicates(df).collect()
    assert sum(r["is_duplicate_in_file"] for r in out) == 1
