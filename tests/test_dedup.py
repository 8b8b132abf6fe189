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


def test_incremental_exact_dedup_verdicts(spark):
    corpus = spark.createDataFrame(
        [(10, BASE), (11, FAR)], "id long, text string"
    )
    batch = spark.createDataFrame(
        [(20, BASE), (21, NEAR), (22, NEAR), (23, "fresh text")],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in dedup.incremental_exact_dedup(
            corpus, batch, "id", "text"
        ).collect()
    }
    assert out[20]["verdict"] == "corpus_dup" and out[20]["keep_id"] == 10
    assert out[21]["verdict"] == "new" and out[21]["keep_id"] == 21
    assert out[22]["verdict"] == "batch_dup" and out[22]["keep_id"] == 21
    assert out[23]["verdict"] == "new"


def test_incremental_dedup_persisted_index_roundtrip(spark, tmp_path):
    """The 100 TB shape: the corpus hash index lives in a lakehouse
    table; each accepted batch appends its 'new' hashes so the next
    batch's check never rescans corpus text."""
    from biglake_iceberg_pipeline_spark.sinks.lakehouse import LakehouseTable

    corpus = spark.createDataFrame(
        [(10, BASE), (11, FAR)], "id long, text string"
    )
    idx = LakehouseTable(str(tmp_path / "dedup_idx"))
    idx.append(
        corpus.groupBy(F.md5("text").alias("content_hash")).agg(
            F.min("id").alias("corpus_keep_id")
        )
    )
    batch1 = spark.createDataFrame(
        [(20, BASE), (21, NEAR)], "id long, text string"
    )
    out1 = dedup.incremental_exact_dedup_vs_index(
        idx.read(spark), batch1, "id", "text"
    )
    rows1 = {r["id"]: r["verdict"] for r in out1.collect()}
    assert rows1 == {20: "corpus_dup", 21: "new"}
    # accept batch1: its new hashes extend the index
    idx.append(
        out1.where(F.col("verdict") == "new").select(
            "content_hash", F.col("keep_id").alias("corpus_keep_id")
        )
    )
    # NEAR re-arrives in batch2 → now a corpus_dup of 21
    batch2 = spark.createDataFrame([(30, NEAR)], "id long, text string")
    row2 = dedup.incremental_exact_dedup_vs_index(
        idx.read(spark), batch2, "id", "text"
    ).collect()[0]
    assert row2["verdict"] == "corpus_dup" and row2["keep_id"] == 21


def test_incremental_minhash_probe_matches_full_lsh(spark, docs):
    """A batch probe against persisted corpus signatures finds the
    same cross-set candidates as the full self-join would."""
    corpus = docs.where(F.col("id").isin(1, 4))  # BASE + FAR
    batch = spark.createDataFrame(
        [(50, NEAR), (51, "unrelated words entirely about nothing")],
        "id long, text string",
    )
    corpus_sigs = dedup.minhash_signatures(corpus, "id", "text", 64)
    cand = dedup.incremental_minhash_candidates(
        corpus_sigs, batch, "id", "text", num_hashes=64, bands=16
    ).collect()
    pairs = {(r["batch_id"], r["corpus_id"]) for r in cand}
    assert (50, 1) in pairs  # near-dup of corpus BASE found
    assert all(c != 4 or b != 51 for b, c in pairs)  # no false FAR hit


def test_flag_duplicates_marks_all_but_first(spark):
    from biglake_iceberg_pipeline_spark.operators.medallion import (
        flag_duplicates,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k int, v string"
    )
    out = flag_duplicates(df).collect()
    assert sum(r["is_duplicate_in_file"] for r in out) == 1


def test_ngram_jaccard_array_path_equals_bitmap_path(spark, monkeypatch):
    """The large-vocabulary verify (two-level dense ids + sorted int
    arrays) must return exactly what the bitmap path returns — force
    it by dropping the switch threshold to 0."""
    from biglake_iceberg_pipeline_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(200)
    want = sorted(
        map(
            tuple,
            D.ngram_jaccard_pairs(
                docs, "doc_id", "text", "source", 3, 0.5
            ).collect(),
        )
    )
    monkeypatch.setattr(D, "BITMAP_VOCAB_MAX", 0)
    got = sorted(
        map(
            tuple,
            D.ngram_jaccard_pairs(
                docs, "doc_id", "text", "source", 3, 0.5
            ).collect(),
        )
    )
    assert got == want and want  # non-trivial and identical


def test_excise_duplicate_spans_semantics(spark):
    """Exact substring dedup: a 5-word span shared by two docs is cut
    from BOTH (every occurrence, including a repeat within one doc);
    unique text survives; docs shorter than k are untouched; a doc
    that is entirely boilerplate comes back empty."""
    from biglake_iceberg_pipeline_spark.operators.dedup import (
        excise_duplicate_spans,
    )

    boiler = "all rights reserved by the publisher"  # 6 words
    rows = [
        (1, f"alpha beta gamma {boiler} delta"),
        (2, f"{boiler} epsilon zeta eta theta iota"),
        (3, "totally unique words nothing shared here at all"),
        (4, "tiny doc"),  # < k words
        (5, boiler),  # pure boilerplate
    ]
    out = {
        r["doc_id"]: r
        for r in excise_duplicate_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            k=5,
        ).collect()
    }
    # every word of the shared 6-word span is covered by one of its
    # two 5-gram windows -> fully excised from all three docs
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[1]["n_removed"] == 6
    assert out[2]["clean_text"] == "epsilon zeta eta theta iota"
    assert out[2]["n_removed"] == 6
    assert out[3]["clean_text"] == rows[2][1]
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "tiny doc"
    assert out[4]["n_removed"] == 0
    assert out[5]["clean_text"] == ""
    assert out[5]["n_removed"] == 6
    assert all(
        r["n_words"]
        == len(r["clean_text"].split()) + r["n_removed"]
        for r in out.values()
        if r["clean_text"]
    )


def test_excise_duplicate_spans_within_doc_repeat_not_cut_alone(spark):
    """min_doc_freq counts DISTINCT documents: a span repeated inside
    one doc but appearing nowhere else is NOT boilerplate (document-
    internal repetition is text_repetition's job)."""
    from biglake_iceberg_pipeline_spark.operators.dedup import (
        excise_duplicate_spans,
    )

    span = "one two three four five"
    rows = [(1, f"{span} filler words {span}"), (2, "other doc entirely")]
    out = {
        r["doc_id"]: r
        for r in excise_duplicate_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            k=5,
        ).collect()
    }
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == rows[0][1]


def test_dedup_paragraphs_first_occurrence_survives(spark):
    """CCNet paragraph dedup: a paragraph repeated across documents
    survives only at its first (doc_id, pos) occurrence; within-doc
    repeats collapse too; a doc of only repeats rebuilds to ''."""
    from biglake_iceberg_pipeline_spark.operators.dedup import (
        dedup_paragraphs,
    )

    boiler = "all rights reserved"
    df = spark.createDataFrame(
        [
            (1, f"intro one\n\n{boiler}\n\nbody one"),
            (2, f"{boiler}\n\nbody two\n\n{boiler}"),
            (3, boiler),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_paragraphs"], r["n_kept"], r["text_dedup"])
        for r in dedup_paragraphs(df, "doc_id", "text").collect()
    }
    assert got[1] == (3, 3, f"intro one\n\n{boiler}\n\nbody one")
    assert got[2] == (3, 1, "body two")
    assert got[3] == (1, 0, "")
    # determinism across partitionings
    got2 = {
        r["doc_id"]: (r["n_paragraphs"], r["n_kept"], r["text_dedup"])
        for r in dedup_paragraphs(
            df.repartition(5), "doc_id", "text"
        ).collect()
    }
    assert got == got2


def test_ngram_jaccard_positional_filter_lossless(spark):
    """The PPJoin positional prefix filter (r13 optimization) must be
    LOSSLESS: the filtered candidate join returns exactly the pairs a
    brute-force all-pairs exact Jaccard finds, at several thresholds,
    on a corpus engineered with heavy shared-prefix collisions (many
    docs built from one base alphabet, so candidate pairs share many
    prefix grams — the regime the filter actually prunes in)."""
    import itertools
    import random

    rng = random.Random(13)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i in range(40):
        base = [words[rng.randrange(len(words))] for _ in range(12)]
        if i % 3 == 0 and rows:
            # mutate a previous doc: near-dup with shifted positions
            prev = rows[rng.randrange(len(rows))][1].split()
            k = rng.randrange(1, 3)
            for _ in range(k):
                prev[rng.randrange(len(prev))] = words[
                    rng.randrange(len(words))
                ]
            text = " ".join(prev)
        else:
            text = " ".join(base)
        rows.append((i, text))
    docs = spark.createDataFrame(rows, "id long, text string").withColumn(
        "part", F.lit("p")
    )

    def grams(t, n=3):
        t = t.lower()
        m = max(len(t) - (n - 1), 1)
        return set(t[i : i + n] for i in range(m))

    gsets = {i: grams(t) for i, t in rows}
    for threshold in (0.5, 0.7, 0.9):
        expect = set()
        for a, b in itertools.combinations(sorted(gsets), 2):
            inter = len(gsets[a] & gsets[b])
            union = len(gsets[a] | gsets[b])
            if round(inter / union, 4) >= threshold:
                expect.add((a, b))
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.ngram_jaccard_pairs(
                docs, "id", "text", "part", n=3, threshold=threshold
            ).collect()
        }
        assert got == expect, (
            f"threshold {threshold}: got {len(got)} pairs, "
            f"expected {len(expect)}"
        )


def test_ngram_jaccard_partitioning_invariant(spark, tmp_path):
    """The r13 spread + prefix-token pin must be INVISIBLE in the
    output: the exact pair set (ids AND jaccard values) is identical
    whether the corpus scans as one file-backed partition (the local
    single-file case `_spread` re-spreads) or arrives pre-split —
    repartitioning and the localCheckpoint barrier are placement-only
    transforms, never content transforms."""
    rows = [
        (i, ("lorem ipsum dolor sit amet " * 3) + f"tail {i % 7}", "s")
        for i in range(60)
    ]
    one = str(tmp_path / "one")
    spark.createDataFrame(
        rows, "id long, text string, part string"
    ).coalesce(1).write.parquet(one)
    docs_one = spark.read.parquet(one)
    assert len(docs_one.inputFiles()) == 1  # the re-spread regime
    many = str(tmp_path / "many")
    spark.createDataFrame(
        rows, "id long, text string, part string"
    ).repartition(16).write.parquet(many)
    docs_many = spark.read.parquet(many)

    def as_set(df):
        return {
            (r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()
        }

    a = as_set(
        dedup.ngram_jaccard_pairs(
            docs_one, "id", "text", "part", n=3, threshold=0.6
        )
    )
    b = as_set(
        dedup.ngram_jaccard_pairs(
            docs_many, "id", "text", "part", n=3, threshold=0.6
        )
    )
    assert a == b and a  # identical, and non-trivially non-empty
