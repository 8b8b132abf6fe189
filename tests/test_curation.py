"""PII redaction, repetition features, deterministic hash sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators.sampling import (
    hash_threshold,
    mixture_sample,
    sample_by_hash,
)
from biglake_iceberg_pipeline_spark.operators.text import (
    redact_pii,
    repetition_features,
)
from biglake_iceberg_pipeline_spark.sources.catalog import load_table


def test_redact_pii_planted_strings(spark):
    rows = [
        ("reach me at bob.smith+spam@corp.example.org today", "email"),
        ("server 192.168.0.17 is down", "ip"),
        ("call +1 (555) 123-4567", "phone_spaces"),
        ("call +15551234567 now", "phone"),
        ("no pii here at all", "clean"),
    ]
    df = spark.createDataFrame(rows, "text string, kind string")
    got = {
        r.kind: r.red
        for r in df.select("kind", redact_pii(F.col("text")).alias("red")).collect()
    }
    assert got["email"] == "reach me at [PII] today"
    assert got["ip"] == "server [PII] is down"
    assert got["phone"] == "call [PII] now"
    assert "[PII]" in got["phone_spaces"]
    assert got["clean"] == "no pii here at all"


def test_repetition_features_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "x x y y")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_features(df, "doc_id", "text").collect()}
    assert got[1].dup_word_frac == 0.75 and got[1].top_word_ratio == 1.0
    assert got[2].dup_word_frac == 0.0 and got[2].top_word_ratio == 0.25
    assert got[3].dup_word_frac == 0.5 and got[3].top_word_ratio == 0.5


def test_hash_threshold_edges():
    assert hash_threshold(0.0) == "00000000"
    assert hash_threshold(1.0) == "g"  # sorts after every hex digit
    assert hash_threshold(0.5) == "80000000"


def test_sample_by_hash_fraction_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s1 = sample_by_hash(docs, "doc_id", 0.5)
    k1 = {r.doc_id for r in s1.select("doc_id").collect()}
    # determinism: same keys regardless of partitioning
    k2 = {
        r.doc_id
        for r in sample_by_hash(docs.repartition(7), "doc_id", 0.5)
        .select("doc_id")
        .collect()
    }
    assert k1 == k2
    assert abs(len(k1) / n - 0.5) < 0.15  # binomial noise at n=500


def test_hash_samples_are_nested(spark, sf_dir):
    # prefix < t is monotone in t ⇒ sample(0.2) ⊆ sample(0.6): growing
    # the mixture rate only ADDS documents, never reshuffles them.
    docs = load_table(spark, sf_dir, "documents")
    small = {r.doc_id for r in sample_by_hash(docs, "doc_id", 0.2).collect()}
    big = {r.doc_id for r in sample_by_hash(docs, "doc_id", 0.6).collect()}
    assert small <= big


def test_mixture_sample_rates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_sample(
        docs, "source", "doc_id", {"src0": 1.0, "src1": 0.0}, 0.0
    )
    by_src = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    total_src0 = docs.where(F.col("source") == "src0").count()
    assert by_src.get("src0") == total_src0  # fraction 1.0 keeps all
    assert "src1" not in by_src  # fraction 0.0 drops all
    assert set(by_src) == {"src0"}  # default 0.0 drops the rest


def test_chunk_documents_windows_and_overlap(spark):
    import pytest

    from biglake_iceberg_pipeline_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, "")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_chars=6, overlap=2)
    got = {
        (r.doc_id, r.chunk_id): (r.start, r.chunk_text)
        for r in out.collect()
    }
    # doc 1: starts 1,5,9 → windows abcdef / efghij / ij
    assert got[(1, 0)] == (1, "abcdef")
    assert got[(1, 1)] == (5, "efghij")
    assert got[(1, 2)] == (9, "ij")
    assert got[(2, 0)] == (1, "xy")  # shorter than one window
    assert got[(3, 0)] == (1, "")  # empty doc still yields one chunk
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", chunk_chars=4, overlap=4)


def test_corpus_vocabulary_top_tokens(spark):
    from biglake_iceberg_pipeline_spark.operators.text import (
        corpus_vocabulary,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat"),
            (3, "cat cat cat"),
        ],
        "doc_id long, text string",
    )
    out = corpus_vocabulary(docs, "text", k=3).collect()
    assert [(r["token"], r["n_occurrences"], r["doc_freq"]) for r in out] == [
        ("cat", 4, 2),
        ("the", 3, 2),
        ("sat", 2, 2),
    ]
    # cumulative coverage is monotone and ends at (4+3+2)/12
    cov = [r["cum_coverage"] for r in out]
    assert cov == sorted(cov)
    assert abs(cov[-1] - 9 / 12) < 1e-9


def test_decontaminate_drops_eval_overlap_keeps_short_docs(spark):
    """decontaminate drops a training doc sharing any eval 3-gram
    (min_hits=1) and NULL-safely KEEPS docs too short to have grams
    (0/0 contamination is clean, not three-valued-logic-dropped)."""
    from biglake_iceberg_pipeline_spark.operators.text import decontaminate

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "something with the quick brown fox inside it"),
            (2, "completely different words appear here"),
            (3, "tiny"),  # < n words: zero grams, must survive
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(
            train, eval_df, "doc_id", "text", n=3, min_hits=1
        ).collect()
    )
    assert kept == [2, 3]


def test_decontaminate_default_is_governed_by_max_frac(spark):
    """At defaults min_hits is DISABLED, so max_frac actually
    governs: a long doc sharing one eval 3-gram out of many survives
    max_frac=0.5 (frac ≈ 0.08) even though n_contaminated >= 1 —
    the old min_hits=1 default dropped every such doc, making
    max_frac tuning a no-op."""
    from biglake_iceberg_pipeline_spark.operators.text import decontaminate

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    long_doc = (
        "many unrelated filler words continue onward across this "
        "sentence while the quick brown appears exactly once here"
    )
    train = spark.createDataFrame(
        [(1, long_doc), (2, "the quick brown fox jumps high")],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(
            train, eval_df, "doc_id", "text", n=3, max_frac=0.5
        ).collect()
    )
    # doc 1: 1 contaminated gram / ~16 grams ≈ 0.06 < 0.5 → kept;
    # doc 2: 3/4 grams contaminated = 0.75 > 0.5 → dropped
    assert kept == [1]


def test_cap_per_group_deterministic_and_prefilter_consistent(spark):
    """cap_per_group: exactly min(quota, n_g) rows per group, selection
    invariant to physical partitioning, and the hash-gate prefilter
    keeps the SAME selection when it retains at least quota rows (the
    composition property: rank order is hash order)."""
    from biglake_iceberg_pipeline_spark.operators.sampling import (
        cap_per_group,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(90)] + [(1000, "tiny")],
        "id long, grp string",
    )
    a = cap_per_group(df, "grp", "id", 5)
    sel_a = sorted((r["grp"], r["id"], r["sel_rank"]) for r in a.collect())
    counts = {}
    for g, _i, _r in sel_a:
        counts[g] = counts.get(g, 0) + 1
    assert counts == {"g0": 5, "g1": 5, "g2": 5, "tiny": 1}
    # partitioning invariance
    b = cap_per_group(df.repartition(7), "grp", "id", 5)
    assert sel_a == sorted(
        (r["grp"], r["id"], r["sel_rank"]) for r in b.collect()
    )
    # generous prefilter (keeps ~half of each 30-row group >= quota
    # 5): identical selection for those groups. The 1-row 'tiny'
    # group is the documented under-gating mode (its row may fall
    # above the gate) — excluded from the equality.
    c = cap_per_group(df, "grp", "id", 5, prefilter_fraction=0.5)
    big = lambda sel: [t for t in sel if t[0] != "tiny"]  # noqa: E731
    assert big(sel_a) == big(
        sorted((r["grp"], r["id"], r["sel_rank"]) for r in c.collect())
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="quota"):
        cap_per_group(df, "grp", "id", 0)


def test_ccnet_ppl_buckets_tercile_properties(spark):
    """Per-language terciles: bucket sizes within 1 of each other,
    and every head score <= every tail score inside a language (the
    CCNet head/middle/tail contract)."""
    from biglake_iceberg_pipeline_spark.plans.curation import (
        ccnet_ppl_buckets,
    )

    out = ccnet_ppl_buckets(spark, "/root/testdata/sf0.001").collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(
            (r["ppl_bucket"], r["avg_neg_logprob"])
        )
    assert len(by_lang) >= 3
    for lang, rows in by_lang.items():
        sizes = {
            b: sum(1 for x, _ in rows if x == b)
            for b in ("head", "middle", "tail")
        }
        assert max(sizes.values()) - min(sizes.values()) <= 1, (
            lang,
            sizes,
        )
        heads = [s for b, s in rows if b == "head"]
        tails = [s for b, s in rows if b == "tail"]
        assert max(heads) <= min(tails), lang


def test_token_budget_sample_semantics(spark):
    """Packing-until-full semantics: docs pack in md5-hash order, the
    boundary doc is kept, later docs are cut; a budget smaller than
    the first doc still yields exactly that doc; budget 0 yields
    nothing; selection is partition-invariant."""
    from biglake_iceberg_pipeline_spark.operators.sampling import (
        token_budget_sample,
    )

    rows = [(i, "a" if i % 2 == 0 else "b", 10 + i % 3) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, src string, toks long")
    kept = token_budget_sample(
        df, "src", "doc_id", "toks", {"a": 55, "b": 0}, 0
    ).collect()
    a = sorted(
        (r["cum_tokens"], r["doc_id"]) for r in kept if r["src"] == "a"
    )
    assert not [r for r in kept if r["src"] == "b"]  # zero budget
    # boundary doc kept: last cum crosses 55, the one before is < 55
    assert a[-1][0] >= 55 and (len(a) == 1 or a[-2][0] < 55)
    # tiny budget -> exactly the first hash-ordered doc
    one = token_budget_sample(
        df, "src", "doc_id", "toks", {"a": 1}, 0
    ).collect()
    assert len(one) == 1 and one[0]["src"] == "a"
    # partition invariance
    kept2 = token_budget_sample(
        df.repartition(7), "src", "doc_id", "toks", {"a": 55, "b": 0}, 0
    ).collect()
    assert sorted(r["doc_id"] for r in kept2) == sorted(
        r["doc_id"] for r in kept
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budgets"):
        token_budget_sample(df, "src", "doc_id", "toks", {"a": -1}, 0)


def test_gopher_rules_planted_violations(spark):
    """Each Gopher rule fires on a purpose-built document and the
    clean document passes all seven (the driver corpus never
    exercises bullets/ellipses — these plants do)."""
    from biglake_iceberg_pipeline_spark.operators.text import gopher_rules

    prose = (
        "the quick brown fox and the lazy dog have agreed to share "
        "a den of modest size with that other fox so that everyone "
        "can be warm and nobody will have to sleep outside in the "
        "cold night air of the deep north woods this winter season "
        "which everyone agrees is the right thing to do for all"
    )
    docs = spark.createDataFrame(
        [
            (1, prose),                                   # clean
            (2, "short text"),                            # too few words
            (3, " ".join(["x" * 20] * 60)),               # word len > 10
            (4, " ".join(["# ok"] * 60)),                 # symbol soup
            (5, "\n".join(["- item " + "w " * 9] * 10)),  # bullets
            (6, "\n".join(["line one..."] * 10)),         # ellipses
            (7, " ".join(["123"] * 60)),                  # no alpha
            (8, " ".join(["zebra"] * 60)),                # no stopwords
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in gopher_rules(docs, "text").collect()
    }
    assert rows[1]["g_keep"] is True
    assert rows[2]["g_ok_words"] is False
    assert rows[3]["g_ok_word_len"] is False
    assert rows[4]["g_ok_symbols"] is False
    assert rows[5]["g_ok_bullets"] is False
    assert rows[6]["g_ok_ellipsis"] is False
    assert rows[7]["g_ok_alpha"] is False
    assert rows[8]["g_ok_stopwords"] is False
    for d in range(2, 9):
        assert rows[d]["g_keep"] is False


def test_hash_split_stable_under_growth_and_salted(spark):
    """The split property that matters: assignments never move when
    the corpus grows; fractions land near spec; a salt re-deals."""
    from biglake_iceberg_pipeline_spark.operators.sampling import hash_split

    base = spark.range(0, 2000).withColumnRenamed("id", "k")
    grown = spark.range(0, 4000).withColumnRenamed("id", "k")
    a = {r["k"]: r["split"] for r in hash_split(base, "k").collect()}
    b = {r["k"]: r["split"] for r in hash_split(grown, "k").collect()}
    assert all(b[k] == v for k, v in a.items())  # no reassignment
    from collections import Counter

    c = Counter(b.values())
    assert abs(c["train"] / 4000 - 0.9) < 0.03
    assert abs(c["valid"] / 4000 - 0.05) < 0.02
    assert abs(c["test"] / 4000 - 0.05) < 0.02
    s = {
        r["k"]: r["split"]
        for r in hash_split(base, "k", salt="fold2").collect()
    }
    assert any(s[k] != v for k, v in a.items())  # salt re-deals
    import pytest

    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(base, "k", {"train": 0.5, "test": 0.1})


def test_hash_split_null_keys_label_null_not_test(spark):
    """Regression (/code-review r10): NULL keys must surface as a
    NULL split label, not silently contaminate the LAST split."""
    from biglake_iceberg_pipeline_spark.operators.sampling import hash_split

    df = spark.createDataFrame(
        [(1,), (None,), (2,), (None,)], "k long"
    )
    got = {r["k"]: r["split"] for r in hash_split(df, "k").collect()}
    assert got[None] is None
    assert got[1] in ("train", "valid", "test")
