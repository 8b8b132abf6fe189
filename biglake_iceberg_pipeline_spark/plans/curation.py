"""Training-data curation queries: PII redaction, repetition
filtering, deterministic mixture sampling, TF-IDF keywords.

These extend the reference's cleaning surface (its agent scrubs
schema-level mess; a 100 TB text pipeline also scrubs content) with
the curation passes every LLM data pipeline runs before training.
All JVM-side expressions; every query has a full DuckDB oracle.

The PII query PLANTS deterministic PII derived from doc_id (the
synthetic corpus contains none), so the redaction regexes are
exercised identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.operators import text
from biglake_iceberg_pipeline_spark.operators.sampling import (
    cap_per_group,
    hash_split,
    hash_threshold,
    mixture_sample,
)
from biglake_iceberg_pipeline_spark.sources.catalog import load_table


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant an email / IPv4 / phone per doc, count and scrub them.
    n_phone also counts the IP (dotted digit runs are phone-shaped) —
    counts are per-pattern match totals, not disjoint classes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 call +1555"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 7, "0"),
        ),
    )
    counts = text.pii_counts(F.col("text"))
    return planted.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
        text.redact_pii(F.col("text")).alias("redacted"),
    )


_EMAIL, _IPV4, _PHONE = (p for _, p in text.PII_PATTERNS)
PII_REDACTION_SQL = rf"""
WITH planted AS (
    SELECT doc_id,
        text || ' contact user' || CAST(doc_id AS VARCHAR)
             || '@example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
             || '.0.1 call +1555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0')
          AS text
    FROM documents
)
SELECT doc_id,
    len(regexp_extract_all(text, '{_EMAIL}')) AS n_email,
    len(regexp_extract_all(text, '{_IPV4}')) AS n_ipv4,
    len(regexp_extract_all(text, '{_PHONE}')) AS n_phone,
    regexp_replace(
        regexp_replace(
            regexp_replace(text, '{_EMAIL}', '[PII]', 'g'),
            '{_IPV4}', '[PII]', 'g'),
        '{_PHONE}', '[PII]', 'g') AS redacted
FROM planted
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.repetition_features(docs, "doc_id", "text").orderBy("doc_id")


TEXT_REPETITION_SQL = r"""
WITH w AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
    FROM documents
),
base AS (
    SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct
    FROM w
),
top AS (
    SELECT doc_id, MAX(c) AS top_c FROM (
        SELECT doc_id, word, COUNT(*) AS c FROM (
            SELECT doc_id, unnest(ws) AS word FROM w
        ) GROUP BY doc_id, word
    ) GROUP BY doc_id
)
SELECT base.doc_id AS doc_id, n_words, n_distinct AS n_distinct_words,
    ROUND(1.0 - n_distinct / CAST(n_words AS DOUBLE), 4) AS dup_word_frac,
    ROUND(top_c / CAST(n_words AS DOUBLE), 4) AS top_word_ratio
FROM base JOIN top ON base.doc_id = top.doc_id
ORDER BY doc_id
"""


# The mixture recipe under test: full src0, half src1, quarter src2,
# 10% of everything else — the "books/code/web" weighting shape.
_MIX = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_DEFAULT_FRAC = 0.1


def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    kept = mixture_sample(docs, "source", "doc_id", _MIX, _DEFAULT_FRAC)
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


def _gate_sql(frac: float) -> str:
    return (
        "substr(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 8) "
        f"< '{hash_threshold(frac)}'"
    )


SAMPLE_MIXTURE_SQL = f"""
SELECT source, COUNT(*) AS n_kept
FROM documents
WHERE (source = 'src0' AND {_gate_sql(_MIX["src0"])})
   OR (source = 'src1' AND {_gate_sql(_MIX["src1"])})
   OR (source = 'src2' AND {_gate_sql(_MIX["src2"])})
   OR (source NOT IN ('src0', 'src1', 'src2') AND {_gate_sql(_DEFAULT_FRAC)})
GROUP BY source
ORDER BY source
"""


_BUDGETS = {"src0": 2000, "src1": 1000}
_DEFAULT_BUDGET = 500


def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN-budget mixture (G39,
    operators/sampling.py::token_budget_sample): real pretraining
    mixes are specified in tokens per source, not document fractions
    — 2000 tokens of src0, 1000 of src1, 500 of everything else.
    Docs pack in deterministic md5-hash order until each source's
    budget is spent (the boundary doc is kept); output is the
    per-source allocation audit (docs kept, tokens kept)."""
    from biglake_iceberg_pipeline_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("n_tokens"),
    )
    kept = token_budget_sample(
        docs, "source", "doc_id", "n_tokens", _BUDGETS, _DEFAULT_BUDGET
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").cast("long").alias("tokens_kept"),
        )
        .orderBy("source")
    )


TOKEN_BUDGET_MIXTURE_SQL = rf"""
WITH d AS (
    SELECT doc_id, source,
           len(list_filter(string_split_regex(trim(text), '\s+'),
                           x -> x <> '')) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING
           ) AS cum_tokens
    FROM d
),
kept AS (
    SELECT * FROM c
    WHERE cum_tokens - n_tokens <
          CASE source WHEN 'src0' THEN {_BUDGETS["src0"]}
                      WHEN 'src1' THEN {_BUDGETS["src1"]}
                      ELSE {_DEFAULT_BUDGET} END
)
SELECT source, COUNT(*) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
FROM kept
GROUP BY source
ORDER BY source
"""


_QUOTA = 10


def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota cap (operators/sampling.py::cap_per_group —
    the C4/RefinedWeb 'at most N pages per domain' rule): keep the
    10 deterministically hash-ranked docs per source. One shuffle on
    the source column; selection is md5-rank so it is order- and
    partition-stable and the oracle replays it as a SQL window."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    return (
        cap_per_group(docs, "source", "doc_id", _QUOTA)
        .select(
            "doc_id",
            "source",
            F.col("sel_rank").cast("bigint").alias("sel_rank"),
        )
        .orderBy("doc_id")
    )


SOURCE_QUOTA_SAMPLE_SQL = f"""
SELECT doc_id, source, sel_rank FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS sel_rank
    FROM documents
) WHERE sel_rank <= {_QUOTA}
ORDER BY doc_id
"""


_PARA_WORDS = 10


def dedup_paragraph_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style paragraph dedup
    (operators/dedup.py::dedup_paragraphs) on documents given a
    deterministic paragraph structure: the corpus has no natural
    separators, so each doc is re-laid-out as 10-word blocks joined
    by blank lines (pure codegen, replayed identically in SQL — the
    pii_redaction planting convention), then every distinct
    paragraph survives exactly once corpus-wide (first occurrence by
    (doc_id, position)) and docs rebuild from their survivors."""
    from biglake_iceberg_pipeline_spark.operators.dedup import (
        dedup_paragraphs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(words)
    blocks = F.transform(
        F.sequence(F.lit(0), F.floor((n - 1) / _PARA_WORDS)),
        lambda i: F.concat_ws(
            " ",
            F.slice(
                words, (i * _PARA_WORDS + 1).cast("int"), _PARA_WORDS
            ),
        ),
    )
    synth = docs.select(
        "doc_id", F.array_join(blocks, "\n\n").alias("text")
    )
    return dedup_paragraphs(synth, "doc_id", "text")


DEDUP_PARAGRAPH_CORPUS_SQL = f"""
WITH w AS (
    SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
    FROM documents
),
synth AS (
    SELECT doc_id,
        array_to_string(
            [array_to_string(
                 ws[i * {_PARA_WORDS} + 1 : i * {_PARA_WORDS} + {_PARA_WORDS}],
                 ' ')
             for i in generate_series(0, (len(ws) - 1) // {_PARA_WORDS})],
            chr(10) || chr(10)) AS text
    FROM w
),
pl AS (
    SELECT doc_id, string_split(text, chr(10) || chr(10)) AS parts
    FROM synth
),
paras AS (
    SELECT doc_id, i - 1 AS pos, parts[i] AS para
    FROM pl, unnest(generate_series(1, len(parts))) AS t(i)
),
ranked AS (
    SELECT doc_id, pos, para,
        ROW_NUMBER() OVER (
            PARTITION BY md5(para) ORDER BY doc_id, pos
        ) AS rk
    FROM paras
),
rebuilt AS (
    SELECT doc_id, COUNT(*) AS n_kept,
        string_agg(para, chr(10) || chr(10) ORDER BY pos)
            AS text_dedup
    FROM ranked WHERE rk = 1 GROUP BY doc_id
)
SELECT pl.doc_id AS doc_id,
    len(parts) AS n_paragraphs,
    COALESCE(n_kept, 0)::BIGINT AS n_kept,
    COALESCE(text_dedup, '') AS text_dedup
FROM pl LEFT JOIN rebuilt ON pl.doc_id = rebuilt.doc_id
"""


def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document. Two shuffles total:
    (doc, word) term counts (map-side combined), then word → doc-freq
    joined back broadcast (the vocabulary is tiny next to the corpus —
    at 100 TB still millions of words vs billions of docs). Ranking
    windows over (doc) only. Scores rounded to 6 decimals BEFORE
    ranking so cross-engine ulp noise in ln() can't flip the order;
    remaining ties break on the word itself."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"),
    ).where(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    # (doc_id, word) is distinct after the tf agg and doc_id is the
    # table key, so both "distinct" counts are plain counts — each
    # saves a distinct-expand shuffle.
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    # N from tf, not from a second corpus scan: tf's shuffle exchange
    # is already materialized for df_/scored, so this third consumer
    # reuses it (ReuseExchange) — the raw documents table is scanned
    # exactly once per run. N = docs contributing ≥1 term, which the
    # oracle mirrors.
    n_docs = tf.agg(F.countDistinct("doc_id").alias("n")).scalar()
    scored = tf.join(F.broadcast(df_), "word").withColumn(
        "score",
        F.round(
            F.col("tf") * F.log((n_docs + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
            6,
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc_id", "rank", "word", "score")
        .orderBy("doc_id", "rank")
    )


TFIDF_KEYWORDS_SQL = r"""
WITH words AS (
    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
    FROM documents
),
tf AS (
    SELECT doc_id, word, COUNT(*) AS tf FROM words
    WHERE word <> '' GROUP BY doc_id, word
),
dfreq AS (
    SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word
),
scored AS (
    SELECT doc_id, word, tf,
        ROUND(tf * ln(((SELECT COUNT(DISTINCT doc_id) FROM tf) + 1.0)
                      / (df + 1.0)), 6) AS score
    FROM tf JOIN dfreq USING (word)
),
ranked AS (
    SELECT doc_id, word, score,
        ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, word ASC) AS rank
    FROM scored
)
SELECT doc_id, rank, word, score FROM ranked
WHERE rank <= 3
ORDER BY doc_id, rank
"""


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM negative-logprob per document — the
    CCNet/DataComp-style "perplexity" quality gate, self-trained so no
    external model is needed. p(w) = (c_w + 1) / (total + V) with
    add-one smoothing; a doc's score is its mean −ln p(word) (lower =
    more typical of the corpus).

    One tokenize feeds both passes: word counts (one map-combined
    shuffle — vocab-sized, tiny next to the corpus), broadcast back to
    the token stream, then the per-doc mean (second shuffle on
    doc_id). Scores rounded to 6 decimals so ln() ulp noise can't
    leak into the oracle hash."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"),
    ).where(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    total, vocab = totals.head()
    logp = F.log(
        (F.col("c") + F.lit(1.0)) / F.lit(float(total) + float(vocab))
    )
    scored = words.join(F.broadcast(counts), "word").select(
        "doc_id", (-logp).alias("nll")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("avg_neg_logprob"),
        )
        .orderBy("doc_id")
    )


TEXT_LM_SCORE_SQL = r"""
WITH words AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
    FROM documents
),
tokens AS (SELECT doc_id, word FROM words WHERE word <> ''),
counts AS (SELECT word, COUNT(*) AS c FROM tokens GROUP BY word),
consts AS (SELECT SUM(c) AS total, COUNT(*) AS vocab FROM counts)
SELECT doc_id, COUNT(*) AS n_tokens,
    ROUND(AVG(-ln((c + 1.0) / (total + vocab))), 6) AS avg_neg_logprob
FROM tokens
JOIN counts USING (word)
CROSS JOIN consts
GROUP BY doc_id
ORDER BY doc_id
"""


def ccnet_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity partition (G38; Wenzek et
    al. 2020 arXiv:1911.00359 §4.3): per LANGUAGE, rank documents by
    their corpus-LM negative logprob (G18's score) and cut into
    terciles — 'head' is the most-fluent third kept for training,
    'tail' the discard candidate. The per-lang partition matters:
    perplexity scales differ across languages, so a global cut would
    keep only the easiest language.

    Determinism: the NTILE orders by (rounded score, doc_id) — the
    doc_id tiebreak makes the tercile assignment exact across
    engines and partitionings. Scale: rides the LM scorer's two
    shuffles plus one lang-partitioned window (languages are few,
    but each window partition is corpus-sized/n_langs — at extreme
    skew swap in the two-level rank the packing operator uses)."""
    lm = text_lm_score(spark, sf_dir)
    langs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )
    w = Window.partitionBy("lang").orderBy("avg_neg_logprob", "doc_id")
    tile = F.ntile(3).over(w)
    return (
        lm.join(langs, "doc_id")
        .select(
            "doc_id",
            "lang",
            "avg_neg_logprob",
            F.when(tile == 1, "head")
            .when(tile == 2, "middle")
            .otherwise("tail")
            .alias("ppl_bucket"),
        )
        .orderBy("doc_id")
    )


CCNET_PPL_BUCKETS_SQL = r"""
WITH words AS (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
    FROM documents
),
tokens AS (SELECT doc_id, word FROM words WHERE word <> ''),
counts AS (SELECT word, COUNT(*) AS c FROM tokens GROUP BY word),
consts AS (SELECT SUM(c) AS total, COUNT(*) AS vocab FROM counts),
lm AS (
    SELECT doc_id,
        ROUND(AVG(-ln((c + 1.0) / (total + vocab))), 6)
            AS avg_neg_logprob
    FROM tokens
    JOIN counts USING (word)
    CROSS JOIN consts
    GROUP BY doc_id
),
tiled AS (
    SELECT lm.doc_id, d.lang, lm.avg_neg_logprob,
           NTILE(3) OVER (
               PARTITION BY d.lang
               ORDER BY lm.avg_neg_logprob, lm.doc_id
           ) AS t
    FROM lm JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, avg_neg_logprob,
       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
              ELSE 'tail' END AS ppl_bucket
FROM tiled
ORDER BY doc_id
"""


_CHUNK, _OVERLAP = 200, 40


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character-window chunks per document (the
    embedding-indexer front end)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.chunk_documents(
        docs, "doc_id", "text", _CHUNK, _OVERLAP
    ).orderBy("doc_id", "chunk_id")


DOC_CHUNKS_SQL = f"""
WITH starts AS (
    SELECT doc_id, len(text) AS doc_chars, text,
        unnest(generate_series(1, greatest(1, len(text)),
                               {_CHUNK - _OVERLAP})) AS start
    FROM documents
)
SELECT doc_id, doc_chars,
    (start - 1) // {_CHUNK - _OVERLAP} AS chunk_id,
    start,
    substr(text, start, {_CHUNK}) AS chunk_text
FROM starts
ORDER BY doc_id, chunk_id
"""


def strip_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant HTML around each doc (the corpus is plain text), then
    strip tags / unescape entities / collapse whitespace. Mirrors the
    reference agent's replace_unknown_chars cleaning family, applied
    to web-scrape markup — the first pass over any HTML crawl."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.lit('<div class="doc"><p id="p'),
            F.col("doc_id").cast("string"),
            F.lit('">'),
            F.col("text"),
            F.lit('</p><br/><a href="https://ex.com/'),
            F.col("doc_id").cast("string"),
            F.lit('">link &amp; more</a> &lt;raw&gt; &quot;q&quot;</div>'),
        ),
    )
    return planted.select(
        "doc_id",
        text.markup_tag_count(F.col("text")).alias("n_tags"),
        text.strip_markup(F.col("text")).alias("clean_text"),
    )


_TAG = text.MARKUP_TAG_RE
_ENT_CHAIN = "text"
for _ent, _rep in text.MARKUP_ENTITIES:
    # SQL string literals: escape embedded single quotes as '' (the
    # &#39; -> ' replacement otherwise breaks the DuckDB parser).
    _ent_q = _ent.replace("'", "''")
    _rep_q = _rep.replace("'", "''")
    _ENT_CHAIN = f"replace({_ENT_CHAIN}, '{_ent_q}', '{_rep_q}')"

STRIP_MARKUP_SQL = rf"""
WITH planted AS (
    SELECT doc_id,
        '<div class="doc"><p id="p' || CAST(doc_id AS VARCHAR) || '">'
        || text || '</p><br/><a href="https://ex.com/'
        || CAST(doc_id AS VARCHAR)
        || '">link &amp; more</a> &lt;raw&gt; &quot;q&quot;</div>' AS text
    FROM documents
),
stripped AS (
    SELECT doc_id,
        len(regexp_extract_all(text, '{_TAG}')) AS n_tags,
        regexp_replace(text, '{_TAG}', ' ', 'g') AS text
    FROM planted
)
SELECT doc_id, n_tags,
    trim(regexp_replace({_ENT_CHAIN}, '\s+', ' ', 'g')) AS clean_text
FROM stripped
"""


def url_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant two URLs per doc, extract them, and aggregate per domain
    (count + distinct docs) — the per-domain accounting behind crawl
    curation (domain allowlists, per-site caps)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" visit https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" or http://ref"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".org/home"),
        ),
    )
    urls = planted.select(
        "doc_id", F.explode(text.extract_urls(F.col("text"))).alias("url")
    )
    return (
        urls.select("doc_id", text.url_domain(F.col("url")).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy("domain")
    )


URL_EXTRACTION_SQL = rf"""
WITH planted AS (
    SELECT doc_id,
        text || ' visit https://site' || CAST(doc_id % 7 AS VARCHAR)
             || '.example.com/p/' || CAST(doc_id AS VARCHAR)
             || ' or http://ref' || CAST(doc_id % 3 AS VARCHAR)
             || '.org/home' AS text
    FROM documents
),
urls AS (
    SELECT doc_id, unnest(regexp_extract_all(text, '{text.URL_RE}')) AS url
    FROM planted
)
SELECT regexp_extract(url, '{text.URL_DOMAIN_RE}', 1) AS domain,
    COUNT(*) AS n_urls,
    COUNT(DISTINCT doc_id) AS n_docs
FROM urls
GROUP BY domain
ORDER BY domain
"""


# Contamination / span-dedup share one gram shape: word n-grams,
# distinct within a doc. The eval split (doc_id % 97 = 0) stands in
# for a held-out benchmark set.
_EVAL_MOD = 97


def ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: 3-gram overlap of every training doc
    against the eval split's n-gram universe."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.where(F.col("doc_id") % _EVAL_MOD == 0)
    train = docs.where(F.col("doc_id") % _EVAL_MOD != 0)
    return text.ngram_contamination(
        train, eval_df, "doc_id", "text", n=3
    ).orderBy("doc_id")


def _grams_cte(n: int) -> str:
    parts = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n))
    return rf"""
w AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
    FROM documents
),
g AS (
    SELECT doc_id,
        unnest(list_distinct(list_transform(
            generate_series(1, len(ws) - {n - 1}),
            i -> {parts}))) AS gram
    FROM w WHERE len(ws) >= {n}
)"""


NGRAM_CONTAMINATION_SQL = rf"""
WITH {_grams_cte(3)},
eval_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_EVAL_MOD} = 0),
per AS (
    SELECT t.doc_id, COUNT(*) AS n_ngrams,
        SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_contaminated
    FROM (SELECT * FROM g WHERE doc_id % {_EVAL_MOD} <> 0) t
    LEFT JOIN eval_g e ON t.gram = e.gram
    GROUP BY t.doc_id
)
SELECT d.doc_id AS doc_id,
    COALESCE(n_ngrams, 0) AS n_ngrams,
    CAST(COALESCE(n_contaminated, 0) AS BIGINT) AS n_contaminated,
    floor(COALESCE(n_contaminated, 0) / CAST(n_ngrams AS DOUBLE)
        * 10000.0 + 0.5) / 10000.0 AS contamination_frac
FROM (SELECT doc_id FROM documents WHERE doc_id % {_EVAL_MOD} <> 0) d
LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY doc_id
"""


def span_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc 5-gram span duplication per document (boilerplate
    signal for span-level dedup)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.shared_span_stats(docs, "doc_id", "text", k=5).orderBy("doc_id")


SPAN_BOILERPLATE_SQL = rf"""
WITH {_grams_cte(5)},
freq AS (SELECT gram, COUNT(*) AS doc_freq FROM g GROUP BY gram),
per AS (
    SELECT g.doc_id, COUNT(*) AS n_spans,
        SUM(CASE WHEN doc_freq >= 2 THEN 1 ELSE 0 END) AS n_shared
    FROM g JOIN freq ON g.gram = freq.gram
    GROUP BY g.doc_id
)
SELECT d.doc_id AS doc_id,
    COALESCE(n_spans, 0) AS n_spans,
    CAST(COALESCE(n_shared, 0) AS BIGINT) AS n_shared,
    floor(COALESCE(n_shared, 0) / CAST(n_spans AS DOUBLE)
        * 10000.0 + 0.5) / 10000.0 AS shared_span_frac
FROM (SELECT doc_id FROM documents) d
LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY doc_id
"""



def dedup_exact_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022 ExactSubstr): excise
    every 5-word span shared by >=2 distinct documents; returns the
    rebuilt text + word accounting per document."""
    from biglake_iceberg_pipeline_spark.operators.dedup import (
        excise_duplicate_spans,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return excise_duplicate_spans(docs, "doc_id", "text", k=5).orderBy(
        "doc_id"
    )


DEDUP_EXACT_SUBSTRINGS_SQL = r"""
WITH w AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
    FROM documents
),
words AS (
    SELECT doc_id, i - 1 AS pos, ws[i] AS word
    FROM w, unnest(generate_series(1, len(ws))) AS t(i)
),
g AS (
    SELECT doc_id, i - 1 AS start0,
        ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
            || ' ' || ws[i+4] AS gram
    FROM w, unnest(generate_series(1, len(ws) - 4)) AS t(i)
    WHERE len(ws) >= 5
),
dup AS (
    SELECT gram
    FROM (SELECT DISTINCT doc_id, gram FROM g)
    GROUP BY gram HAVING COUNT(*) >= 2
),
cov AS (
    SELECT DISTINCT g.doc_id, t.pos
    FROM g JOIN dup USING (gram),
        unnest(generate_series(g.start0, g.start0 + 4)) AS t(pos)
),
kept AS (
    SELECT words.doc_id, words.pos, words.word
    FROM words ANTI JOIN cov USING (doc_id, pos)
),
rebuilt AS (
    SELECT doc_id,
        string_agg(word, ' ' ORDER BY pos) AS clean_text,
        COUNT(*) AS n_kept
    FROM kept GROUP BY doc_id
)
SELECT w.doc_id AS doc_id,
    COALESCE(clean_text, '') AS clean_text,
    CAST(len(ws) AS BIGINT) AS n_words,
    CAST(len(ws) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed
FROM w LEFT JOIN rebuilt USING (doc_id)
ORDER BY doc_id
"""



def decontaminate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs surviving decontamination against the held-out
    eval slice (doc_id % 97 == 0): any eval 3-gram hit drops the doc
    (min_hits=1, the strict gate real pipelines run before
    training)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.where(F.col("doc_id") % _EVAL_MOD == 0)
    train = docs.where(F.col("doc_id") % _EVAL_MOD != 0)
    return (
        text.decontaminate(
            train, eval_df, "doc_id", "text", n=3, min_hits=1
        )
        .select("doc_id", "n_ngrams", "n_contaminated")
        .orderBy("doc_id")
    )


DECONTAMINATE_CORPUS_SQL = rf"""
WITH {_grams_cte(3)},
eval_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_EVAL_MOD} = 0),
per AS (
    SELECT t.doc_id, COUNT(*) AS n_ngrams,
        SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END)
            AS n_contaminated
    FROM g t LEFT JOIN eval_g e ON t.gram = e.gram
    WHERE t.doc_id % {_EVAL_MOD} != 0
    GROUP BY t.doc_id
)
SELECT d.doc_id AS doc_id,
    COALESCE(n_ngrams, 0) AS n_ngrams,
    CAST(COALESCE(n_contaminated, 0) AS BIGINT) AS n_contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {_EVAL_MOD} != 0) d
LEFT JOIN per USING (doc_id)
WHERE COALESCE(n_contaminated, 0) < 1
  AND NOT (COALESCE(
        COALESCE(n_contaminated, 0)
            / NULLIF(CAST(n_ngrams AS DOUBLE), 0), 0) > 0.1)
ORDER BY doc_id
"""


#: trained classifier models, keyed by corpus identity
#: {(docs path, mtime): (w_rows, bias)} — train once, score many
#: (the pair-artifact convention at model scale; bench.py clears
#: this to time a from-scratch train as quality_clf_train)
_CLF_MODEL: dict = {}


def _planted_label_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The labeled task (shared by train and score): docs with even
    doc_id are the 'reference' class and carry three planted
    qgood<doc_id%5> marker tokens, odd ids carry qbad<doc_id%7> —
    the classifier must LEARN the marker buckets from the labels
    against 25+ shared-vocab noise tokens per doc (the synthetic
    corpus's vocabulary is fully shared across lang/source, so no
    natural label is learnable). Real deployments swap the label
    column and drop the planting, nothing else."""
    marker = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("qgood"), (F.col("doc_id") % 5).cast("string")),
    ).otherwise(
        F.concat(F.lit("qbad"), (F.col("doc_id") % 7).cast("string"))
    )
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, 1.0).otherwise(0.0).alias("y"),
        F.concat_ws(" ", F.col("text"), marker, marker, marker).alias(
            "text"
        ),
    )


def trained_quality_model(
    spark: SparkSession, sf_dir: str
) -> tuple[list, float, int]:
    """Train-once model artifact: the ≤512-weight linear classifier
    fit by the distributed dyadic-exact GD, cached per corpus
    (path, mtime) — production trains a quality filter once and
    scores every shard with it; re-fitting per scoring query was the
    r11 tail's residual waste. The model is bounded (512 weights +
    bias, the G24/G29 driver-side-model convention), so in-process
    caching IS the production shape here — a model registry row, not
    a data artifact. Deterministic math: cached weights are
    bit-identical to a re-fit, so hash parity is unaffected."""
    import os as _os

    from biglake_iceberg_pipeline_spark.sources.catalog import (
        corpus_cache_key,
    )

    key = corpus_cache_key(sf_dir)
    hit = _CLF_MODEL.get(key) if key is not None else None
    if hit is not None:
        return hit
    from biglake_iceberg_pipeline_spark.operators.quality_clf import (
        doc_features,
        train_surrogate_gd,
    )

    docs = _planted_label_docs(spark, sf_dir)
    # one cheap up-front count keeps the DF-prune threshold a
    # literal: the returned scoring plan then carries no scalar cross
    # join (the explain audit's BNLJ rule stays strict). DISTINCT ids
    # — the oracle's COUNT(DISTINCT doc_id) and doc_features' own
    # fallback both count distinct, and the three must agree or a
    # token with df between the two thresholds hash-splits the query
    # (review r9; latent while doc_id is unique)
    n_docs = docs.select("doc_id").distinct().count()
    feats = doc_features(
        docs, label_col="y", n_buckets=512, df_max=0.5, n_docs=n_docs
    ).persist()
    labels = docs.select("doc_id", "y")
    weights, bias = train_surrogate_gd(labels, feats)
    # materialize the MODEL eagerly (<= 512 weights + 1 bias), then
    # release the cached features: the scoring plan recomputes them
    # in ONE fresh pass instead of leaking a persisted copy into the
    # session per call (review r9). Deterministic math, so
    # recompute == cache.
    model = weights.crossJoin(F.broadcast(bias)).collect()  # 1 action
    w_rows = [(int(r["bucket"]), float(r["w"])) for r in model]
    bias_val = float(model[0]["bias"]) if model else 0.0
    feats.unpersist()
    # n_docs rides the artifact: the DF-prune threshold is part of
    # the fitted feature space, and scoring re-counting it would be
    # an extra full pass per cold score (r12 review)
    out = (w_rows, bias_val, n_docs)
    if key is not None:
        _CLF_MODEL[key] = out
    return out


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality-classifier scores (G37; the DCLM/FineWeb-class
    TRAINED filter): a linear classifier over hashed bag-of-words
    features, fit by two full-batch GD iterations DISTRIBUTED as
    DataFrame aggregations, scored as sigmoid(bias + x . w). The
    labeled task PLANTS its signal (the pii_redaction convention —
    the synthetic corpus's 31-word vocabulary is fully shared across
    every lang/source, so no natural label is learnable): docs with
    even doc_id are the 'reference' class and carry three planted
    qgood<doc_id%5> marker tokens, odd ids carry qbad<doc_id%7> —
    the classifier must LEARN the marker buckets from the labels
    against 25+ shared-vocab noise tokens per doc. Real deployments
    swap the label column and drop the planting, nothing else.

    Hash parity (operators/quality_clf.py): the inner GD iteration
    uses a clipped-linear sigmoid surrogate, so with lr = 0.25 every
    residual/gradient/weight/dot is a DYADIC rational — sums are
    exact and order-independent, the weights bit-identical between
    Spark and the DuckDB replay; the true sigmoid runs once on the
    final bit-identical score, rounded with the portable floor-round.

    Scale: training (one (doc, bucket) hash shuffle for the
    features, two bucket-sized broadcastable weight aggregations)
    runs ONCE per corpus via the trained_quality_model artifact;
    scoring is one fresh feature pass + a broadcast join — fixed
    pass count, linear in the corpus."""
    from biglake_iceberg_pipeline_spark.operators.quality_clf import (
        doc_features,
    )

    w_rows, bias_val, n_docs = trained_quality_model(spark, sf_dir)
    docs = _planted_label_docs(spark, sf_dir)
    feats = doc_features(
        docs, label_col="y", n_buckets=512, df_max=0.5, n_docs=n_docs
    )
    labels = docs.select("doc_id", "y")
    wdf = spark.createDataFrame(w_rows, "bucket bigint, w double")
    base = labels.select(
        "doc_id", F.col("y").cast("int").alias("label")
    )
    # one fresh pass over the features serves both the dot product
    # and the token count
    perdoc = (
        feats.join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("x") * F.col("w")).alias("dot"),
            F.sum("x").cast("long").alias("n_tokens"),
        )
    )
    s = F.lit(bias_val) + F.coalesce(F.col("dot"), F.lit(0.0))
    score = (
        F.floor(
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-s))) * 1000000.0 + 0.5
        )
        / 1000000.0
    )
    return (
        base.join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "label",
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
            score.alias("quality_score"),
        )
        .orderBy("doc_id")
    )


QUALITY_CLASSIFIER_SCORE_SQL = r"""
WITH labeled AS (
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS y,
           text,
           CASE WHEN doc_id % 2 = 0
                THEN 'qgood' || CAST(doc_id % 5 AS VARCHAR)
                ELSE 'qbad' || CAST(doc_id % 7 AS VARCHAR)
           END AS m
    FROM documents
),
docs AS (
    SELECT doc_id, y, concat_ws(' ', text, m, m, m) AS text
    FROM labeled
),
toks AS (
    SELECT doc_id, y,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
    FROM docs
),
tok1 AS (SELECT doc_id, y, w FROM toks WHERE w <> ''),
rare AS (
    SELECT w
    FROM (
        SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok1 GROUP BY w
    )
    WHERE df <= 0.5 * (SELECT COUNT(DISTINCT doc_id) FROM docs)
),
feats AS (
    SELECT doc_id, y,
           (('0x' || substr(md5(w), 1, 8))::BIGINT % 512) AS bucket,
           COUNT(*)::DOUBLE AS x
    FROM tok1 JOIN rare USING (w)
    GROUP BY doc_id, y, 3
),
w1 AS (
    SELECT bucket, 0.25 * SUM(x * (y - 0.5)) AS w
    FROM feats GROUP BY bucket
),
b1 AS (SELECT 0.25 * SUM(y - 0.5) AS bias1 FROM docs),
dots1 AS (
    SELECT doc_id, SUM(x * w) AS dot
    FROM feats JOIN w1 USING (bucket) GROUP BY doc_id
),
resid AS (
    SELECT d.doc_id,
           d.y - LEAST(1.0, GREATEST(0.0,
               0.5 + ((SELECT bias1 FROM b1) + COALESCE(dot, 0.0)) / 4
           )) AS r2
    FROM docs d LEFT JOIN dots1 USING (doc_id)
),
grad2 AS (
    SELECT bucket, 0.25 * SUM(x * r2) AS g
    FROM feats JOIN resid USING (doc_id)
    GROUP BY bucket
),
w2 AS (
    SELECT bucket, COALESCE(w, 0.0) + COALESCE(g, 0.0) AS w
    FROM w1 FULL OUTER JOIN grad2 USING (bucket)
),
b2 AS (
    SELECT (SELECT bias1 FROM b1) + 0.25 * SUM(r2) AS bias2 FROM resid
),
dots2 AS (
    SELECT doc_id, SUM(x * w) AS dot
    FROM feats JOIN w2 USING (bucket) GROUP BY doc_id
),
ntok AS (
    SELECT doc_id, CAST(SUM(x) AS BIGINT) AS n_tokens
    FROM feats GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.y AS INT) AS label,
       COALESCE(nt.n_tokens, 0) AS n_tokens,
       floor((1.0 / (1.0 + exp(-((SELECT bias2 FROM b2)
           + COALESCE(dot, 0.0))))) * 1000000.0 + 0.5) / 1000000.0
           AS quality_score
FROM docs d
LEFT JOIN dots2 USING (doc_id)
LEFT JOIN ntok nt USING (doc_id)
ORDER BY doc_id
"""


def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G40: the Gopher rule-set filter (operators/text.py::
    gopher_rules) over the documents table — per-rule values, per-rule
    booleans, conjunctive keep flag. The synthetic corpus has no
    bullets/ellipses (those rules pin at 0 here and are exercised by
    planted unit tests); word count, word length, alpha ratio and
    stopword membership all vary, so the keep flag splits the corpus
    both ways."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = text.gopher_rules(docs, "text")
    return out.drop("text").orderBy("doc_id")


_GOPHER_STOPS = ", ".join(f"'{w}'" for w in (
    "the", "be", "to", "of", "and", "that", "have", "with"
))
GOPHER_QUALITY_FILTER_SQL = f"""
WITH feat AS (
    SELECT doc_id,
        len(string_split_regex(lower(trim(text)), '\\s+')) AS n_words,
        len(regexp_replace(trim(text), '\\s+', '', 'g')) AS word_chars,
        len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
            w -> regexp_matches(w, '[a-z]'))) AS alpha_words,
        len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS symbols,
        string_split(text, chr(10)) AS lines,
        len(list_filter(list_distinct(
                string_split_regex(lower(trim(text)), '\\s+')),
            w -> w IN ({_GOPHER_STOPS}))) AS stop_hits
    FROM documents
),
ratios AS (
    SELECT doc_id, n_words, stop_hits,
        floor(word_chars / NULLIF(n_words, 0)::DOUBLE * 10000 + 0.5)
            / 10000.0 AS mean_wl,
        floor(symbols / NULLIF(n_words, 0)::DOUBLE * 10000 + 0.5)
            / 10000.0 AS symbol_ratio,
        floor(len(list_filter(lines,
                l -> regexp_matches(ltrim(l), '^[-*•]')))
            / NULLIF(len(lines), 0)::DOUBLE * 10000 + 0.5)
            / 10000.0 AS bullet_ratio,
        floor(len(list_filter(lines,
                l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
            / NULLIF(len(lines), 0)::DOUBLE * 10000 + 0.5)
            / 10000.0 AS ellipsis_ratio,
        floor(alpha_words / NULLIF(n_words, 0)::DOUBLE * 10000 + 0.5)
            / 10000.0 AS alpha_ratio
    FROM feat
)
SELECT doc_id,
    n_words AS g_n_words,
    mean_wl AS g_mean_word_len,
    symbol_ratio AS g_symbol_ratio,
    bullet_ratio AS g_bullet_ratio,
    ellipsis_ratio AS g_ellipsis_ratio,
    alpha_ratio AS g_alpha_ratio,
    stop_hits AS g_stopword_hits,
    (n_words >= 50 AND n_words <= 100000) AS g_ok_words,
    (mean_wl >= 3.0 AND mean_wl <= 10.0) AS g_ok_word_len,
    (symbol_ratio <= 0.1) AS g_ok_symbols,
    (bullet_ratio <= 0.9) AS g_ok_bullets,
    (ellipsis_ratio <= 0.3) AS g_ok_ellipsis,
    (alpha_ratio >= 0.8) AS g_ok_alpha,
    (stop_hits >= 2) AS g_ok_stopwords,
    (n_words >= 50 AND n_words <= 100000
     AND mean_wl >= 3.0 AND mean_wl <= 10.0
     AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9
     AND ellipsis_ratio <= 0.3 AND alpha_ratio >= 0.8
     AND stop_hits >= 2) AS g_keep
FROM ratios
ORDER BY doc_id
"""


_SPLITS = {"train": 0.9, "valid": 0.05, "test": 0.05}


def hash_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G41: deterministic train/valid/test assignment
    (operators/sampling.py::hash_split) — one no-shuffle CASE over an
    md5-prefix compare, stable under corpus growth so validation rows
    can never leak into train when new data arrives."""
    docs = load_table(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id", dict(_SPLITS))
    return out.select("doc_id", "split").orderBy("doc_id")


HASH_SPLIT_SQL = f"""
SELECT doc_id,
    CASE
        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
             < '{hash_threshold(0.9)}' THEN 'train'
        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
             < '{hash_threshold(0.95)}' THEN 'valid'
        ELSE 'test'
    END AS split
FROM documents
ORDER BY doc_id
"""


QUERIES = {
    "gopher_quality_filter": gopher_quality_filter,
    "hash_split": hash_split_q,
    "quality_classifier_score": quality_classifier_score,
    "ccnet_ppl_buckets": ccnet_ppl_buckets,
    "token_budget_mixture": token_budget_mixture,
    "pii_redaction": pii_redaction,
    "text_repetition": text_repetition,
    "sample_mixture": sample_mixture,
    "source_quota_sample": source_quota_sample,
    "dedup_paragraph_corpus": dedup_paragraph_corpus,
    "tfidf_keywords": tfidf_keywords,
    "text_lm_score": text_lm_score,
    "doc_chunks": doc_chunks,
    "strip_markup": strip_markup,
    "url_extraction": url_extraction,
    "ngram_contamination": ngram_contamination,
    "span_boilerplate": span_boilerplate,
    "dedup_exact_substrings": dedup_exact_substrings,
    "decontaminate_corpus": decontaminate_corpus,
}

ORACLE = {
    "gopher_quality_filter": GOPHER_QUALITY_FILTER_SQL,
    "hash_split": HASH_SPLIT_SQL,
    "quality_classifier_score": QUALITY_CLASSIFIER_SCORE_SQL,
    "ccnet_ppl_buckets": CCNET_PPL_BUCKETS_SQL,
    "token_budget_mixture": TOKEN_BUDGET_MIXTURE_SQL,
    "pii_redaction": PII_REDACTION_SQL,
    "text_repetition": TEXT_REPETITION_SQL,
    "sample_mixture": SAMPLE_MIXTURE_SQL,
    "source_quota_sample": SOURCE_QUOTA_SAMPLE_SQL,
    "dedup_paragraph_corpus": DEDUP_PARAGRAPH_CORPUS_SQL,
    "tfidf_keywords": TFIDF_KEYWORDS_SQL,
    "text_lm_score": TEXT_LM_SCORE_SQL,
    "doc_chunks": DOC_CHUNKS_SQL,
    "strip_markup": STRIP_MARKUP_SQL,
    "url_extraction": URL_EXTRACTION_SQL,
    "ngram_contamination": NGRAM_CONTAMINATION_SQL,
    "span_boilerplate": SPAN_BOILERPLATE_SQL,
    "dedup_exact_substrings": DEDUP_EXACT_SUBSTRINGS_SQL,
    "decontaminate_corpus": DECONTAMINATE_CORPUS_SQL,
}
