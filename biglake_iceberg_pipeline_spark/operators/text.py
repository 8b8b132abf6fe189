"""Text analysis for training-data curation.

Not in the reference's own surface (its cleaning is schema-level), but
first-class for a 100 TB documents pipeline: language ID, quality
scoring, token counting, fingerprinting. Everything is a Catalyst
expression (regex counts, array folds) — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from biglake_iceberg_pipeline_spark.functions.numeric import money_round
from biglake_iceberg_pipeline_spark.operators.dedup import HASH_PRIME

# Tiny per-language stopword sets for the n-gram-free heuristic; order
# is the tie-break priority.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "est", "les"),
    "es": ("el", "la", "y", "es", "los"),
}

STOPWORDS_EN = LANG_STOPWORDS["en"] + ("to", "in", "it", "that", "for")

# BPE-ish pre-tokenizer: letter runs | digit runs | single punct.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[.!?,;:]"


def _words(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def lang_hits(text: Column, lang: str) -> Column:
    words = _words(text)
    stop = LANG_STOPWORDS[lang]
    return F.size(F.filter(words, lambda w: w.isin(*stop)))


def detect_language(text: Column) -> Column:
    """Stopword-vote language ID; 'und' (undetermined) when no
    language scores a hit. Ties break in LANG_STOPWORDS order."""
    hits = {lang: lang_hits(text, lang) for lang in LANG_STOPWORDS}
    best = F.lit("und")
    best_n = F.lit(0)
    for lang in reversed(list(LANG_STOPWORDS)):  # earlier langs win ties
        n = hits[lang]
        best = F.when(n >= F.greatest(best_n, F.lit(1)), F.lit(lang)).otherwise(best)
        best_n = F.greatest(best_n, n)
    return best


def token_counts(text: Column) -> tuple[Column, Column]:
    """(whitespace token count, BPE-ish token count)."""
    ws = F.size(_words(text))
    bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))
    return ws, bpe


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword / word-shape features + a
    composite quality score in [0, 1]."""
    t = F.col(text_col)
    words = _words(t)
    n_chars = F.length(t)
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS_EN)))
    punct = F.size(F.regexp_extract_all(t, F.lit(PUNCT_RE), F.lit(0)))
    # sum(word lengths) == count of non-whitespace chars in the
    # trimmed text — a codegen regexp instead of an interpreted HOF
    # fold (identical integers, same hash, JVM-side at scale).
    word_chars = F.length(F.regexp_replace(F.trim(t), r"\s+", ""))
    mean_word_len = F.round(F.try_divide(word_chars, n_words), 4)
    stop_ratio = F.round(F.try_divide(stop_hits, n_words), 4)
    punct_ratio = F.round(F.try_divide(punct, n_chars), 4)
    # Composite: reward moderate word length and stopword presence,
    # penalize punctuation soup. Clamped to [0,1]. Rounded via explicit
    # floor(x*1e4+0.5) so the half-boundary behavior is IEEE-identical
    # across engines (ROUND implementations differ there).
    raw = F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            F.lit(0.5)
            + F.lit(0.5) * stop_ratio
            - F.lit(2.0) * punct_ratio
            + F.when((mean_word_len >= 3) & (mean_word_len <= 8), 0.2).otherwise(
                -0.2
            ),
        ),
    )
    score = F.floor(raw * 10000 + 0.5) / 10000.0
    return df.select(
        *df.columns,
        n_chars.alias("q_n_chars"),
        n_words.alias("q_n_words"),
        mean_word_len.alias("q_mean_word_len"),
        stop_ratio.alias("q_stopword_ratio"),
        punct_ratio.alias("q_punct_ratio"),
        score.alias("q_score"),
    )


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over characters, mod 1e9+7 — a
    content fingerprint that is engine-reproducible (unlike xxhash,
    any SQL engine can fold the same arithmetic)."""
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % HASH_PRIME,
    )


# --- PII redaction -------------------------------------------------
# Patterns restricted to syntax that Java regex (Spark) and RE2
# (DuckDB oracle) interpret identically: no lookaround, no backrefs.
# Order matters: emails first (they contain dot-runs an IP pattern
# could nibble), then IPs, then phone-like digit runs.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\+?\d[\d().-]{6,}\d"),
)


def redact_pii(text: Column, replacement: str = "[PII]") -> Column:
    """Scrub emails / IPv4s / phone-shaped digit runs. Pure
    regexp_replace chain — JVM-side, codegen-friendly, and the exact
    same patterns run on the DuckDB oracle."""
    out = text
    for _, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, replacement)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII match counts (for filtering/reporting)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS
    }


def repetition_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals per document:

    - ``dup_word_frac``: 1 − distinct/total words (word-level
      boilerplate; the line-level variant degenerates on single-line
      docs).
    - ``top_word_ratio``: occurrences of the most frequent word ÷
      total words (detects "word word word ..." spam).

    dup_word_frac is a pure array expression (no shuffle). The top
    word needs occurrence counts, which arrays can't express without
    a quadratic fold — so explode → two-level agg: partial counts
    map-side, then one shuffle on the doc id. At 100 TB the shuffle
    carries (doc_id, word, count), already combiner-reduced."""
    words = _words(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(words).alias("__n_words"),
        F.size(F.array_distinct(words)).alias("__n_distinct"),
        words.alias("__words"),
    )
    top = (
        base.select(id_col, "__n_words", F.explode("__words").alias("__w"))
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__c"), F.first("__n_words").alias("__n"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top_c"), F.first("__n").alias("__n2"))
    )
    return (
        base.drop("__words")
        .join(top, id_col)
        .select(
            id_col,
            F.col("__n_words").alias("n_words"),
            F.col("__n_distinct").alias("n_distinct_words"),
            F.round(
                F.lit(1.0) - F.try_divide("__n_distinct", "__n_words"), 4
            ).alias("dup_word_frac"),
            F.round(F.try_divide("__top_c", "__n_words"), 4).alias(
                "top_word_ratio"
            ),
        )
    )


# --- markup stripping ----------------------------------------------
# Tag + entity handling restricted to constructs Java regex and RE2
# read identically (no lookaround). Entities are literal replaces;
# &amp; goes LAST so "&amp;lt;" unescapes once, not twice — the same
# order runs on the oracle, so behavior is pinned either way.
MARKUP_TAG_RE = r"<[^>]*>"
MARKUP_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_markup(text: Column) -> Column:
    """HTML/XML → plain text: drop tags, unescape common entities,
    collapse the whitespace the removed tags leave behind. Pure
    regexp/replace chain — JVM-side, codegen-friendly."""
    out = F.regexp_replace(text, MARKUP_TAG_RE, " ")
    for ent, rep in MARKUP_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def markup_tag_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(MARKUP_TAG_RE), F.lit(0)))


# --- URL extraction ------------------------------------------------
URL_RE = r"https?://[^\s]+"
URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(text: Column) -> Column:
    """All http(s) URLs in a document, in order."""
    return F.regexp_extract_all(text, F.lit(URL_RE), F.lit(0))


def url_domain(url: Column) -> Column:
    """Hostname of a URL ('' when the URL doesn't parse)."""
    return F.regexp_extract(url, URL_DOMAIN_RE, 1)


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams (space-joined); empty array when the
    document has fewer than n words. The when() guard keeps
    sequence() from generating a descending range on short docs."""
    words = _words(text)
    cnt = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), cnt - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.when(cnt >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: for each training document, the
    fraction of its distinct word n-grams that appear anywhere in the
    eval corpus — the decontamination gate every LLM data pipeline
    runs before training.

    Scale shape: the eval n-gram universe is tiny next to the corpus
    (benchmarks are thousands of docs, training sets billions), so it
    broadcasts; the training side never shuffles except the final
    groupBy on the doc id. Docs with fewer than n words surface with
    n_ngrams=0 via the outer join, not silently dropped."""
    t_grams = train.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("__gram"),
    )
    e_grams = (
        eval_df.select(F.explode(word_ngrams(F.col(text_col), n)).alias("__gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        t_grams.join(F.broadcast(e_grams), "__gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_contaminated"),
        )
    )
    return (
        train.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            money_round(F.try_divide("n_contaminated", "n_ngrams"), 4).alias(
                "contamination_frac"
            ),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_frac: float = 0.1,
    min_hits: int | None = None,
) -> DataFrame:
    """The decontamination ACTION on top of ``ngram_contamination``'s
    score: training rows are dropped when their eval-overlap passes
    a gate — ``contamination_frac > max_frac`` (relative, the
    default-governing gate), plus optionally ``n_contaminated >=
    min_hits`` (absolute — the strict mode for short documents where
    one shared gram swamps the fraction, or for zero-tolerance
    pipelines with ``min_hits=1``). ``min_hits`` defaults to
    DISABLED: with any value ≤ the typical hit count it would
    subsume the relative gate entirely (every doc with
    ``contamination_frac > 0`` has at least one hit), making
    ``max_frac`` tuning a no-op. Returns the surviving training rows
    with their score columns attached (drop the three
    ``n_ngrams``/``n_contaminated``/``contamination_frac`` columns
    for the clean corpus). Same scale shape as the scorer: eval
    grams broadcast, one doc-id shuffle."""
    scores = ngram_contamination(train, eval_df, id_col, text_col, n)
    # NULL-safe: a doc shorter than n words has contamination_frac
    # NULL (0/0) — it is clean, and three-valued logic must not
    # silently drop it
    dropped = (
        F.coalesce("contamination_frac", F.lit(0.0)) > F.lit(max_frac)
    )
    if min_hits is not None:
        dropped = dropped | (
            F.col("n_contaminated") >= F.lit(min_hits)
        )
    return train.join(scores, id_col).where(~dropped)


def shared_span_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Cross-document span duplication: per doc, the fraction of its
    distinct k-word spans that also occur in at least one OTHER
    document — the boilerplate signal behind paragraph/span-level
    dedup (headers, licenses, navboxes repeat across a web corpus).

    Spans are distinct per doc before the explode, so a span's row
    count IS its document frequency — no countDistinct Expand. Three
    shuffles: span-frequency groupBy, the frequency join back (span-
    keyed hash join; the span universe is corpus-sized, so no
    broadcast), and the per-doc rollup."""
    spans = df.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), k)).alias("__span"),
    )
    freq = spans.groupBy("__span").agg(F.count(F.lit(1)).alias("__doc_freq"))
    per_doc = (
        spans.join(freq, "__span")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("__doc_freq") >= 2).cast("long")).alias("n_shared"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            money_round(F.try_divide("n_shared", "n_spans"), 4).alias(
                "shared_span_frac"
            ),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into fixed-width overlapping character
    windows — the chunking pass in front of every embedding/RAG
    indexer. Pure JVM: ``sequence()`` generates the window starts,
    ``explode`` fans out, ``substring`` slices; one narrow stage, no
    shuffle, no Python. Chunk width is bytes-bounded per row, so
    executor memory is safe regardless of document length; documents
    shorter than one window yield exactly one chunk."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.length(F.col(text_col))),
        F.lit(step),
    )
    return (
        df.select(
            F.col(id_col),
            F.length(F.col(text_col)).alias("doc_chars"),
            F.posexplode(starts).alias("chunk_id", "start"),
            F.col(text_col).alias("__t"),
        )
        .select(
            id_col,
            "doc_chars",
            "chunk_id",
            "start",
            F.substring(F.col("__t"), F.col("start"), chunk_chars).alias(
                "chunk_text"
            ),
        )
    )


#: the Gopher "must contain 2 of" stopword set (Rae et al. 2021,
#: A1.1) — membership, not frequency: a proxy for real prose.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher quality rule set (Rae et al. 2021 §A1.1 — the
    heuristic filter every later curation stack kept: MassiveText,
    RefinedWeb, Dolma, FineWeb): per-document rule values, one
    boolean per rule, and the conjunctive ``g_keep``.

    Rules: word count in [min_words, max_words]; mean word length in
    [3, 10]; symbol-to-word ratio (# / ellipsis) ≤ 0.1; ≤ 90% of
    lines bullet-started; ≤ 30% of lines ellipsis-ended; ≥ 80% of
    words contain a letter; ≥ 2 of the 8 Gopher stopwords present.

    Shape at 100 TB: pure JVM-side expressions (split / filter /
    regexp under whole-stage codegen), no shuffle, no UDF — the
    filter runs at scan speed and composes with the curation funnel's
    row-level accounting. Ratios round half-up at 4 digits via the
    engine-neutral floor(x*1e4+0.5) so the DuckDB oracle hash-matches
    bit-for-bit."""
    t = F.col(text_col)
    words = _words(t)
    n_words = F.size(words)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    word_chars = F.length(F.regexp_replace(F.trim(t), r"\s+", ""))
    mean_wl = _round4(F.try_divide(word_chars, n_words))
    alpha = _round4(
        F.try_divide(
            F.size(F.filter(words, lambda w: w.rlike("[a-z]"))), n_words
        )
    )
    symbols = F.size(
        F.regexp_extract_all(t, F.lit(r"#|\.\.\.|…"), F.lit(0))
    )
    symbol_ratio = _round4(F.try_divide(symbols, n_words))
    bullet = _round4(
        F.try_divide(
            F.size(
                F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]"))
            ),
            n_lines,
        )
    )
    ellipsis = _round4(
        F.try_divide(
            F.size(
                F.filter(
                    lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")
                )
            ),
            n_lines,
        )
    )
    stop_hits = F.size(
        F.array_intersect(
            words, F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    )
    checks = {
        "g_ok_words": (n_words >= min_words) & (n_words <= max_words),
        "g_ok_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "g_ok_symbols": symbol_ratio <= 0.1,
        "g_ok_bullets": bullet <= 0.9,
        "g_ok_ellipsis": ellipsis <= 0.3,
        "g_ok_alpha": alpha >= 0.8,
        "g_ok_stopwords": stop_hits >= 2,
    }
    keep = F.lit(True)
    for c in checks.values():
        keep = keep & c
    return df.select(
        *df.columns,
        n_words.alias("g_n_words"),
        mean_wl.alias("g_mean_word_len"),
        symbol_ratio.alias("g_symbol_ratio"),
        bullet.alias("g_bullet_ratio"),
        ellipsis.alias("g_ellipsis_ratio"),
        alpha.alias("g_alpha_ratio"),
        stop_hits.alias("g_stopword_hits"),
        *[c.alias(name) for name, c in checks.items()],
        keep.alias("g_keep"),
    )


def _round4(col: Column) -> Column:
    """Engine-neutral half-up rounding at 4 digits (ROUND half-even
    drift is exactly what cross-engine hash checks catch)."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000.0


def corpus_vocabulary(
    df: DataFrame, text_col: str, k: int = 100
) -> DataFrame:
    """Top-k corpus tokens with counts, document frequency, and the
    cumulative coverage fraction — the first look every training-data
    run takes at a new corpus (stopword curation, tokenizer sanity,
    boilerplate spotting).

    Shape at 100 TB: explode → map-side partial count → one shuffle on
    the token (vocabulary-bounded, ≪ corpus), then a single-partition
    window over the k survivors only. ``doc_freq`` counts distinct
    docs per token without an Expand: within-doc duplicates collapse
    via array_distinct BEFORE the explode."""
    tokens = df.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token")
    ).where(F.col("token") != "")
    doc_tokens = df.select(
        F.explode(
            F.array_distinct(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            )
        ).alias("token")
    ).where(F.col("token") != "")
    counts = tokens.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    dfreq = doc_tokens.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    total = tokens.count()
    top = (
        counts.join(dfreq, "token")
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(k)
    )
    w = (
        Window.orderBy(F.desc("n_occurrences"), "token")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return top.select(
        "token",
        "n_occurrences",
        "doc_freq",
        money_round(
            F.sum("n_occurrences").over(w) / F.lit(float(total)), 6
        ).alias("cum_coverage"),
    )
