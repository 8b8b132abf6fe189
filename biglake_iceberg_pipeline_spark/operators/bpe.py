"""Corpus-trained BPE tokenizer: sample-train, broadcast, apply
distributed.

Training-data pipelines budget by TOKENS, and the regex
approximation in operators/text.py under/over-counts depending on the
corpus. This module implements the original byte-pair-encoding
algorithm (Sennrich et al. 2016, public): learn merge rules from word
frequencies, apply them greedily per word.

Spark-first shape — the one that survives 100 TB:
- TRAIN on a bounded sample, driver-side: tokenizers are always
  trained on a corpus sample (a few MB of text pins the merge table);
  the word-frequency dict makes training O(vocab), not O(corpus).
  One aggregation job computes the sampled word frequencies
  cluster-side; only the (word, count) dict crosses to the driver.
- APPLY distributed: the learned merge ranks broadcast inside an
  Arrow-batched pandas UDF closure; each executor tokenizes its rows
  with a per-batch word cache (Zipf: most words repeat, so the
  greedy merge loop runs once per DISTINCT word per batch).

No oracle — BPE's iterative merge loop is not SQL-expressible; the
properties pinned in tests: determinism, exact token counts on known
merges, compression of frequent words, count bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker, attached to the final character so merges
#: distinguish word-final from word-internal contexts without adding
#: a phantom token ("low" -> l, o, w+EOW)
_EOW = "\x00"


def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + _EOW,)


def _word_freqs(
    df: DataFrame, text_col: str, sample_docs: int
) -> dict[str, int]:
    """Sampled word-frequency dict (one cluster-side aggregation; only
    (word, count) pairs reach the driver — bounded by the sample's
    vocabulary, not the corpus)."""
    rows = (
        df.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .limit(sample_docs * 200)  # bound the sample by words too
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["w"]: r["n"] for r in rows}


def train_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    sample_docs: int = 1000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a corpus sample.
    Classic frequency-table training: words as symbol sequences
    (chars + end-of-word), repeatedly merge the most frequent adjacent
    pair. Deterministic: ties break lexicographically."""
    freqs = _word_freqs(df.limit(sample_docs), text_col, sample_docs)
    words: dict[tuple[str, ...], int] = {}
    for w, n in freqs.items():
        sym = _symbols(w)
        words[sym] = words.get(sym, 0) + n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for sym, n in words.items():
            merged = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    merged.append(joined)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            key = tuple(merged)
            out[key] = out.get(key, 0) + n
        words = out
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first BPE encode of one word (the standard
    apply algorithm)."""
    sym = list(_symbols(word))
    while len(sym) > 1:
        best_i, best_rank = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_token_count(
    text_col: Column, merges: list[tuple[str, str]]
) -> Column:
    """Per-row token count under the trained merges — Arrow-batched,
    merge ranks in the closure (broadcast with the serialized UDF),
    per-batch distinct-word cache."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def kernel(texts):
        import pandas as pd

        cache: dict[str, int] = {}

        def count(t):
            if t is None:
                return None
            total = 0
            for w in t.lower().split():
                n = cache.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    cache[w] = n
                total += n
            return total

        return pd.Series([count(t) for t in texts], dtype=object)

    return pandas_udf(kernel, "long")(text_col)


def corpus_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 200,
    sample_docs: int = 1000,
) -> DataFrame:
    """End-to-end: train on a sample, count tokens for every doc."""
    merges = train_bpe_merges(df, text_col, n_merges, sample_docs)
    return df.select(
        F.col(id_col),
        bpe_token_count(F.col(text_col), merges).alias("bpe_tokens"),
    )
