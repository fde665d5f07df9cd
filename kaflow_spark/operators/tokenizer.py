"""Tokenizer-training support: distributed BPE statistics + exact
merge training.

The public byte-pair-encoding training algorithm (Sennrich, Haddow &
Birch, "Neural Machine Translation of Rare Words with Subword Units",
ACL 2016) runs on a WORD-FREQUENCY table, not on raw text — so the
scalable shape on Spark is:

1. ``word_freqs``: one distributed word count over the corpus (the
   only stage that touches all the data — one partial-agg'd shuffle
   whose output is |vocab| rows, independent of corpus size);
2. ``train_bpe``: the exact classic merge loop over the (bounded —
   ``top_words`` cap, standard practice) frequency table on the
   driver. The loop is O(merges x table) on thousands of rows; making
   IT distributed would shuffle per merge for no win.

``char_pair_counts`` exposes the FIRST merge iteration (adjacent
character-pair counts weighted by word frequency) as a declarative
plan — SQL-expressible, so the DuckDB oracle hash-checks the
distributed statistics that feed training (q99). Later iterations
depend on earlier merges and are exercised by unit tests against
hand-computed merge sequences.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """Distributed word-frequency table: ``(word, freq)`` over
    whitespace tokens. Partial-agg'd — shuffle volume is |vocab|."""
    w = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    return (
        df.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def char_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Adjacent character-pair counts over all word instances — the
    statistics of BPE's first merge iteration, as one declarative
    plan: explode words, explode each word's adjacent 2-grams, one
    partial-agg'd count. The words column is materialized before the
    pair transform (an inline expression in the lambda would re-split
    per pair)."""
    words = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    ).filter(F.col("w") != "")
    w = F.col("w")
    pairs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(w) - 1, F.lit(1))),
        lambda i: w.substr(i, F.lit(2)),
    )
    return (
        words.filter(F.length(w) >= 2)
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe(
    freqs: DataFrame | dict[str, int],
    num_merges: int,
    *,
    top_words: int = 50_000,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Exact classic BPE training over a word-frequency table.

    ``freqs`` is the output of :func:`word_freqs` (or a plain dict for
    tests); only the ``top_words`` most frequent words participate
    (the standard frequency cutoff that bounds driver memory — the cap
    is the ONLY approximation, and it is the corpus-independent one
    every practical BPE trainer applies). Returns the merge list in
    order; ties break lexicographically so training is deterministic
    across partitionings and engines.
    """
    if isinstance(freqs, DataFrame):
        rows = (
            freqs.orderBy(F.col("freq").desc(), F.col("word"))
            .limit(top_words)
            .collect()
        )
        table = {r["word"]: r["freq"] for r in rows}
    else:
        ordered = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
        table = dict(ordered[:top_words])

    # word -> symbol tuple (chars + end-of-word marker, per the paper)
    symbolized: dict[tuple[str, ...], int] = {}
    for word, n in table.items():
        key = tuple(word) + (end_of_word,)
        symbolized[key] = symbolized.get(key, 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: Counter[tuple[str, str]] = Counter()
        for syms, n in symbolized.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        # deterministic argmax: highest count, then lexicographic pair
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_tab: dict[tuple[str, ...], int] = {}
        for syms, n in symbolized.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_tab[key] = new_tab.get(key, 0) + n
        symbolized = new_tab
    return merges


def _merge_word(
    word: str, rank: dict[tuple[str, str], int], end_of_word: str
) -> list[str]:
    """THE merge kernel (greedy in merge-rank order, the standard
    inference rule) — single implementation shared by bpe_segment and
    the vectorized encoder so their semantics cannot diverge."""
    syms = list(word) + [end_of_word]
    while len(syms) > 1:
        ranked = [
            (rank[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in rank
        ]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def bpe_segment(
    word: str, merges: list[tuple[str, str]], end_of_word: str = "</w>"
) -> list[str]:
    """Apply a trained merge list to one word — reference entry point
    for tests and one-off use (builds the rank table per call; the
    vectorized encoder prebuilds it once)."""
    return _merge_word(word, {m: i for i, m in enumerate(merges)}, end_of_word)


def encode_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    *,
    out_col: str = "bpe_tokens",
    end_of_word: str = "</w>",
) -> DataFrame:
    """Vectorized BPE encoding: apply a trained merge list to every
    document, appending ``out_col: array<string>``.

    Arrow-batched pandas UDF (the merge loop is inherently iterative —
    no expression form), with a per-batch WORD cache: natural text is
    Zipfian, so most word instances hit the cache and the per-word
    merge loop runs once per distinct word per batch, not per token.
    The merge table is captured in the closure and ships to executors
    once per task via the broadcast-like task serialization path."""
    from pyspark.sql.functions import pandas_udf

    rank = {m: i for i, m in enumerate(merges)}

    def _segment(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is None:
            hit = cache[word] = _merge_word(word, rank, end_of_word)
        return hit

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in t.split():
                toks.extend(_segment(w, cache))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, _encode(F.col(text_col)))


__all__ = [
    "word_freqs",
    "char_pair_counts",
    "train_bpe",
    "bpe_segment",
    "encode_bpe",
]
