"""Text-analysis expression builders for the LLM data pipeline — all
built-in Spark SQL functions (regexp / higher-order), zero UDFs, so
they run inside whole-stage codegen at any scale.

Determinism notes: ratio-like quantities are integer basis points
(``x * 10000 div n``) — no floating division, so the DuckDB oracle
reproduces them bit-for-bit. The n-gram fingerprint uses md5 (present
and identical in both engines) rather than engine-specific hashes.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer: contraction suffixes, letter runs, digit runs,
# punctuation runs (optionally space-prefixed) — a public GPT-2-style
# pattern simplified to the RE2 ∩ Java-regex common subset.
BPE_PATTERN = "'[a-z]{1,2}| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+"

# Tiny per-language stopword inventories for the n-gram/stopword
# heuristic language id (public-knowledge word lists).
LANG_STOPWORDS: dict[str, str] = {
    "de": r"\b(der|die|das|und|ist|nicht|ein|eine|mit|von)\b",
    "en": r"\b(the|and|of|to|in|is|that|for|it|was)\b",
    "es": r"\b(el|la|los|las|de|que|y|en|un|una|es)\b",
    "fr": r"\b(le|la|les|de|et|un|une|est|que|dans)\b",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count (count of \\S+ runs)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(r"\S+"), 0)).cast("int")


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count via the public GPT-2-style regex."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_PATTERN), 0)).cast("int")


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("bigint")


def quality_components(text: Column | str) -> dict[str, Column]:
    """Raw integer components of the quality heuristic."""
    t = _c(text)
    return {
        "nch": F.length(t).cast("bigint"),
        "ntok": _count(t, r"\S+"),
        "alpha": _count(t, "[A-Za-z]"),
        "digit": _count(t, "[0-9]"),
        "punct": _count(t, "[.,!?;:]"),
        "stop": _count(F.lower(t), LANG_STOPWORDS["en"]),
    }


def int_div(a: Column, b: Column) -> Column:
    """Exact integer division as column algebra: (a - a%b)/b — the
    numerator is an exact multiple of b, so the double division is
    exact (both operands < 2^53). Matches DuckDB's // for positives."""
    return ((a - a % b) / b).cast("bigint")


def quality_score_bp(text: Column | str) -> Column:
    """Heuristic doc-quality score in basis points: rewards alphabetic
    content and stopword density (natural prose), penalizes digit and
    punctuation stuffing. Integer arithmetic only (oracle-exact)."""
    c = quality_components(text)
    nch = F.greatest(c["nch"], F.lit(1))
    ntok = F.greatest(c["ntok"], F.lit(1))
    return (
        int_div(c["alpha"] * 10000, nch)
        + int_div(c["stop"] * 10000, ntok)
        - int_div(c["punct"] * 10000, nch)
        - int_div(c["digit"] * 10000, nch)
    ).cast("bigint")


def lang_scores(text: Column | str) -> dict[str, Column]:
    t = F.lower(_c(text))
    return {lang: _count(t, pat) for lang, pat in sorted(LANG_STOPWORDS.items())}


def lang_id(text: Column | str) -> Column:
    """Stopword-heuristic language id: argmax over per-language
    stopword hit counts; ties resolve to the lexicographically LAST
    language code (struct max), 'und' when nothing matches."""
    scores = lang_scores(text)
    candidates = F.array(
        *[
            F.struct(s.alias("score"), F.lit(lang).alias("lang"))
            for lang, s in scores.items()
        ]
    )
    best = F.array_max(candidates)
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])


def fingerprint_expr(text: Column | str, k: int = 8, stride: int = 1) -> Column:
    """Pure-expression fingerprint (md5 k-gram min) — Arrow-less
    fallback; the hybrid ``fingerprint`` below is ~1.6x faster because
    the per-gram transform lambda is interpreted."""
    t = _c(text)
    n = F.length(t) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        lambda i: F.md5(t.substr(i, F.lit(k)).cast("binary")),
    )
    return F.when(F.length(t) < k, F.md5(t.cast("binary"))).otherwise(
        F.array_min(grams)
    )


def fingerprint(text: Column | str, k: int = 8, stride: int = 1) -> Column:
    """Document fingerprint: lexicographic min of md5 digests over the
    character k-grams starting at positions 0, stride, 2*stride, ...
    (a 1-permutation MinHash; ``stride=1`` = every gram). Short docs
    fall back to md5 of the whole text. Arrow-batched hashlib kernel,
    bit-identical to ``fingerprint_expr`` (tested).

    ``stride > 1`` deterministically samples gram positions — the md5
    calls are the whole cost of this operator (~len(text)/stride
    digests per doc), and a strided 1-perm MinHash is an equally valid
    fingerprint definition as long as every engine computes the same
    position set."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fp(texts: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        out = []
        for t in texts:
            if t is None:
                out.append(None)
            elif len(t) < k:
                out.append(md5(t.encode()).hexdigest())
            elif t.isascii():
                # byte slices == char slices for ASCII: encode once.
                # Take the min over raw 16-byte digests and hex-format
                # only the winner: bytes→hex is order-preserving (each
                # byte maps to two hex chars), so min(digest).hex() ==
                # min(hexdigest), ~20% cheaper per gram.
                b = t.encode()
                out.append(
                    min(
                        md5(b[i : i + k]).digest()
                        for i in range(0, len(b) - (k - 1), stride)
                    ).hex()
                )
            else:
                out.append(
                    min(
                        md5(t[i : i + k].encode()).digest()
                        for i in range(0, len(t) - (k - 1), stride)
                    ).hex()
                )
        return pd.Series(out)

    return _fp(_c(text))


def fingerprint_fast(text: Column | str, k: int = 8, stride: int = 1) -> Column:
    """Production fingerprint: same 1-permutation-MinHash shape but
    xxhash64 longs instead of md5 hex strings — ~4x cheaper (no digest
    allocation, long min vs string min). Not oracle-checkable (DuckDB
    lacks xxhash64), hence the md5 twin above for the declared query."""
    t = _c(text)
    n = F.length(t) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        lambda i: F.xxhash64(t.substr(i, F.lit(k))),
    )
    return F.when(F.length(t) < k, F.xxhash64(t)).otherwise(F.array_min(grams))


def readability_grade_milli(text: Column | str) -> Column:
    """Flesch-Kincaid-style grade level in integer thousandths (grade
    x1000): the standard readability/education-level curation signal
    (FineWeb-Edu style filtering buckets on exactly this kind of
    score), computed with the q35 exactness discipline — regexp
    counts + integer division only, no IEEE arithmetic, so any engine
    reproduces it bit-for-bit.

    grade_milli = 390 * words//sentences + 11800 * syllables//words
               - 15590,
    with sentences = [.!?]+ runs (min 1), words = \\S+ runs (min 1),
    and syllables approximated as vowel-group count ([aeiouyAEIOUY]+
    runs) — the classic dictionary-free estimator. The coefficients
    are the FK constants (0.39, 11.8, 15.59) uniformly scaled x1000,
    so the two ratio terms keep their real relative weights; the
    ratios use exact floor division, so the score is a deterministic
    integer (a floor-biased variant of the float formula, identically
    biased on both engines)."""
    t = _c(text)
    sentences = F.greatest(_count(t, "[.!?]+"), F.lit(1))
    words = F.greatest(_count(t, r"\S+"), F.lit(1))
    syllables = _count(t, "[aeiouyAEIOUY]+")
    return (
        390 * int_div(words, sentences)
        + 11800 * int_div(syllables, words)
        - 15590
    ).cast("bigint")
