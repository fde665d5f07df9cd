"""BPE tokenizer-training operators (Sennrich et al. ACL'16): the
distributed word/pair statistics and the exact driver-side merge loop,
checked against hand-computed merge sequences."""

from __future__ import annotations

from kaflow_spark.operators.tokenizer import (
    bpe_segment,
    char_pair_counts,
    train_bpe,
    word_freqs,
)


def test_train_bpe_classic_example():
    """The canonical corpus from the BPE paper's exposition: 'low'-
    family words; first merges fuse the most frequent adjacent pair."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freqs, 4)
    # 'es' occurs 6+3=9 times (newest, widest) - top pair
    assert merges[0] == ("e", "s")
    # then 'es'+'t' (9), then 'est</w>' (9)
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    # next: 'lo' from low(5)+lower(2) = 7
    assert merges[3] == ("l", "o")


def test_train_bpe_deterministic_tiebreak():
    # 'ab' and 'bc' both appear twice ('abc' x2); tie -> lexicographic
    merges = train_bpe({"abc": 2}, 1)
    assert merges == [("a", "b")]


def test_bpe_segment_roundtrip():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freqs, 10)
    seg = bpe_segment("newest", merges)
    # a fully-trained frequent word collapses to one symbol
    assert "".join(seg) == "newest</w>"
    assert len(seg) <= 2
    # an unseen word degrades gracefully to learned subwords + chars
    seg2 = bpe_segment("lowest", merges)
    assert "".join(seg2) == "lowest</w>"


def test_distributed_stats_match_local(spark):
    rows = [(1, "aa ab aa"), (2, "ab  b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wf = {r["word"]: r["freq"] for r in word_freqs(df, "text").collect()}
    assert wf == {"aa": 2, "ab": 2, "b": 1}
    pc = {r["pair"]: r["n"] for r in char_pair_counts(df, "text").collect()}
    # 'aa' x2 words and 'ab' x2 words each contribute one pair; the
    # single-char word 'b' contributes none
    assert pc == {"aa": 2, "ab": 2}

    # end-to-end: distributed freqs feed the exact trainer. With the
    # end-of-word marker, (b, </w>) counts ab(2) + b(1) = 3 — the top
    # pair (char_pair_counts deliberately excludes the marker: it
    # feeds the q99 oracle, which sees raw text only)
    merges = train_bpe(word_freqs(df, "text"), 1)
    assert merges == [("b", "</w>")]


def test_encode_bpe_matches_reference_kernel(spark):
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freqs, 10)
    df = spark.createDataFrame(
        [(1, "low newest"), (2, "widest unknown"), (3, None)],
        "doc_id long, text string",
    )
    from kaflow_spark.operators.tokenizer import encode_bpe

    rows = {r["doc_id"]: r["bpe_tokens"] for r in encode_bpe(df, "text", merges).collect()}
    want1 = bpe_segment("low", merges) + bpe_segment("newest", merges)
    assert rows[1] == want1
    assert rows[2] == bpe_segment("widest", merges) + bpe_segment("unknown", merges)
    assert rows[3] is None
    # encoding is lossless modulo the end-of-word marker
    assert "".join(rows[1]).replace("</w>", " ").strip() == "low newest"
