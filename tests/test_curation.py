"""Dataset-curation operator semantics (oracle parity is covered by
test_oracle.py q68-q72; these test the operator contracts directly)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kaflow_spark.operators.curation import (
    contamination_overlaps,
    contamination_overlaps_wordgrams,
    hash_split,
    pack_greedy,
    pii_scrub,
    quota_per_key,
)


def test_contamination_finds_planted_overlap_and_broadcasts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text about spark executors and shuffles"),
            (3, "xx the quick brown fox jumps over the lazy dog xx"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, btext string",
    )
    out = contamination_overlaps(
        corpus, bench, "doc_id", "text", "bench_id", "btext", k=8, min_overlap=10
    )
    rows = {(r["doc_id"], r["bench_id"]): r["overlap"] for r in out.collect()}
    assert (1, 100) in rows and (3, 100) in rows
    assert (2, 100) not in rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_contamination_wordgrams_semantics(spark):
    """Word-8-gram screen: an 8+-word shared span is detected, short
    or reworded overlaps are not; benchmark side broadcasts."""
    shared = "one two three four five six seven eight nine"
    corpus = spark.createDataFrame(
        [
            (1, f"prefix words {shared} suffix words"),
            (2, "completely different text with no long shared span at all here"),
            (3, "one two three four five SIX seven eight nine ten eleven twelve"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"intro {shared} outro")], "bench_id long, btext string"
    )
    out = contamination_overlaps_wordgrams(
        corpus, bench, "doc_id", "text", "bench_id", "btext", n=8, min_overlap=1
    )
    rows = {(r["doc_id"], r["bench_id"]): r["overlap"] for r in out.collect()}
    # 9 shared words => two distinct 8-grams
    assert rows == {(1, 100): 2}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_contamination_wordgrams_short_doc_single_gram(spark):
    corpus = spark.createDataFrame(
        [(1, "  tiny   doc  "), (2, "tiny doc")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, "tiny doc")], "bench_id long, btext string"
    )
    out = contamination_overlaps_wordgrams(
        corpus, bench, "doc_id", "text", "bench_id", "btext", n=8, min_overlap=1
    )
    rows = {(r["doc_id"], r["bench_id"]): r["overlap"] for r in out.collect()}
    # whitespace-normalized full word sequence is the single gram
    assert rows == {(1, 9): 1, (2, 9): 1}


def test_quota_per_key_caps_deterministically(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)],
        "doc_id long, source string",
    )
    kept = quota_per_key(df, "source", "doc_id", 10)
    per = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per == {"a": 10, "b": 10}
    # first-N in order: the kept doc_ids are the 10 smallest per source
    a_ids = sorted(r["doc_id"] for r in kept.filter("source='a'").collect())
    assert a_ids == [0, 2, 4, 6, 8, 10, 12, 14, 16, 18]


def test_hash_split_is_stable_and_partition_invariant(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", w).collect()}
    s2 = {
        r["doc_id"]: r["split"]
        for r in hash_split(df.repartition(13), "doc_id", w).collect()
    }
    assert s1 == s2  # split must not depend on physical layout
    # matches a pure-python md5 reference implementation
    def ref(i: int) -> str:
        p = hashlib.md5(str(i).encode()).hexdigest()[:8]
        t_train = format(int(0.8 * (1 << 32)), "08x")
        t_val = format(int(0.9 * (1 << 32)), "08x")
        return "train" if p < t_train else ("val" if p < t_val else "test")

    assert all(s1[i] == ref(i) for i in range(2000))
    # fractions land near the weights on 2000 ids
    from collections import Counter

    c = Counter(s1.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.05
    # salt migrates assignments
    s3 = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", w, salt="v2").collect()
    }
    assert s3 != s1


def test_hash_split_no_shuffle(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    plan = (
        hash_split(df, "doc_id", {"train": 0.9, "test": 0.1})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pack_greedy_contract(spark):
    df = spark.createDataFrame(
        [(i, "s", 600) for i in range(10)], "doc_id long, source string, ntok long"
    )
    packed = {r["doc_id"]: r["bin_id"] for r in
              pack_greedy(df, "source", "doc_id", "ntok", 2048).collect()}
    # prefix sums before: 0,600,...,5400 -> bins 0,0,0,0,1,1,1,2,2,2
    assert [packed[i] for i in range(10)] == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]
    # bins are contiguous runs in order and every doc is assigned
    assert len(packed) == 10


def test_pii_scrub_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk now"),
            (2, "server at 10.0.255.1 rebooted"),
            (3, "call +1 (555) 123-4567 today"),
            (4, "clean text stays clean"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["c"] for r in df.select("id", pii_scrub("text").alias("c")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server at <IP> rebooted"
    assert "<PHONE>" in out[3]
    assert out[4] == "clean text stays clean"


def test_repetition_stats_counts(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y z w")], "doc_id long, text string"
    )
    from kaflow_spark.operators.curation import repetition_stats

    out = {r["doc_id"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert out[1]["ntok"] == 4 and out[1]["ndistinct"] == 2
    assert out[1]["top_count"] == 3 and out[1]["top_bp"] == 7500
    assert out[2]["ndistinct"] == 4 and out[2]["top_bp"] == 2500


def test_top_ngrams_total_order(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b q r")], "doc_id long, text string"
    )
    from kaflow_spark.operators.curation import top_ngrams

    rows = [(r["gram"], r["n"]) for r in top_ngrams(df, "text", 2, 3).collect()]
    # 'a b' x3; then ties at 1 resolve lexicographically
    assert rows[0] == ("a b", 3)
    assert rows[1:] == [("b a", 1), ("b c", 1)]


def test_stratified_sample_is_stable_and_monotone(spark):
    from kaflow_spark.operators.curation import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(1000)],
        "doc_id long, source string",
    )
    kept = {r["doc_id"] for r in
            stratified_sample(df, "source", "doc_id", {"a": 0.5}, default_fraction=0.1).collect()}
    kept2 = {r["doc_id"] for r in
             stratified_sample(df.repartition(7), "source", "doc_id", {"a": 0.5}, default_fraction=0.1).collect()}
    assert kept == kept2  # layout-invariant
    # raising a fraction only ADDS ids (monotone: growing quota never churns)
    kept_75 = {r["doc_id"] for r in
               stratified_sample(df, "source", "doc_id", {"a": 0.75}, default_fraction=0.1).collect()}
    assert kept <= kept_75
    # fractions land near targets
    a_kept = sum(1 for i in kept if i % 2 == 0)
    b_kept = sum(1 for i in kept if i % 2 == 1)
    assert abs(a_kept / 500 - 0.5) < 0.08 and abs(b_kept / 500 - 0.1) < 0.05


def test_chunk_with_overlap_shapes(spark):
    from kaflow_spark.operators.curation import chunk_with_overlap

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # 10 tokens
            (2, "x y z"),                 # shorter than one chunk
            (3, ""),                      # empty doc
            (4, "p q r s"),               # exactly one chunk
        ],
        "doc_id long, text string",
    )
    out = chunk_with_overlap(df, "doc_id", "text", chunk_tokens=4, stride=3)
    rows = {(r["doc_id"], r["chunk_idx"]): (r["ntok"], r["chunk_text"])
            for r in out.collect()}
    # doc 1: starts 0,3,6 cover all 10 tokens; last start = ceil(6/3)=2? -> 9//3=2... starts 0,3,6 end at 9<10 so one more
    assert rows[(1, 0)] == (4, "a b c d")
    assert rows[(1, 1)] == (4, "d e f g")
    assert rows[(1, 2)] == (4, "g h i j")
    assert (1, 3) not in rows  # window [6,10) reaches the end at idx 2
    assert rows[(2, 0)] == (3, "x y z")
    assert rows[(3, 0)] == (0, "")
    assert rows[(4, 0)] == (4, "p q r s")
    # every chunk after the first overlaps its predecessor by chunk-stride
    assert rows[(1, 1)][1].split()[0] == rows[(1, 0)][1].split()[-1]


def test_doc_frequency_and_funnel(spark):
    from kaflow_spark.operators.curation import doc_frequency, retention_funnel

    df = spark.createDataFrame(
        [
            (1, "s0", "the cat sat"),
            (2, "s0", "the dog ran"),
            (3, "s1", "the cat sat"),   # exact dup of doc 1
            (4, "s1", "a bird"),
        ],
        "doc_id long, source string, text string",
    )
    freq = {r["token"]: (r["df_docs"], r["total_count"], r["df_bp"])
            for r in doc_frequency(df, "doc_id", "text").collect()}
    assert freq["the"] == (3, 3, 7500)
    assert freq["cat"] == (2, 2, 5000)
    assert freq["a"] == (1, 1, 2500)
    only_common = doc_frequency(df, "doc_id", "text", min_doc_bp=6000)
    assert {r["token"] for r in only_common.collect()} == {"the"}

    fun = {r["source"]: (r["n_total"], r["n_unique"])
           for r in retention_funnel(
               df, "doc_id", "source", "text", min_score_bp=-10**9).collect()}
    # doc 3 loses exact dedup to doc 1 (min id per identical text)
    assert fun["s0"] == (2, 2)
    assert fun["s1"] == (2, 1)


def test_connected_components_paths_and_cliques(spark):
    from kaflow_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        # a path 1-2-3-4 (diameter 3), a triangle 10-11-12, an isolated pair
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "a long, b long",
    )
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    out = {r["node"]: r["component"] for r in
           connected_components(edges, "a", "b").collect()}
    assert out == expect
    # force the contraction + min-label iteration tier (big-graph path)
    out_iter = {r["node"]: r["component"] for r in
                connected_components(edges.repartition(4), "a", "b",
                                     single_partition_max=0).collect()}
    assert out_iter == expect


def test_temperature_fractions_properties():
    from kaflow_spark.operators.curation import temperature_fractions

    counts = {"big": 10000, "mid": 4000, "small": 1000}
    fr = temperature_fractions(counts, alpha=0.5, target_total=3000)
    # fractions are valid probabilities and only downsample
    assert all(0.0 <= f <= 1.0 for f in fr.values())
    # temperature up-weights small domains: small keeps a larger share
    assert fr["small"] > fr["mid"] > fr["big"]
    # alpha=1 reproduces the natural mix: uniform keep fraction
    nat = temperature_fractions(counts, alpha=1.0, target_total=3000)
    vals = [nat[s] for s in counts]
    assert max(vals) - min(vals) < 1e-9
    # alpha=0 targets equal per-domain counts (capped at 1.0)
    uni = temperature_fractions(counts, alpha=0.0, target_total=300)
    kept = {s: uni[s] * counts[s] for s in counts}
    assert abs(kept["big"] - 100) < 1 and abs(kept["mid"] - 100) < 1
    assert abs(kept["small"] - 100) < 1


def test_tfidf_top_terms_exact_and_ranked(spark):
    from kaflow_spark.operators.curation import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry dates"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, "doc_id", "text", k=2)
    rows = {
        (r["doc_id"], r["term_rank"]): (r["token"], r["tfidf_bp"])
        for r in out.collect()
    }
    # doc 1: apple c=2 ntok=3 df=1 -> 2*3*10000//(3*1) = 20000
    #        banana c=1 df=2       -> 1*3*10000//(3*2) = 5000
    assert rows[(1, 1)] == ("apple", 20000)
    assert rows[(1, 2)] == ("banana", 5000)
    # doc 3: dates c=1 ntok=4 df=1 -> 30000//4 = 7500
    #        cherry c=3 df=2       -> 3*3*10000//(4*2) = 11250
    assert rows[(3, 1)] == ("cherry", 11250)
    assert rows[(3, 2)] == ("dates", 7500)
    # k caps the output: no rank-3 rows anywhere
    assert all(rk <= 2 for (_, rk) in rows)


def test_unigram_surprisal_floor_log2(spark):
    from kaflow_spark.operators.curation import unigram_surprisal

    df = spark.createDataFrame(
        # corpus: "a" x4, "b" x2, "rare" x1, "x" x1 -> grand total 8
        [(1, "a a a a b"), (2, "b rare x")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["ntok"], r["bits_bp"]) for r in
           unigram_surprisal(df, "doc_id", "text").collect()}
    # bits: a -> log2(8//4)=1, b -> log2(8//2)=2, rare/x -> log2(8//1)=3
    # doc 1: (4*1 + 1*2)*10000 // 5 = 12000
    # doc 2: (2 + 3 + 3)*10000 // 3 = 26666
    assert out[1] == (5, 12000)
    assert out[2] == (3, 26666)


def test_cross_split_pairs_filters_and_passthrough(spark):
    from kaflow_spark.operators.curation import cross_split_pairs

    pairs = spark.createDataFrame(
        [(1, 2, 0.95), (3, 4, 0.91)], "id_a long, id_b long, jaccard double"
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "train")],
        "doc_id long, split string",
    )
    out = cross_split_pairs(pairs, splits, "doc_id").collect()
    # only the (1,2) pair crosses; extra columns pass through
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"], r["split_a"], r["split_b"], r["jaccard"]) \
        == (1, 2, "train", "test", 0.95)


def test_ngram_surprisal_bigram_hand_example(spark):
    """Corpus grams: doc1 -> 'a b','b a','a b'; doc2 -> 'c d'.
    Totals: tc('a b')=2, tc('b a')=1, tc('c d')=1, grand total g=4.
    bits = floor_log2(g // tc): 'a b' -> 1, 'b a' -> 2, 'c d' -> 2."""
    from kaflow_spark.operators.curation import ngram_surprisal

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in ngram_surprisal(df, "doc_id", "text", 2).collect()}
    assert out[1]["ngrams"] == 3
    assert out[2]["ngrams"] == 1
    # doc2's only bigram 'c d' is corpus-unique: bits = floor_log2(4//1) = 2
    assert out[2]["bits_bp"] == 20000
    # doc1: (2 grams x 1 bit + 1 gram x 2 bits) * 10000 // 3 = 13333
    assert out[1]["bits_bp"] == 13333


def test_ngram_diversity_repetition_scores_low(spark):
    """A source repeating one sentence scores lower than a varied one."""
    from kaflow_spark.operators.curation import ngram_diversity

    rep = [("rep", "the cat sat on the mat")] * 5
    var = [("var", f"a{i} b{i} c{i} d{i}") for i in range(5)]
    df = spark.createDataFrame(rep + var, "source string, text string")
    out = {r["source"]: r for r in ngram_diversity(df, "source", "text", 3).collect()}
    assert out["rep"]["total_ngrams"] == 20 and out["rep"]["distinct_ngrams"] == 4
    assert out["rep"]["diversity_bp"] == 2000
    assert out["var"]["diversity_bp"] == 10000


def test_word_gram_array_short_docs_empty(spark):
    from pyspark.sql import functions as F
    from kaflow_spark.operators.curation import word_gram_array, _tokens

    df = spark.createDataFrame([("one two",), ("one",), ("",)], "text string")
    out = df.select(_tokens("text").alias("w")).select(
        word_gram_array("w", 3).alias("g")
    ).collect()
    assert [r["g"] for r in out] == [[], [], []]


def test_lexical_retrieval_ranks_shared_rare_terms(spark):
    """The doc sharing the query's RARE term outranks one sharing only
    a ubiquitous term; self-match is excluded."""
    from kaflow_spark.operators.curation import lexical_retrieval_topk

    corpus = spark.createDataFrame(
        [
            (1, "common zebra common"),
            (2, "common common common"),
            (3, "zebra zebra common"),
            (4, "unrelated words only"),
        ],
        "doc_id bigint, text string",
    )
    q = corpus.filter("doc_id = 1")
    out = lexical_retrieval_topk(
        corpus, q, "doc_id", "text", "doc_id", "text", k=2
    ).collect()
    assert [r["doc_id"] for r in out] == [3, 2]  # zebra doc first, no self
    assert out[0]["query_id"] == 1 and out[0]["rank"] == 1
    assert out[0]["score"] > out[1]["score"]


def test_integer_argmax_key_decode_is_exact_past_2_53(spark):
    """Regression (review-caught): q137's keeper decode must use bigint
    `div`, not floor(a / b) — long/long `/` promotes to double and
    argkeys ~10^17 lose exactness past 2^53. Verifies the exact
    encode/decode round-trip at the adversarial point (high score,
    doc_id=0) and for negative scores."""
    from pyspark.sql import functions as F

    rows = [(9500, 0), (9500, 1), (20000, 10**11), (-20000, 7), (0, 0)]
    df = spark.createDataFrame(rows, "score_bp bigint, doc_id bigint")
    stride = F.lit(10**12)
    enc = df.select(
        "score_bp",
        "doc_id",
        ((F.col("score_bp") + 100000) * stride - (F.col("doc_id") + 1)).alias(
            "argkey"
        ),
    )
    dec = enc.select(
        "score_bp",
        "doc_id",
        ((F.expr("argkey div 1000000000000") + 1) * stride - F.col("argkey") - 1)
        .cast("bigint")
        .alias("id2"),
        (F.expr("argkey div 1000000000000") + 1 - 100000)
        .cast("bigint")
        .alias("score2"),
    )
    for r in dec.collect():
        assert r["id2"] == r["doc_id"] and r["score2"] == r["score_bp"], r


def test_pmi_collocations_hand_case(spark):
    """A planted always-adjacent pair must outscore independent
    common words, with the exact floor-log2 value."""
    from kaflow_spark.operators.curation import pmi_collocations

    # 'alpha beta' always adjacent (8 times); 'x'/'y' common but
    # never adjacent to each other more than chance
    rows = [(i, "alpha beta x y x y x y") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = pmi_collocations(df, "doc_id", "text", min_count=5, top_k=5).collect()
    top = got[0]
    assert (top["w1"], top["w2"]) == ("alpha", "beta")
    # exact check: N=64 tokens, M=56 bigrams, n_xy=8, n_alpha=n_beta=8
    # ratio = 8*64*64 / (56*8*8) = 32768/3584 -> q=9 -> bits=3
    assert top["n_xy"] == 8 and top["pmi_bits"] == 3
    # 'x y' occurs 24x but x,y are high-frequency: ratio
    # 24*64*64/(56*24*24) = 98304/32256 -> q=3 -> bits=1
    xy = [r for r in got if (r["w1"], r["w2"]) == ("x", "y")]
    assert xy and xy[0]["pmi_bits"] == 1
