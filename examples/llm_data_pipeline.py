"""End-to-end LLM training-data pipeline on kaflow_spark.

Raw documents -> exact dedup -> near-dup removal (MinHash LSH with
exact-Jaccard verify) -> language filter -> quality + repetition
filters -> PII scrub -> benchmark decontamination -> per-source quota
-> deterministic train/val/test split -> sequence packing -> token
accounting -> cross-split leakage audit -> context-window chunking +
surprisal scoring. Every stage is an engine operator; the whole thing
is one lazy DataFrame graph (Catalyst sees it end-to-end).

    PYTHONPATH=/root/repo python examples/llm_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.functions.textstats import (
    fingerprint,
    lang_id,
    quality_score_bp,
    token_count_bpe,
)
from kaflow_spark.operators.curation import (
    contamination_overlaps,
    hash_split,
    pack_greedy,
    pii_scrub,
    quota_per_key,
    repetition_stats,
)
from kaflow_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("llm-pipeline", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup: keep lowest doc_id per byte-identical text
    kept_exact = exact_dedup(docs, "text", "doc_id")
    docs1 = docs.join(kept_exact.select("doc_id"), "doc_id", "left_semi")
    n1 = docs1.count()

    # 2. near-dup removal: LSH candidates -> exact-Jaccard verify ->
    #    drop the higher id of each confirmed pair
    cands = minhash_lsh_candidates(docs1, "doc_id", "text").filter(
        F.col("est_jaccard") >= 0.5
    )
    confirmed = ngram_jaccard_pairs(docs1, cands, "doc_id", "text").filter(
        F.col("jaccard") >= 0.8
    )
    losers = confirmed.select(F.col("id_b").alias("doc_id")).distinct()
    docs2 = docs1.join(losers, "doc_id", "left_anti")
    n2 = docs2.count()

    # 2b. exact duplicated-substring audit + clip (Lee et al.): report
    #     the repeated-40-char-span footprint, then CUT those spans.
    #     Both derive from ONE materialized span frame — the 40-gram
    #     explode + corpus-wide hash count is the heaviest stage here
    #     and must not run once per consumer.
    from kaflow_spark.operators.dedup import (
        duplicated_span_ranges,
        remove_duplicated_spans,
    )

    ranges = duplicated_span_ranges(docs2, "doc_id", "text", min_len=40).persist()
    dup_footprint = ranges.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dc")
    ).agg(
        F.count(F.lit(1)).alias("docs_with_dups"),
        F.sum("dc").alias("dup_chars"),
    ).first()
    clipped = remove_duplicated_spans(
        docs2, "doc_id", "text", min_len=40, ranges=ranges
    )
    docs2 = (
        docs2.drop("text")
        .join(clipped, "doc_id")
        .withColumnRenamed("text_clipped", "text")
        .filter(F.length("text") >= 40)  # drop docs clipped to stubs
        .persist()  # downstream stages fan out from here repeatedly
    )
    n2b = docs2.count()
    ranges.unpersist()

    # 3+4. language, quality, and repetition gates; PII scrub
    rep = repetition_stats(docs2, "doc_id", "text")
    docs3 = (
        docs2.join(rep.select("doc_id", "top_bp"), "doc_id")
        .withColumn("lang_pred", lang_id("text"))
        .withColumn("quality_bp", quality_score_bp("text"))
        .filter(F.col("lang_pred") == "en")
        .filter(F.col("quality_bp") > 5000)
        .filter(F.col("top_bp") < 3000)  # Gopher-style repetition cap
        .withColumn("text", pii_scrub("text"))
    )
    n3 = docs3.count()

    # 5. benchmark decontamination (fixture benchmark: every 97th doc)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), F.col("text").alias("btext")
    )
    dirty = contamination_overlaps(
        docs3, bench, "doc_id", "text", "bench_id", "btext",
        k=8, min_overlap=50,
    ).filter(F.col("doc_id") != F.col("bench_id")).select("doc_id").distinct()
    docs4 = docs3.join(dirty, "doc_id", "left_anti")
    n4 = docs4.count()

    # 6. per-source quota, 7. deterministic split, 8. packing
    docs5 = quota_per_key(docs4, "source", "doc_id", 1000)
    split = hash_split(docs5, "doc_id", {"train": 0.96, "val": 0.02, "test": 0.02})
    train = (
        split.filter(F.col("split") == "train")
        .withColumn("n_tokens", token_count_bpe("text"))
        .withColumn("fp", fingerprint("text", stride=4))
    )
    packed = pack_greedy(train, "source", "doc_id", "n_tokens", 2048)

    # 9. leakage audit: verified near-dup pairs must not straddle splits
    from kaflow_spark.operators.curation import cross_split_pairs

    leaks = cross_split_pairs(
        confirmed.select("id_a", "id_b"),
        split.select("doc_id", "split"),
        "doc_id",
    ).count()

    # 10. context-window chunking of the train split + surprisal score
    from kaflow_spark.operators.curation import (
        chunk_with_overlap,
        unigram_surprisal,
    )

    chunks = chunk_with_overlap(
        train, "doc_id", "text", chunk_tokens=128, stride=96
    )
    n_chunks = chunks.count()
    surp = unigram_surprisal(train, "doc_id", "text").agg(
        F.avg("bits_bp").alias("avg_bits_bp")
    ).first()

    # 10b. corpus health panel: bigram-LM surprisal (catches garbled
    #      text whose individual words are common), per-source 3-gram
    #      diversity (mode-collapse check), and difficulty deciles
    #      (curriculum tiers, computed without a global sort)
    from kaflow_spark.operators.curation import ngram_diversity, ngram_surprisal

    bi = ngram_surprisal(train, "doc_id", "text", n=2).agg(
        F.avg("bits_bp").alias("avg_bits_bp")
    ).first()
    low_div = (
        ngram_diversity(train, "source", "text", n=3)
        .orderBy("diversity_bp")
        .first()
    )

    # 10c. lexical retrieval sanity probe: for each benchmark item,
    #      the nearest TRAIN docs by integer TF-IDF — after
    #      decontamination these should be lexically distant
    from kaflow_spark.operators.curation import lexical_retrieval_topk

    near = lexical_retrieval_topk(
        train, bench, "doc_id", "text", "bench_id", "btext", k=1
    )
    max_near = near.agg(F.max("score").alias("s")).first()["s"]

    stats = packed.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.avg("quality_bp").alias("avg_quality_bp"),
        (F.max("bin_id") + 1).alias("bins_in_largest_source"),
    ).first()
    splits = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}

    print(f"input docs:              {n0}")
    print(f"after exact dedup:       {n1}  (-{n0 - n1})")
    print(f"after near-dup:          {n2}  (-{n1 - n2})")
    print(
        f"dup-substring audit:     {dup_footprint['docs_with_dups']} docs "
        f"carry {dup_footprint['dup_chars'] or 0} duplicated chars (40+-spans)"
    )
    print(f"after span clip:         {n2b}  (clipped docs <40 chars dropped)")
    print(f"after lang/qual/rep+PII: {n3}  (-{n2b - n3})")
    print(f"after decontamination:   {n4}  (-{n3 - n4})")
    print(f"splits:                  {splits}")
    print(f"cross-split leak pairs:  {leaks}  (post-near-dup-removal: want 0)")
    print(
        f"train chunks (128/96):   {n_chunks} "
        f"| avg surprisal: {surp['avg_bits_bp'] / 10000:.2f} bits/token"
    )
    print(
        f"bigram surprisal:        {bi['avg_bits_bp'] / 10000:.2f} bits/pair "
        f"| least-diverse source: {low_div['source']} "
        f"({low_div['diversity_bp'] / 100:.0f}% distinct 3-grams)"
    )
    print(f"max bench-vs-train TF-IDF score after decontam: {max_near}")
    print(
        f"train set:               {stats['docs']} docs "
        f"| tokens: {stats['tokens']:,} "
        f"| avg quality: {stats['avg_quality_bp']:.0f}bp "
        f"| ~2048-tok bins (largest source): {stats['bins_in_largest_source']}"
    )

    # 10. tokenizer training on the final train split: distributed
    #     word counts feed the exact BPE merge loop; encode a sample
    from kaflow_spark.operators.tokenizer import encode_bpe, train_bpe, word_freqs

    merges = train_bpe(word_freqs(train, "text"), num_merges=64)
    sample = encode_bpe(train.limit(1), "text", merges).first()
    n_sample = len(sample["bpe_tokens"]) if sample and sample["bpe_tokens"] else 0
    print(
        f"BPE tokenizer:           {len(merges)} merges trained "
        f"| sample doc -> {n_sample} subword tokens"
    )

    # 11. ship it: deterministic shuffle + shard assignment — the
    #     reproducible data-loader permutation (the natural
    #     write.partitionBy key at cluster scale)
    from kaflow_spark.operators.curation import shuffle_shards

    shards = shuffle_shards(train, "doc_id", n_shards=8)
    shard_sizes = {
        r["shard"]: r["n"]
        for r in shards.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"training shards:         {dict(sorted(shard_sizes.items()))}")
    spark.stop()


if __name__ == "__main__":
    main()
