"""End-to-end LLM training-data pipeline on kaflow_spark.

Raw documents -> exact dedup -> near-dup removal (MinHash LSH with
exact-Jaccard verify) -> language filter -> quality filter -> token
accounting + fingerprints. Every stage is an engine operator; the
whole thing is one lazy DataFrame graph (Catalyst sees it end-to-end).

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

    # 3+4. language and quality gates, 5. accounting columns
    cleaned = (
        docs2.withColumn("lang_pred", lang_id("text"))
        .withColumn("quality_bp", quality_score_bp("text"))
        .filter(F.col("lang_pred") == "en")
        .filter(F.col("quality_bp") > 5000)
        .withColumn("n_tokens", token_count_bpe("text"))
        .withColumn("fp", fingerprint("text"))
    )
    stats = cleaned.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.avg("quality_bp").alias("avg_quality_bp"),
    ).first()

    print(f"input docs:          {n0}")
    print(f"after exact dedup:   {n1}  (-{n0 - n1})")
    print(f"after near-dup:      {n2}  (-{n1 - n2})")
    print(
        f"after lang+quality:  {stats['docs']}  "
        f"| tokens: {stats['tokens']:,} "
        f"| avg quality: {stats['avg_quality_bp']:.0f}bp"
    )
    spark.stop()


if __name__ == "__main__":
    main()
