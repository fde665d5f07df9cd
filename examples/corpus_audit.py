"""End-to-end corpus & entity audit on kaflow_spark (round-6 suite).

The pre-flight checks a data team runs BEFORE committing mixture
weights and kicking off a 100 TB tokenization run:

mixture audits  — source-pair overlap matrix, per-source histogram
                  drift, cross-source quantile calibration, winsorized
                  robust stats
repetition      — intra-document duplicated-window coverage (Gopher)
redundancy      — four independent near-dup candidate generators
                  (MinHash / SimHash / prefix-filter / winnowing)
                  reconciled against each other
entity quality  — edit-distance<=1 key matching (indel family) next to
                  the Hamming matcher
vectors         — int8 quantization audit of the embedding table

Every stage is an engine operator; outputs are small audit frames.

    PYTHONPATH=/root/repo python examples/corpus_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.operators.curation import (
    group_shingle_overlap,
    histogram_drift_l1,
    quantile_normalize,
    winsorized_stats,
)
from kaflow_spark.operators.dedup import (
    intra_doc_repetition,
    minhash_lsh_candidates,
    minimizer_candidates,
    ngram_jaccard_pairs,
    prefix_filter_candidates,
    shingle_frame,
    simhash_near_dups,
    wordgram_shingle_frame,
)
from kaflow_spark.operators.embeddings import int8_quantization_audit
from kaflow_spark.operators.resolution import edit_distance_pairs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("corpus-audit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")

    # ---- 1. mixture audits -------------------------------------------
    overlap = group_shingle_overlap(docs, "source", "text", 5)
    hot = overlap.orderBy(F.col("jaccard_bp").desc()).limit(5).collect()
    print("source-pair overlap (top-5 by Jaccard bp):")
    for r in hot:
        print(f"  {r.group_a} ~ {r.group_b}: shared={r.shared} "
              f"jaccard={r.jaccard_bp}bp")

    drift = histogram_drift_l1(docs, "source", "n_chars", 64)
    worst = drift.orderBy(F.col("l1_bp").desc()).limit(3).collect()
    print("length-histogram drift vs global mixture (worst 3):")
    for r in worst:
        print(f"  {r.source}: n={r.n_docs} L1={r.l1_bp}bp")

    robust = winsorized_stats(docs, "source", "n_chars", 5, 95)
    print("winsorized length stats (first 3 sources):")
    for r in robust.orderBy("source").limit(3).collect():
        print(f"  {r.source}: n={r.n_docs} clamp=[{r.lo},{r.hi}] "
              f"wmean={r.wmean_c / 100:.1f}")

    calib = quantile_normalize(docs, "source", "n_chars")
    moved = calib.filter(
        F.abs(F.col("calib") - F.col("n_chars")) > 50
    ).count()
    print(f"quantile normalization: {moved} (source,value) cells move "
          ">50 chars when calibrated to the global distribution")

    # ---- 2. intra-document repetition (Gopher filter) ----------------
    rep = intra_doc_repetition(docs, "doc_id", "text", min_len=15)
    flagged = rep.filter(F.col("rep_bp") > 0)
    print(f"intra-doc repetition: {flagged.count()} docs carry "
          "duplicated >=15-char windows")

    # ---- 3. redundancy: four generators, one verify contract ---------
    sh = shingle_frame(docs, "doc_id", "text", 5)
    mh = (
        minhash_lsh_candidates(docs, "doc_id", "text", min_bands=2, shingles=sh)
        .filter(F.col("est_jaccard") >= 0.7).select("id_a", "id_b")
    )
    sim = simhash_near_dups(
        docs, "doc_id", "text", ngram=5, max_hamming=10, block_bits=8,
        shingles=sh,
    ).select("id_a", "id_b")
    wsh = wordgram_shingle_frame(docs, "doc_id", "text", 5)
    pf = prefix_filter_candidates(wsh, 0.5)
    wn = minimizer_candidates(
        docs, "doc_id", "text", k=5, w=4, min_shared=1, unit="word"
    ).select("id_a", "id_b")

    def verified(cand):
        return {
            (r.id_a, r.id_b)
            for r in ngram_jaccard_pairs(docs, cand, "doc_id", "text", shingles=sh)
            .filter(F.col("jaccard") >= 0.9).collect()
        }

    sets = {name: verified(c) for name, c in
            [("minhash", mh), ("simhash", sim), ("prefix", pf), ("winnow", wn)]}
    union = set().union(*sets.values())
    print("near-dup generators reconciled (pairs at exact Jaccard >= 0.9):")
    for name, s in sets.items():
        print(f"  {name:8s}: {len(s)} pairs, misses vs union: {len(union - s)}")

    # ---- 4. entity-key audit -----------------------------------------
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    ed = edit_distance_pairs(cust, "c_custkey", "c_name")
    print(f"edit-distance<=1 customer-name pairs: {ed.count()}")

    # ---- 5. embedding quantization audit -----------------------------
    emb = load(spark, sf_dir, "embeddings")
    qa = int8_quantization_audit(emb, "vec_id", "embedding")
    stats = qa.agg(
        F.count("*").alias("n"),
        F.sum("n_sat").alias("sat"),
        F.max("l1_q").alias("max_l1"),
    ).head()
    print(f"int8 quantization: {stats.n} vectors, {stats.sat} saturated "
          f"lanes total, max per-vector L1 {stats.max_l1}")

    # ---- 6. one-call entry points ------------------------------------
    from kaflow_spark.operators.dedup import dedup_corpus

    kept = dedup_corpus(docs, "doc_id", "text", method="winnow",
                        threshold=0.9, pairs=None)
    print(f"dedup_corpus(method='winnow'): {docs.count()} -> "
          f"{kept.count()} docs after canonical-keeper removal")

    # ---- 7. importance resampling toward a target distribution -------
    from kaflow_spark.operators.curation import (
        dsir_importance,
        score_separation_auc,
    )

    weights = dsir_importance(
        docs, "doc_id", "text", F.col("lang") == "en", n=2, buckets=4096
    )
    [auc] = score_separation_auc(weights, "dsir_bits", "is_target").collect()
    top = weights.orderBy(F.col("dsir_milli").desc(), "doc_id").limit(3).collect()
    print(f"DSIR weights: separation AUC {auc.auc_bp}bp over "
          f"{auc.n_flagged}+{auc.n_rest} docs; top target-like docs: "
          + ", ".join(f"doc {r.doc_id} ({r.dsir_milli}m)" for r in top))

    spark.stop()
    print("corpus audit complete.")


if __name__ == "__main__":
    main()
