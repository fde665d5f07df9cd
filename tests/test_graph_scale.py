"""Scale evidence for the connected-components min-label tier.

q83's graph normally takes the single-partition exact tier (the
verified near-dup graph is tiny relative to the corpus); the 100 TB
story rests on the min-label iteration tier, so this forces it
(``single_partition_max=0``) on the REAL q83 pair graph at sf0.1 and
asserts the two design invariants the operator's docs claim:

* dedup clusters are near-cliques, so label propagation converges in
  a bounded number of rounds (<= 4 including the final no-change
  round) no matter the corpus size;
* each round costs one driver action — the sum-aggregation that both
  materializes the round's persisted labels and yields the monotone
  convergence signal (no separate old-vs-new comparison job). The
  checkable form: the OBSERVED Spark job count inside the loop (job
  group, not a hand-maintained counter) stays at a small AQE-stage
  constant per round (~5 measured); a second action slipped into the
  loop would push jobs-per-round past the bound.
"""

from __future__ import annotations

from pyspark.sql import functions as F

BENCH_SF = "/root/testdata/sf0.1"


def test_cc_min_label_tier_at_bench_scale(spark):
    from kaflow_spark.catalog import load
    from kaflow_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        shingle_frame,
    )
    from kaflow_spark.operators.graph import connected_components

    d = load(spark, BENCH_SF, "documents")
    sh = shingle_frame(d, "doc_id", "text", 5)
    cand = (
        minhash_lsh_candidates(d, "doc_id", "text", min_bands=2, shingles=sh)
        .filter(F.col("est_jaccard") >= 0.7)
        .select("id_a", "id_b")
    )
    pairs = ngram_jaccard_pairs(d, cand, "doc_id", "text", shingles=sh).filter(
        F.col("jaccard") >= 0.9
    )
    # repartition wide so the contraction tier sees a genuinely
    # distributed edge set (not one lucky partition)
    pairs = pairs.repartition(16).persist()
    assert pairs.count() > 0, "fixture must contain near-dup pairs"

    stats: dict = {}
    forced = connected_components(
        pairs, "id_a", "id_b", single_partition_max=0, stats=stats
    )
    got = {(r["node"], r["component"]) for r in forced.collect()}

    assert stats["tier"] == "min_label"
    # convergence in <=4 rounds (last round is the no-change detector)
    assert 1 <= stats["rounds"] <= 4, stats
    # one action per round == jobs bounded by the AQE-stage constant
    assert 0 < stats["loop_jobs"] <= 7 * stats["rounds"], stats

    # and the forced tier agrees with the exact single-partition solve
    exact = connected_components(pairs, "id_a", "id_b")
    want = {(r["node"], r["component"]) for r in exact.collect()}
    pairs.unpersist()
    assert got == want
