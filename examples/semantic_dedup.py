"""Semantic dedup pipeline on kaflow_spark (round-13 suite).

The SemDeDup-style screen a training-data pipeline runs BESIDE its
lexical dedup (Abbas et al. 2023): embedding-space near-duplicates
caught with an IVF-clustered candidate pass + exact cosine verify,
then joined back to documents and sources — and compared, pair for
pair, against the lexical char-5-gram screen to show what each
uniquely catches:

pairs       — verified semantic near-dup pairs off the SHARED
              persisted frame (one IVF fit + assignment per corpus —
              q253; every later stage reads the same materialization)
provenance  — which (source, source) cells the semantic duplication
              concentrates in, via the vec_id = doc_id identity
              (q254; off-diagonal = cross-source paraphrase mirroring)
keeper      — SemDeDup greedy keep-lowest-id removal summary per
              source: retention in integer basis points (q255)
overlap     — semantic-vs-lexical pair overlap per source cell: what
              only the embedding screen sees (paraphrase), what only
              the jaccard screen sees (surface copies of embedding-
              distant text), what both see (q256; the lexical side is
              q41's shared verified pair frame — its 7th consumer)
budget draw — exactly-5-per-source WEIGHTED sample (weight=n_chars)
              via priority sampling, the deterministic drawer for the
              q178 mixture-allocator budgets (q257)

    PYTHONPATH=/root/repo python examples/semantic_dedup.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.queries import REGISTRY


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("semantic-dedup", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- the verified semantic pair set (builds the shared frame)
    pairs = REGISTRY["q253_semantic_near_dup"].spark(spark, sf_dir)
    n_pairs = pairs.count()
    print(f"semantic near-dup pairs (cos >= 0.4): {n_pairs}")

    # ---- provenance: where does semantic duplication concentrate
    prov = REGISTRY["q254_semantic_dup_provenance"].spark(spark, sf_dir)
    rows = prov.collect()
    diag = sum(r.n_pairs for r in rows if r.source_a == r.source_b)
    cross = sum(r.n_pairs for r in rows if r.source_a != r.source_b)
    top = max(rows, key=lambda r: r.n_pairs, default=None)
    print(
        f"provenance: {diag} intra-source pairs, {cross} cross-source"
        + (
            f"; hottest cell ({top.source_a}, {top.source_b}) = "
            f"{top.n_pairs}"
            if top
            else ""
        )
    )

    # ---- removal summary under the greedy keeper
    keep = REGISTRY["q255_semantic_dedup_summary"].spark(spark, sf_dir)
    worst = keep.orderBy("kept_bp").limit(3).collect()
    print("lowest retention under semantic dedup:")
    for r in worst:
        print(
            f"  {r.source}: keeps {r.kept_bp} bp "
            f"({r.n_docs - r.n_dropped}/{r.n_docs} docs)"
        )

    # ---- the two screens, side by side (q41's lexical frame shared)
    ov = REGISTRY["q256_semantic_vs_lexical_matrix"].spark(spark, sf_dir)
    agg = ov.agg(
        F.sum("n_semantic").alias("s"),
        F.sum("n_lexical").alias("l"),
        F.sum("n_both").alias("b"),
    ).collect()[0]
    print(
        f"screen overlap: {agg.s} semantic, {agg.l} lexical, "
        f"{agg.b} both — "
        + (
            "disjoint catches justify running both"
            if agg.b < min(agg.s, agg.l)
            else "screens largely agree"
        )
    )

    # ---- the weighted budget draw for the surviving mixture
    draw = REGISTRY["q257_weighted_priority_sample"].spark(spark, sf_dir)
    per = draw.groupBy("source").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("weight").alias("chars"),
    )
    print("weighted draw (exactly 5/source, weight = n_chars):")
    for r in per.orderBy("source").collect():
        print(f"  {r.source}: {r.k} docs, {r.chars} chars sampled")

    # hygiene: release every session-shared frame this pack persisted
    from kaflow_spark.operators.dedup import (
        release_shingle_frames,
        release_verified_pair_frames,
    )
    from kaflow_spark.operators.similarity import (
        release_semantic_pair_frames,
    )
    from kaflow_spark.operators.skew import release_probe_caches

    print(
        f"released {release_semantic_pair_frames()} semantic + "
        f"{release_verified_pair_frames()} lexical pair frame(s), "
        f"{release_shingle_frames()} shingle frame(s), "
        f"{release_probe_caches()} probe cache(s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
