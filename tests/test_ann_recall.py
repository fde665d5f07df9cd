"""Quantitative recall attestation for the approximate similarity
operators (q44 multi-probe multi-table LSH, q63 IVF) — the registry's
only rows-only entries, since ANN output has no exact cross-engine
oracle BY DESIGN. Two complementary measurements replace "trust me":

1. PLANTED STRUCTURE (the operator's actual retrieval job): a seeded
   corpus of uniform noise plus a cluster of near-duplicates of the
   query (cos ~0.95). Both ANN operators must retrieve EVERY planted
   neighbour (recall 1.0) while their candidate set provably prunes
   (selectivity bound asserted) — recall AND pruning together, since
   either alone is trivial.

2. FIXTURE FLOORS: the driver fixture's embeddings are uniform on the
   sphere (measured: mean pairwise cos ~0, top-10 cos ~0.33, zero
   pairs above 0.5) — the information-theoretic worst case, where ANY
   bucketing scheme's recall@10 is ~selectivity + 0.3 (measured over
   a plane/probe/table/nprobe grid; see ann_candidates docstring).
   Everything is seeded, so the measured recalls are deterministic
   constants; pinning them as floors makes a silent quality
   regression in plane generation, probing, or assignment fail
   loudly, without pretending the uniform fixture admits recall 0.9
   at pruning selectivity.
"""

from __future__ import annotations

import math
import random

from kaflow_spark.queries import REGISTRY


def _topk_ids(spark, sf_dir: str, name: str) -> list[int]:
    df = REGISTRY[name].spark(spark, sf_dir)
    id_col = df.columns[0]
    return [r[id_col] for r in df.collect()]


def _planted_corpus(spark):
    """300 seeded uniform vectors (dim 32) + 10 near-duplicates of a
    base vector (gaussian noise, cos ~0.95) + the query = another
    noisy copy. The planted cluster is far above the uniform cosine
    range, so the exact top-10 is exactly the planted set."""
    rng = random.Random(7)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    def noisy(base, eps):
        return unit([b + rng.gauss(0, eps) for b in base])

    base = unit([rng.gauss(0, 1) for _ in range(32)])
    rows = [(i, unit([rng.gauss(0, 1) for _ in range(32)])) for i in range(300)]
    planted = [(1000 + i, noisy(base, 0.1)) for i in range(10)]
    query = noisy(base, 0.1)
    df = spark.createDataFrame(
        rows + planted, "vec_id bigint, embedding array<double>"
    )
    return df, query, {pid for pid, _ in planted}


def test_lsh_planted_recall_is_total_and_pruned(spark):
    from kaflow_spark.operators.similarity import ann_candidates, ann_topk

    df, query, planted = _planted_corpus(spark)
    got = {
        r["vec_id"]
        for r in ann_topk(df, "embedding", "vec_id", query, k=10).collect()
    }
    assert got == planted, f"LSH missed planted neighbours: {planted - got}"
    n_cand = ann_candidates(df, "embedding", query).count()
    assert n_cand < 0.5 * 310, f"LSH candidate set did not prune: {n_cand}/310"


def test_ivf_planted_recall_is_total_and_pruned(spark):
    from kaflow_spark.operators.similarity import ivf_candidates, ivf_topk

    df, query, planted = _planted_corpus(spark)
    got = {
        r["vec_id"]
        for r in ivf_topk(
            df, "embedding", "vec_id", query, k=10, n_lists=8, nprobe=3
        ).collect()
    }
    assert got == planted, f"IVF missed planted neighbours: {planted - got}"
    n_cand = ivf_candidates(
        df, "embedding", query, n_lists=8, nprobe=3
    ).count()
    assert n_cand < 0.75 * 310, f"IVF candidate set did not prune: {n_cand}/310"


def test_fixture_recall_floors_hold(spark, sf_dir):
    """Deterministic (seeded) floors on the uniform driver fixture:
    measured q44 = 0.4 (sf0.001) / 0.3 (sf0.01), q63 = 0.6 / 0.8.
    Floors are the cross-SF minima; a drop below means the bucketing
    machinery itself regressed, not the data."""
    exact = set(_topk_ids(spark, sf_dir, "q38_cosine_topk"))
    assert len(exact) == 10
    a44 = _topk_ids(spark, sf_dir, "q44_ann_topk")
    a63 = _topk_ids(spark, sf_dir, "q63_ivf_topk")
    assert len(a44) == 10, "q44 no longer fills k — candidate set too small"
    recall44 = len(exact & set(a44)) / 10
    recall63 = len(exact & set(a63)) / 10
    assert recall44 >= 0.3, f"q44 fixture recall fell to {recall44}"
    assert recall63 >= 0.6, f"q63 fixture recall fell to {recall63}"
