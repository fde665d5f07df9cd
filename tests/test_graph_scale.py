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


# ---------------------------------------------------------------------------
# degree-ordered triangle counting (q206's kernel)


def _brute_triangles(edges):
    import itertools

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(
        1
        for x, y, z in itertools.combinations(sorted(adj), 3)
        if y in adj[x] and z in adj[x] and z in adj[y]
    )


def _edge_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "a long, b long"
    )


def test_triangle_count_matches_bruteforce(spark):
    """Exactness on a seeded random graph: the degree-ordered
    enumeration counts every triangle once and nothing twice."""
    import random

    from kaflow_spark.operators.graph import triangle_count

    rng = random.Random(206)
    edges = {
        tuple(sorted(rng.sample(range(40), 2))) for _ in range(220)
    }
    got = triangle_count(_edge_df(spark, sorted(edges))).collect()[0][
        "n_triangles"
    ]
    want = _brute_triangles(edges)
    assert want > 0, "seeded graph must contain triangles"
    assert got == want


def test_star_hub_emits_zero_wedge_candidates(spark):
    """The hot-vertex hazard the orientation removes: a k-star's hub
    produces ~k^2/4 wedge rows under naive a<b<c enumeration (hub id
    in the middle of the id range) but ZERO under degree ordering —
    every spoke orients INTO the hub, whose out-degree becomes 0."""
    from kaflow_spark.operators.graph import orient_by_degree, oriented_wedges

    k = 200
    hub = k // 2  # middle of the id range: worst case for naive a<b<c
    edges = sorted(
        tuple(sorted((hub, s))) for s in range(k + 1) if s != hub
    )
    df = _edge_df(spark, edges)
    oriented = orient_by_degree(df)
    # every edge points spoke -> hub
    assert oriented.filter(F.col("dst") != hub).count() == 0
    assert oriented_wedges(oriented).count() == 0
    # the naive orientation's hub fan-out, for contrast: below * above
    below = sum(1 for a, b in edges if b == hub)
    above = sum(1 for a, b in edges if a == hub)
    assert below * above == (k // 2) ** 2


def test_oriented_out_degree_bounded(spark):
    """The O(sqrt(2m)) out-degree bound that caps any single reducer's
    wedge fan-out, on a planted hot-cluster (clique) unioned with a
    star — the boilerplate mega-cluster shape."""
    import math

    from kaflow_spark.operators.graph import orient_by_degree, triangle_count

    kc = 40  # clique on ids 0..39
    clique = [(a, b) for a in range(kc) for b in range(a + 1, kc)]
    star = [(1000, s) for s in range(1001, 1201)]
    edges = sorted(clique + [tuple(sorted(e)) for e in star])
    df = _edge_df(spark, edges)

    m = len(edges)
    max_out = (
        orient_by_degree(df)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .agg(F.max("od"))
        .collect()[0][0]
    )
    assert max_out <= math.ceil(math.sqrt(2 * m)), (max_out, m)

    got = triangle_count(df).collect()[0]["n_triangles"]
    assert got == kc * (kc - 1) * (kc - 2) // 6


def test_triangle_count_leaves_no_cached_frame(spark):
    """The oriented edge list is persisted only for the duration of
    the count (computed eagerly) and unpersisted before returning —
    a long-lived session running q206 per bench pass must not
    accumulate cached frames (round-10 verdict item)."""
    from kaflow_spark.operators.graph import triangle_count

    spark.catalog.clearCache()
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a bigint, b bigint"
    )
    out = triangle_count(e)
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), "triangle_count leaked a persisted frame"
    assert out.collect()[0]["n_triangles"] == 1
    assert cm.isEmpty()
