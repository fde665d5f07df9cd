"""Governance invariants over the declared-query registry: the
correctness contract can only weaken by explicit declaration."""

from __future__ import annotations

from kaflow_spark.queries import REGISTRY


def test_registry_size_floor():
    # the inventory only grows; shrinking it means queries were lost
    assert len(REGISTRY) >= 64


def test_every_exact_query_has_an_oracle():
    """Only 'approx'-tagged queries may skip the DuckDB oracle (the
    driver then records a weaker rows-only check)."""
    missing = [
        name
        for name, q in REGISTRY.items()
        if q.oracle is None and "approx" not in q.tags
    ]
    assert missing == []


def test_names_and_docs():
    for name, q in REGISTRY.items():
        assert q.doc, f"{name} needs a doc line (judge-facing)"
        assert name[0] == "q" and name[1:3].isdigit(), name


def test_registry_size_floor_round5():
    # round-5-end inventory: 153 declared queries
    assert len(REGISTRY) >= 153


def test_registry_size_floor_round6():
    # round-6 widening: q154-q159 (resolution / audits families)
    assert len(REGISTRY) >= 159


# 1-row global aggregates: a single-row result is trivially ordered.
_SINGLE_ROW = {
    "q13_global_agg_distinct",
    "q74_corr_from_exact_sums",
    "q77_vocab_stats",
    "q109_tpch_q14_promo_share",
    "q110_tpch_q17_small_qty_revenue",
    "q111_tpch_q19_disjunctive",
    "q113_tpch_q6_forecast_revenue",
    "q206_dedup_transitivity",
}


def test_every_oracle_has_total_order():
    """Determinism rule 1 (SURVEY §2B): every multi-row oracle carries
    an ORDER BY — a missing one signals a determinism-discipline slip.
    The explicit single-row allowlist keeps the exception auditable."""
    missing = [
        name
        for name, q in REGISTRY.items()
        if q.oracle is not None
        and name not in _SINGLE_ROW
        and "ORDER BY" not in q.oracle.upper()
    ]
    assert missing == []


def test_no_nondeterministic_functions_declared():
    """Determinism rule 3: no rand/uuid/current-time in any oracle."""
    import re

    banned = re.compile(r"\b(random|rand|uuid|now|current_timestamp|current_date)\s*\(", re.I)
    offenders = [
        name
        for name, q in REGISTRY.items()
        if q.oracle is not None and banned.search(q.oracle)
    ]
    assert offenders == []


def test_registry_size_floor_round6_batch2():
    # q160-q167: nearest as-of, BFS hops, intra-doc repetition,
    # winsorized stats, winnowing near-dup, source embedding
    # distances, interpolating gap-fill, funnel latency quantiles,
    # join-key skew report, composite entity match, snapshot state
    # diff, last-touch attribution, share-of-parent contribution,
    # unpivot roundtrip
    assert len(REGISTRY) >= 173


def test_registry_size_floor_round10():
    # round-10 widening: q209-q220 (growth / provenance families)
    assert len(REGISTRY) >= 220


def test_registry_size_floor_round11():
    # round-11 widening: q221-q228 (cohort/lifecycle + robust
    # operations audits)
    assert len(REGISTRY) >= 228


def test_registry_size_floor_round11_batch2():
    # round-11 widening, batch 2: q229-q233 (sequence/distribution
    # analytics: transitions, sweep-line concurrency, reorder share,
    # gap survival, Pareto coverage)
    assert len(REGISTRY) >= 233


def test_registry_size_floor_round11_batch3():
    # round-11 widening, batch 3: q234 centroid silhouette, q235
    # change-point detection, q236 Mann-Whitney source length shift,
    # q237 daily busy-time coverage (interval-union sweep-line)
    assert len(REGISTRY) >= 237


def test_registry_size_floor_round11_batch4():
    # round-11 widening, batch 4: q238 co-spike incident matrix,
    # q239 supplier price-spread audit, q240 stale-part audit
    assert len(REGISTRY) >= 240


def test_registry_size_floor_round12():
    # round-12 widening: q241-q248 (risk & distribution audits:
    # Kruskal-Wallis, credit exposure replay, supplier HHI,
    # l-diversity, Lorenz deciles, dormancy, interpolated quantiles,
    # dup-cluster chain-depth audit)
    assert len(REGISTRY) >= 248


def test_registry_size_floor_round12_batch2():
    # round-12 widening, batch 2: q249 MTTR/MTBF reliability, q250
    # order-size overdispersion, q251 lead-lag correlation, q252
    # funnel stage latencies
    assert len(REGISTRY) >= 252


def test_registry_size_floor_round13():
    # round-13 widening: q253-q257 (semantic dedup at document grain:
    # pairs, provenance, keeper summary, semantic-vs-lexical overlap;
    # weighted exactly-k priority sample), q258-q261 (Benford second
    # digit, brand association rules, inverse-Simpson diversity,
    # Tukey-fence outlier rate), q262 semantic decontamination,
    # q263 budget-proportional weighted draw
    assert len(REGISTRY) >= 263


def test_registry_size_floor_round13_batch3():
    # round-13 batch 3: q264 Chao1 vocabulary richness, q265 MAD
    # modified-z outlier rate, q266 semantic-pair label confusion,
    # q267 dup-cluster size spectrum, q268 source token imbalance
    assert len(REGISTRY) >= 268
