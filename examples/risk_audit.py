"""Risk & distribution audit on kaflow_spark (round-12 suite).

The quarterly-review pack a warehouse team runs before trusting its
metrics and its sampling weights — distribution shift, concentration,
exposure, privacy, inequality, and duplicate-cluster integrity, each
exact-integer end to end:

shift        — Kruskal-Wallis H across sources on document length:
               ONE statistic saying whether ANY source shifted,
               before q236's pairwise matrix says which (q241)
exposure     — credit replay: every customer's opening balance
               debited by their order stream; first overdraft and
               trough (q242)
concentration— supplier-revenue HHI per nation + top-supplier share:
               the one-bankruptcy-from-a-stockout list (q243)
privacy      — distinct-l-diversity over the (nation, segment)
               quasi-identifier: groups whose members all share a
               balance band leak it even when k-anonymous (q244)
inequality   — per-segment Lorenz deciles: the curve behind the
               Gini number the sampling-weight debate needs (q245)
dormancy     — repeat customers by longest inter-order gap and tail
               silence (q246)
quantiles    — interpolated (type-7) order-value quantiles in exact
               micro-units, the numpy-compatible definition (q247)
clusters     — chain-depth audit of q41's verified duplicate
               clusters: non-cliques were merged through chains —
               the over-merge list to review before q137's keeper
               selection is trusted (q248; shares the persisted
               verified-pair frame, so this costs one CC + rollup)

    PYTHONPATH=/root/repo python examples/risk_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.queries import REGISTRY


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("risk-audit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- distribution shift: one k-sample answer first
    kw = REGISTRY["q241_kruskal_wallis_sources"].spark(spark, sf_dir)
    head = kw.limit(1).collect()[0]
    print(
        f"Kruskal-Wallis over {kw.count()} sources: "
        f"H = {head['h_milli'] / 1000:.3f} "
        f"(tie-corrected {head['h_tie_milli'] / 1000:.3f}) — "
        "compare to chi2(k-1) before trusting per-source mixtures"
    )

    # ---- credit exposure: the receivables trough
    exp = REGISTRY["q242_credit_exposure_replay"].spark(spark, sf_dir)
    worst = exp.orderBy("min_balance_cents").limit(3).collect()
    n_over = exp.filter(F.col("first_overdraft_date").isNotNull()).count()
    print(f"credit replay: {n_over} customers ever overdraft; deepest troughs:")
    for r in worst:
        print(
            f"  cust {r.c_custkey}: trough {r.min_balance_cents / 100:.2f}, "
            f"{r.n_orders} orders, first overdraft {r.first_overdraft_date}"
        )

    # ---- concentration: procurement risk
    hhi = REGISTRY["q243_supplier_hhi_by_nation"].spark(spark, sf_dir)
    top = hhi.orderBy(F.desc("hhi_micro")).limit(3).collect()
    print("most concentrated supply (HHI micro, 1e6 = monopoly):")
    for r in top:
        print(
            f"  {r.n_name}: HHI {r.hhi_micro}, top supplier "
            f"{r.top_share_bp} bp of {r.n_suppliers} suppliers"
        )

    # ---- privacy: the l-diversity release gate
    ldiv = REGISTRY["q244_l_diversity_audit"].spark(spark, sf_dir)
    viol = ldiv.filter(F.col("violates_l3") == 1)
    print(
        f"l-diversity: {viol.count()} / {ldiv.count()} QI groups violate "
        "l=3 on balance band"
    )

    # ---- inequality: what the bottom half actually holds
    lorenz = REGISTRY["q245_lorenz_decile_shares"].spark(spark, sf_dir)
    bottom5 = (
        lorenz.filter(F.col("decile") == 4)
        .select("segment", "cum_share_bp")
        .collect()
    )
    for r in sorted(bottom5, key=lambda x: x.cum_share_bp):
        print(
            f"  {r.segment}: bottom 5 deciles hold {r.cum_share_bp} bp "
            "of revenue"
        )

    # ---- dormancy: the churn-candidate shortlist
    dorm = REGISTRY["q246_customer_dormancy"].spark(spark, sf_dir)
    stale = dorm.orderBy(F.desc("tail_gap_days")).limit(3).collect()
    print("longest-silent repeat customers:")
    for r in stale:
        print(
            f"  cust {r.custkey}: quiet {r.tail_gap_days}d "
            f"(max historical gap {r.max_gap_days}d, {r.n_orders} orders)"
        )

    # ---- interpolated quantiles: the numpy-compatible report line
    q = REGISTRY["q247_interpolated_quantiles"].spark(spark, sf_dir)
    p90 = {r.priority: r.q_micro for r in q.filter("p = 90").collect()}
    print("p90 order value (type-7, $):")
    for prio in sorted(p90):
        print(f"  {prio}: {p90[prio] / 1e8:.4f}")

    # ---- duplicate-cluster integrity: chains vs cliques
    chains = REGISTRY["q248_dup_cluster_chain_audit"].spark(spark, sf_dir)
    rows = chains.collect()
    n_chain = sum(1 for r in rows if r.is_clique == 0)
    weakest = min(rows, key=lambda r: r.min_jaccard, default=None)
    print(
        f"duplicate clusters: {len(rows)} total, {n_chain} chain-merged "
        "(non-clique) — review before trusting keeper selection"
    )
    if weakest is not None:
        print(
            f"  weakest direct edge: jaccard {weakest.min_jaccard:.4f} in "
            f"cluster {weakest.cluster_id} (size {weakest.cluster_size})"
        )

    # hygiene: release the session-shared frames this pack persisted
    from kaflow_spark.operators.dedup import release_verified_pair_frames
    from kaflow_spark.operators.skew import release_probe_caches

    print(
        f"released {release_verified_pair_frames()} pair frame(s), "
        f"{release_probe_caches()} probe cache(s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
