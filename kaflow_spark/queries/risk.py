"""Round-12 suite: risk & distribution audits (q241-q248).

Concentration, exposure, inequality, privacy and rank-test analytics a
warehouse team runs over the same fixture tables — each exact-integer
(or exact-IEEE) end to end so a DuckDB twin hash-checks it:

- q241 Kruskal-Wallis H across sources (k-sample generalization of
  q236's Mann-Whitney, tie-corrected, milli-units, DECIMAL-exact)
- q242 credit-exposure replay (running balance vs opening acctbal)
- q243 supplier revenue concentration per nation (HHI, micro-units)
- q244 l-diversity privacy audit (distinct-l on balance buckets,
  completing q176's k-anonymity family)
- q245 per-segment Lorenz decile revenue shares (exact selectors,
  completing the q181 Gini / q233 Pareto inequality family)
- q246 customer dormancy audit (max inter-order gap + tail gap)
- q247 interpolated (type-7 / percentile_cont) quantiles in exact
  micro-units — the linear-interpolation companion to q53's
  percentile_disc family
- q248 dup-cluster chain-depth audit (per-cluster edge density and
  weakest verified edge over q41's shared pair frame — the
  per-cluster detail behind q206's global transitivity)

Batch 2 (q249-q252), the operational-metrics corner of the same pack:

- q249 MTTR/MTBF reliability (exact p50/p90 recovery and
  between-failure seconds off one events lineage)
- q250 order-size overdispersion (variance-to-mean index per segment,
  micro-units — Poisson sits at ~1e6)
- q251 lead-lag cross-correlation (does type A today predict type B
  tomorrow — q213's directional companion)
- q252 funnel stage-latency decomposition (view->click,
  click->purchase p50/p90 — WHICH stage is slow)

Determinism notes follow the house rules (CLAUDE.md): integer/DECIMAL
algebra before any float, `div`/`//` truncation parity (trap 6),
DECIMAL(38,0) for products that can pass 2^63 (mirrored as HUGEINT on
the DuckDB side), CAST(... AS BIGINT) on every oracle integral output
(driver-canon dtype rule), unique-key tie-breaks on every window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kaflow_spark.catalog import load
from kaflow_spark.queries.base import declare

_CENTS_O = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
_CENTS_BAL = "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"


@declare(
    "q241_kruskal_wallis_sources",
    oracle="""
    WITH g AS (
        SELECT source, n_chars AS v, COUNT(*) AS c
        FROM documents
        WHERE source IS NOT NULL AND n_chars IS NOT NULL
        GROUP BY 1, 2),
    vg AS (SELECT v, SUM(c) AS t FROM g GROUP BY v),
    vr AS (SELECT v, t,
                  2 * (SUM(t) OVER (ORDER BY v) - t) + t + 1 AS rank2
           FROM vg),
    per AS (
        SELECT source,
               CAST(SUM(c * rank2) AS BIGINT) AS rank_sum_x2,
               CAST(SUM(c) AS BIGINT) AS n
        FROM g JOIN vr USING (v) GROUP BY source),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(CAST(rank_sum_x2 AS HUGEINT) * rank_sum_x2
                        // (4 * n)) AS HUGEINT) AS sum_t
        FROM per),
    tie AS (
        SELECT CAST(COALESCE(SUM(CAST(t AS HUGEINT) * t * t - t), 0)
                    AS HUGEINT) AS tie_sum
        FROM vg),
    h AS (
        SELECT nn, tie_sum,
               CAST(12000 * sum_t // (CAST(nn AS HUGEINT) * (nn + 1))
                    - 3000 * (nn + 1) AS BIGINT) AS h_milli
        FROM tot, tie)
    SELECT p.source, p.n, p.rank_sum_x2, h.h_milli,
           CAST(CASE WHEN CAST(h.nn AS HUGEINT) * h.nn * h.nn - h.nn
                          - h.tie_sum > 0
                THEN CAST(h.h_milli AS HUGEINT)
                     * (CAST(h.nn AS HUGEINT) * h.nn * h.nn - h.nn)
                     // (CAST(h.nn AS HUGEINT) * h.nn * h.nn - h.nn
                         - h.tie_sum)
                END AS BIGINT) AS h_tie_milli
    FROM per p CROSS JOIN h
    ORDER BY p.source
    """,
    doc="Kruskal-Wallis one-way rank test across document sources on "
    "length: the k-sample generalization of q236's Mann-Whitney, "
    "closing the nonparametric family (is ANY source's length "
    "distribution shifted, one statistic, before the pairwise matrix "
    "says which). Midranks from the same bounded (value, count) grid "
    "idiom as q236, doubled (rank2 = 2*rank) so ties stay integer; "
    "per-source rank sums are exact BIGINTs, and H is emitted in "
    "milli-units via integer algebra only — each source's R^2/n term "
    "floor-divides once (DECIMAL(38,0) product, mirrored HUGEINT on "
    "DuckDB, so sf does not overflow the square), then one global "
    "div by N(N+1). The tie-corrected variant divides by "
    "1 - sum(t^3-t)/(N^3-N) through the same integer route, NULL "
    "when every value ties (zero denominator). Scale: documents "
    "contract to the value grid at the scan; the only global window "
    "orders the bounded grid.",
    tags=("stats", "curation"),
)
def q241(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(
        F.col("source").isNotNull() & F.col("n_chars").isNotNull()
    )
    grid = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    vgrid = grid.groupBy("v").agg(F.sum("c").alias("t"))
    wv = Window.orderBy("v")  # bounded value grid: one-reducer OK
    vr = vgrid.select(
        "v",
        "t",
        (2 * (F.sum("t").over(wv) - F.col("t")) + F.col("t") + 1).alias(
            "rank2"
        ),
    )
    per = (
        grid.join(vr, "v")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * F.col("rank2")).alias("rank_sum_x2"),
            F.sum("c").alias("n"),
        )
    )
    tot = per.agg(
        F.sum("n").alias("nn"),
        F.sum(
            F.expr(
                "CAST(rank_sum_x2 AS DECIMAL(38,0)) * rank_sum_x2 "
                "div (4 * n)"
            )
        ).alias("sum_t"),
    )
    tie = vgrid.agg(
        F.coalesce(
            F.sum(F.expr("CAST(t AS DECIMAL(38,0)) * t * t - t")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("tie_sum")
    )
    h = (
        tot.crossJoin(F.broadcast(tie))
        .select(
            "nn",
            "tie_sum",
            F.expr(
                "CAST(12000 * CAST(sum_t AS DECIMAL(38,0)) "
                "div (CAST(nn AS DECIMAL(38,0)) * (nn + 1)) "
                "- 3000 * (nn + 1) AS BIGINT)"
            ).alias("h_milli"),
        )
    )
    return (
        per.crossJoin(F.broadcast(h))
        .select(
            "source",
            "n",
            "rank_sum_x2",
            "h_milli",
            F.expr(
                "CAST(CASE WHEN CAST(nn AS DECIMAL(38,0)) * nn * nn - nn "
                "- tie_sum > 0 THEN "
                "CAST(h_milli AS DECIMAL(38,0)) "
                "* (CAST(nn AS DECIMAL(38,0)) * nn * nn - nn) "
                "div (CAST(nn AS DECIMAL(38,0)) * nn * nn - nn - tie_sum) "
                "END AS BIGINT)"
            ).alias("h_tie_milli"),
        )
        .orderBy("source")
    )


@declare(
    "q242_credit_exposure_replay",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey, o_orderdate, o_orderkey,
               {_CENTS_O} AS price_cents
        FROM orders),
    c AS (SELECT c_custkey, {_CENTS_BAL} AS start_cents FROM customer),
    r AS (
        SELECT c.c_custkey, o.o_orderdate, c.start_cents, o.price_cents,
               c.start_cents - SUM(o.price_cents) OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY o.o_orderdate, o.o_orderkey) AS bal
        FROM o JOIN c ON o.o_custkey = c.c_custkey)
    SELECT c_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(start_cents) - SUM(price_cents) AS BIGINT)
               AS final_balance_cents,
           CAST(MIN(bal) AS BIGINT) AS min_balance_cents,
           MIN(CASE WHEN bal < 0 THEN o_orderdate END)
               AS first_overdraft_date
    FROM r GROUP BY c_custkey ORDER BY c_custkey
    """,
    doc="Credit-exposure replay: each customer's opening acctbal is "
    "debited by every order (cents-exact) in (orderdate, orderkey) "
    "order, and the audit reports orders placed, final and minimum "
    "running balance, and the first overdraft date (NULL when the "
    "balance never goes negative) — the receivables-risk view of the "
    "orders stream that q150's LTV curve looks at from the revenue "
    "side. The running sum rides ONE per-customer window (unique "
    "orderkey tie-break, trap-discipline); the per-customer aggregate "
    "reuses the same partitioning, so the fact table shuffles once.",
    tags=("tpch", "window", "audit"),
)
def q242(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.expr(_CENTS_O).alias("price_cents"),
    )
    c = load(spark, sf, "customer").select(
        "c_custkey", F.expr(_CENTS_BAL).alias("start_cents")
    )
    w = Window.partitionBy("c_custkey").orderBy("o_orderdate", "o_orderkey")
    r = o.join(c, o.o_custkey == c.c_custkey).select(
        "c_custkey",
        "o_orderdate",
        "start_cents",
        "price_cents",
        (F.col("start_cents") - F.sum("price_cents").over(w)).alias("bal"),
    )
    return (
        r.groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.min("start_cents") - F.sum("price_cents")).alias(
                "final_balance_cents"
            ),
            F.min("bal").alias("min_balance_cents"),
            F.min(
                F.when(F.col("bal") < 0, F.col("o_orderdate"))
            ).alias("first_overdraft_date"),
        )
        .orderBy("c_custkey")
    )


@declare(
    "q243_supplier_hhi_by_nation",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey, l.l_suppkey,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * 10000 AS BIGINT)) AS BIGINT) AS r
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2),
    agg AS (
        SELECT s_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(r) AS HUGEINT) AS total,
               SUM(CAST(r AS HUGEINT) * r) AS sumsq,
               CAST(MAX(r) AS HUGEINT) AS toprev
        FROM rev GROUP BY s_nationkey)
    SELECT n.n_name, a.n_suppliers,
           CAST(CASE WHEN a.total > 0 THEN
                a.sumsq * 1000000 // (a.total * a.total) END
                AS BIGINT) AS hhi_micro,
           CAST(CASE WHEN a.total > 0 THEN
                a.toprev * 10000 // a.total END AS BIGINT)
               AS top_share_bp
    FROM agg a JOIN nation n ON a.s_nationkey = n.n_nationkey
    ORDER BY n.n_name
    """,
    doc="Supplier concentration per nation: Herfindahl-Hirschman "
    "index of discounted-revenue shares (micro-units, 1e6 = "
    "monopoly) plus the top supplier's share in bp — the "
    "procurement-risk audit ('is this nation's supply one bankruptcy "
    "away from a stockout'). Revenue in exact hundredth-of-a-cent "
    "integers (2dp price x 2dp discount x 10000), share squares "
    "summed in DECIMAL(38,0) (HUGEINT on DuckDB — a supplier's "
    "revenue square passes 2^63 well below bench SF), ONE division "
    "at the end. Supplier dim broadcasts; lineitem aggregates "
    "map-side per (nation, supplier) before the bounded rollup.",
    tags=("tpch", "agg", "stats", "audit"),
)
def q243(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_suppkey",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) "
            "* (1 - CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT)"
        ).alias("r4"),
    )
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("r4").alias("r"))
    )
    agg = rev.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("r").alias("total"),
        F.sum(F.expr("CAST(r AS DECIMAL(38,0)) * r")).alias("sumsq"),
        F.max("r").alias("toprev"),
    )
    return (
        agg.join(F.broadcast(n), agg.s_nationkey == n.n_nationkey)
        .select(
            "n_name",
            "n_suppliers",
            F.expr(
                "CAST(CASE WHEN total > 0 THEN "
                "sumsq * 1000000 div "
                "(CAST(total AS DECIMAL(38,0)) * total) END AS BIGINT)"
            ).alias("hhi_micro"),
            F.expr(
                "CAST(CASE WHEN total > 0 THEN "
                "CAST(toprev AS DECIMAL(38,0)) * 10000 div total END "
                "AS BIGINT)"
            ).alias("top_share_bp"),
        )
        .orderBy("n_name")
    )


@declare(
    "q244_l_diversity_audit",
    oracle=f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {_CENTS_BAL} // 100000) AS BIGINT)
               AS n_sensitive,
           CAST(CASE WHEN COUNT(DISTINCT {_CENTS_BAL} // 100000) < 3
                THEN 1 ELSE 0 END AS BIGINT) AS violates_l3
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
    doc="Distinct-l-diversity audit over the (nation, segment) "
    "quasi-identifier with account balance (bucketed to $1000) as "
    "the sensitive attribute — the release gate that complements "
    "q176's k-anonymity: a group can be large (k-anonymous) yet leak "
    "its members' balance band if every member falls in the same "
    "bucket. Reports every QI group's size, distinct sensitive "
    "buckets, and the l=3 violation flag (integer, not boolean, for "
    "dtype-canon parity). Buckets divide cents by 100000 with "
    "truncation toward zero on both engines (trap 6 — negative "
    "balances port exactly). One scan, one shuffle on the bounded QI "
    "key; the single COUNT(DISTINCT) plans without an Expand "
    "(trap 17 needs TWO).",
    tags=("privacy", "audit"),
)
def q244(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(f"{_CENTS_BAL} div 100000").alias("bucket"),
    )
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("bucket")).alias("n_sensitive"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_rows",
            "n_sensitive",
            F.when(F.col("n_sensitive") < 3, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("violates_l3"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


@declare(
    "q245_lorenz_decile_shares",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey AS custkey, SUM({_CENTS_O}) AS cents
        FROM orders GROUP BY 1),
    seg AS (
        SELECT c.c_mktsegment AS segment, r.custkey, r.cents
        FROM rev r JOIN customer c ON r.custkey = c.c_custkey),
    ranked AS (
        SELECT segment, cents,
               ROW_NUMBER() OVER (PARTITION BY segment
                                  ORDER BY cents, custkey) AS idx,
               COUNT(*) OVER (PARTITION BY segment) AS n,
               SUM(cents) OVER (PARTITION BY segment) AS tot
        FROM seg),
    dec AS (
        SELECT segment, ((idx - 1) * 10) // n AS decile,
               cents, n, tot
        FROM ranked),
    g AS (
        SELECT segment, decile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents,
               CAST(MIN(tot) AS BIGINT) AS tot
        FROM dec GROUP BY segment, decile)
    SELECT segment, CAST(decile AS BIGINT) AS decile, n_customers,
           revenue_cents,
           CAST(CAST(revenue_cents AS HUGEINT) * 10000 // tot AS BIGINT)
               AS share_bp,
           CAST(SUM(CAST(revenue_cents AS HUGEINT))
                    OVER (PARTITION BY segment ORDER BY decile)
                * 10000 // tot AS BIGINT) AS cum_share_bp
    FROM g ORDER BY segment, decile
    """,
    doc="Per-segment Lorenz curve in deciles: customers ranked by "
    "order revenue ascending (unique custkey tie-break), split into "
    "ten exact-integer-selector deciles (((idx-1)*10) div n — no "
    "float percentile), each reporting its revenue share and the "
    "cumulative share in bp. The readable inequality curve behind "
    "q181's single Gini number and q233's one-point Pareto summary — "
    "'the bottom 5 deciles hold X bp' is what the sampling-weight "
    "discussion actually needs. Windows partition by segment (the "
    "q233 scale shape: per-segment reducers, never one global "
    "order); cumulative share quantizes AFTER the exact cumulative "
    "sum, one division per output row.",
    tags=("tpch", "window", "stats"),
)
def q245(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        "o_custkey", F.expr(_CENTS_O).alias("order_cents")
    )
    rev = o.groupBy("o_custkey").agg(F.sum("order_cents").alias("cents"))
    c = load(spark, sf, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    seg = rev.join(c, rev.o_custkey == c.c_custkey).select(
        "segment", F.col("o_custkey").alias("custkey"), "cents"
    )
    w = Window.partitionBy("segment").orderBy("cents", "custkey")
    wa = Window.partitionBy("segment")
    ranked = seg.select(
        "segment",
        "cents",
        F.row_number().over(w).alias("idx"),
        F.count(F.lit(1)).over(wa).alias("n"),
        F.sum("cents").over(wa).alias("tot"),
    )
    g = (
        ranked.select(
            "segment",
            F.expr("((idx - 1) * 10) div n").alias("decile"),
            "cents",
            "tot",
        )
        .groupBy("segment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("revenue_cents"),
            F.min("tot").alias("tot"),
        )
    )
    wc = Window.partitionBy("segment").orderBy("decile")
    return g.select(
        "segment",
        "decile",
        "n_customers",
        "revenue_cents",
        F.expr(
            "CAST(CAST(revenue_cents AS DECIMAL(38,0)) * 10000 div tot "
            "AS BIGINT)"
        ).alias("share_bp"),
        (
            F.sum(F.col("revenue_cents").cast("decimal(38,0)")).over(wc)
            * 10000
        ).cast("decimal(38,0)").alias("_cum"),
        F.col("tot").alias("_tot"),
    ).select(
        "segment",
        "decile",
        "n_customers",
        "revenue_cents",
        "share_bp",
        F.expr("CAST(_cum div _tot AS BIGINT)").alias("cum_share_bp"),
    ).orderBy("segment", "decile")


@declare(
    "q246_customer_dormancy",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderdate, o_orderkey,
               LAG(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS prev_date
        FROM orders),
    mx AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
    agg AS (
        SELECT o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               MIN(o_orderdate) AS first_order_date,
               MAX(o_orderdate) AS last_order_date,
               CAST(MAX(date_diff('day', prev_date, o_orderdate))
                    AS BIGINT) AS max_gap_days
        FROM o GROUP BY o_custkey)
    SELECT a.o_custkey AS custkey, a.n_orders, a.first_order_date,
           a.last_order_date, a.max_gap_days,
           CAST(date_diff('day', a.last_order_date, m.max_date)
                AS BIGINT) AS tail_gap_days
    FROM agg a CROSS JOIN mx m
    WHERE a.n_orders >= 2
    ORDER BY custkey
    """,
    doc="Customer dormancy audit: for every repeat customer, the "
    "longest gap between consecutive orders and the tail gap since "
    "their last order (vs the dataset's max order date — computed "
    "once and broadcast, the q132 global-scalar pattern) — the "
    "churn-candidate list that q232's per-event-type gap survival "
    "aggregates away. One per-customer window (unique orderkey "
    "tie-break) feeding one aggregate on the same partitioning; day "
    "arithmetic on DATE subtraction, integral on both engines.",
    tags=("tpch", "window", "audit"),
)
def q246(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    r = o.select(
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_date"),
    )
    agg = r.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_orderdate").alias("first_order_date"),
        F.max("o_orderdate").alias("last_order_date"),
        F.max(
            F.datediff(F.col("o_orderdate"), F.col("prev_date"))
        ).cast("bigint").alias("max_gap_days"),
    )
    mx = o.agg(F.max("o_orderdate").alias("max_date"))
    return (
        agg.filter(F.col("n_orders") >= 2)
        .crossJoin(F.broadcast(mx))
        .select(
            F.col("o_custkey").alias("custkey"),
            "n_orders",
            "first_order_date",
            "last_order_date",
            "max_gap_days",
            F.datediff(F.col("max_date"), F.col("last_order_date"))
            .cast("bigint")
            .alias("tail_gap_days"),
        )
        .orderBy("custkey")
    )


@declare(
    "q247_interpolated_quantiles",
    oracle=f"""
    WITH v AS (
        SELECT o_orderpriority AS priority, {_CENTS_O} AS cents
        FROM orders),
    grid AS (
        SELECT priority, cents, COUNT(*) AS c
        FROM v GROUP BY 1, 2),
    cum AS (
        SELECT priority, cents, c,
               SUM(c) OVER (PARTITION BY priority ORDER BY cents)
                   AS cum,
               SUM(c) OVER (PARTITION BY priority) AS n
        FROM grid),
    pf AS (
        SELECT priority, CAST(MIN(n) AS BIGINT) AS n, p.p,
               (p.p * (MIN(n) - 1)) // 100 + 1 AS i1,
               (p.p * (MIN(n) - 1)) % 100 AS rem,
               LEAST((p.p * (MIN(n) - 1)) // 100 + 2, MIN(n)) AS i2
        FROM cum CROSS JOIN (
            SELECT CAST(p AS BIGINT) AS p
            FROM VALUES (25), (50), (75), (90) AS t(p)) p
        GROUP BY priority, p.p),
    v1 AS (
        SELECT pf.priority, pf.p, pf.n, pf.rem, pf.i2,
               cum.cents AS val1
        FROM pf JOIN cum ON pf.priority = cum.priority
             AND cum.cum - cum.c < pf.i1 AND pf.i1 <= cum.cum),
    v2 AS (
        SELECT pf.priority, pf.p, cum.cents AS val2
        FROM pf JOIN cum ON pf.priority = cum.priority
             AND cum.cum - cum.c < pf.i2 AND pf.i2 <= cum.cum)
    SELECT v1.priority, v1.p, v1.n,
           CAST(v1.val1 * 1000000
                + v1.rem * (v2.val2 - v1.val1) * 10000 AS BIGINT)
               AS q_micro
    FROM v1 JOIN v2 ON v1.priority = v2.priority AND v1.p = v2.p
    ORDER BY v1.priority, v1.p
    """,
    doc="Exact INTERPOLATED quantiles (numpy type-7 / "
    "percentile_cont semantics) of order value per priority, in "
    "micro-cent units: position p(n-1) splits into integer rank and "
    "a /100 fractional remainder, and the interpolation "
    "v1*1e6 + rem*(v2-v1)*1e4 is pure integer algebra — no float "
    "quantile on either engine, so the hash compare is exact. "
    "Completes q53's percentile_disc family with the definition "
    "numpy/pandas defaults to (the two disagree exactly where "
    "reports get questioned — between-sample percentiles). Ranks "
    "select off the cumulative (value, count) grid (the q148/q225 "
    "order-statistic selector); the 20-row (priority, p) frame "
    "broadcasts to both selector joins.",
    tags=("tpch", "stats", "window"),
)
def q247(spark: SparkSession, sf: str) -> DataFrame:
    v = load(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.expr(_CENTS_O).alias("cents"),
    )
    grid = v.groupBy("priority", "cents").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("priority").orderBy("cents")
    wa = Window.partitionBy("priority")
    cum = grid.select(
        "priority",
        "cents",
        "c",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wa).alias("n"),
    )
    stats = grid.groupBy("priority").agg(F.sum("c").alias("n"))
    pf = (
        stats.select(
            "priority",
            "n",
            F.explode(
                F.array(F.lit(25), F.lit(50), F.lit(75), F.lit(90))
            ).alias("p_raw"),
        )
        .select(
            "priority",
            "n",
            F.col("p_raw").cast("bigint").alias("p"),
        )
        .select(
            "priority",
            "n",
            "p",
            F.expr("(p * (n - 1)) div 100 + 1").alias("i1"),
            F.expr("(p * (n - 1)) % 100").alias("rem"),
            F.expr("least((p * (n - 1)) div 100 + 2, n)").alias("i2"),
        )
    )
    v1 = F.broadcast(pf).join(
        cum.select(
            F.col("priority").alias("priority1"),
            F.col("cents").alias("val1"),
            F.col("cum").alias("cum1"),
            F.col("c").alias("c1"),
        ),
        (F.col("priority") == F.col("priority1"))
        & (F.col("cum1") - F.col("c1") < F.col("i1"))
        & (F.col("i1") <= F.col("cum1")),
    ).select("priority", "p", "n", "rem", "i2", "val1")
    v2 = F.broadcast(pf).join(
        cum.select(
            F.col("priority").alias("priority2"),
            F.col("cents").alias("val2"),
            F.col("cum").alias("cum2"),
            F.col("c").alias("c2"),
        ),
        (F.col("priority") == F.col("priority2"))
        & (F.col("cum2") - F.col("c2") < F.col("i2"))
        & (F.col("i2") <= F.col("cum2")),
    ).select(F.col("priority").alias("priority_b"), F.col("p").alias("p_b"), "val2")
    return (
        v1.join(
            v2,
            (v1.priority == v2.priority_b) & (v1.p == v2.p_b),
        )
        .select(
            "priority",
            "p",
            "n",
            F.expr(
                "CAST(val1 * 1000000 + rem * (val2 - val1) * 10000 "
                "AS BIGINT)"
            ).alias("q_micro"),
        )
        .orderBy("priority", "p")
    )


@declare(
    "q248_dup_cluster_chain_audit",
    oracle="""
    WITH RECURSIVE sh AS (
        SELECT doc_id, list(DISTINCT substring(text, CAST(i AS INT), 5)) AS s
        FROM (SELECT doc_id, text,
                     unnest(range(1, greatest(length(text)-4, 1)+1)) AS i
              FROM documents)
        GROUP BY doc_id),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE)
                   AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
    e AS (SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.9),
    reach(node, label) AS (
        SELECT id_a, id_a FROM e
        UNION
        SELECT id_b, id_b FROM e
        UNION
        SELECT x.b, r.label
        FROM reach r JOIN (
            SELECT id_a AS a, id_b AS b FROM e
            UNION ALL
            SELECT id_b AS a, id_a AS b FROM e) x
        ON x.a = r.node),
    lab AS (SELECT node, MIN(label) AS cluster_id
            FROM reach GROUP BY node),
    sizes AS (SELECT cluster_id,
                     CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM lab GROUP BY cluster_id),
    ed AS (
        SELECT l.cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_edges,
               MIN(e.jaccard) AS min_jaccard
        FROM e JOIN lab l ON e.id_a = l.node
        GROUP BY l.cluster_id)
    SELECT s.cluster_id, s.cluster_size, d.n_edges, d.min_jaccard,
           CAST(CASE WHEN d.n_edges =
                s.cluster_size * (s.cluster_size - 1) // 2
                THEN 1 ELSE 0 END AS BIGINT) AS is_clique
    FROM sizes s JOIN ed d USING (cluster_id)
    ORDER BY s.cluster_id
    """,
    doc="Per-cluster chain-depth audit over q41's shared verified "
    "pair frame: each duplicate cluster (connected component, "
    "min-member label = q83's canonical keeper) reports its size, "
    "direct verified-edge count, the WEAKEST direct edge's exact "
    "jaccard (IEEE int/int division — portable, the q41 precedent), "
    "and whether it is a clique — the per-cluster detail behind "
    "q206's single global transitivity number: a non-clique cluster "
    "was merged through CHAINS, the over-merge reviewers inspect "
    "before trusting q137's keeper selection, and min_jaccard says "
    "how close its weakest link is to the threshold. Consumes the "
    "persisted shared pair set (zero extra LSH cost in-suite); CC "
    "labels + sizes + edge rollups each shuffle only cluster-bounded "
    "rows. Oracle: the q83 recursive-CTE fixpoint extended with "
    "per-cluster edge aggregates (quadratic pair CTE -> sliced "
    "bench-SF check).",
    tags=("dedup", "graph", "audit", "quadratic-oracle"),
)
def q248(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.dedup import verified_pair_frame
    from kaflow_spark.operators.graph import connected_components

    d = load(spark, sf, "documents")
    pairs = verified_pair_frame(d, "doc_id", "text")
    cc = connected_components(pairs, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    lab_a = cc.select(
        F.col("node").alias("id_a"), F.col("component").alias("cluster_id")
    )
    ed = (
        pairs.join(lab_a, "id_a")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.min("jaccard").alias("min_jaccard"),
        )
    )
    return (
        sizes.withColumnRenamed("component", "cluster_id")
        .join(ed, "cluster_id")
        .select(
            "cluster_id",
            "cluster_size",
            "n_edges",
            "min_jaccard",
            F.when(
                F.col("n_edges")
                == F.expr("cluster_size * (cluster_size - 1) div 2"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("is_clique"),
        )
        .orderBy("cluster_id")
    )


_SEC = "CAST(ts AS LONG)"
_DSEC = "CAST(epoch_us(ts) // 1000000 AS BIGINT)"


@declare(
    "q249_reliability_mttr_mtbf",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, {_DSEC} AS sec
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IS NOT NULL),
    nxt AS (
        SELECT user_id, event_id, event_type, sec,
               MIN(CASE WHEN event_type <> 'error' THEN sec END)
                   OVER (PARTITION BY user_id ORDER BY sec, event_id
                         ROWS BETWEEN 1 FOLLOWING
                         AND UNBOUNDED FOLLOWING) AS nxt_ok
        FROM e),
    errs AS (
        SELECT user_id, sec, nxt_ok,
               LAG(sec) OVER (PARTITION BY user_id
                              ORDER BY sec, event_id) AS prev_err
        FROM nxt WHERE event_type = 'error'),
    vals AS (
        SELECT 'ttr' AS metric, nxt_ok - sec AS val
        FROM errs WHERE nxt_ok IS NOT NULL
        UNION ALL
        SELECT 'tbf' AS metric, sec - prev_err AS val
        FROM errs WHERE prev_err IS NOT NULL),
    grid AS (
        SELECT metric, val, COUNT(*) AS c FROM vals GROUP BY 1, 2),
    cum AS (
        SELECT metric, val, c,
               SUM(c) OVER (PARTITION BY metric ORDER BY val) AS cum,
               SUM(c) OVER (PARTITION BY metric) AS n
        FROM grid)
    SELECT metric, CAST(MIN(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN val END)
                AS BIGINT) AS p50_sec,
           CAST(MIN(CASE WHEN cum >= (90 * n + 99) // 100 THEN val END)
                AS BIGINT) AS p90_sec
    FROM cum GROUP BY metric ORDER BY metric
    """,
    doc="Reliability audit over the event stream: MTTR (per error "
    "event, seconds until the same user's next non-error event — the "
    "recovery) and MTBF (seconds between a user's consecutive "
    "errors), each reported as exact percentile_disc p50/p90 via the "
    "cumulative selector over the bounded (metric, seconds) grid — "
    "the SRE view of q87/q170's error accounting. Next-recovery is a "
    "conditional MIN over the FOLLOWING frame of one per-user window "
    "ordering (unique event_id tie-break, so the ROWS frame is the "
    "same total order on both engines); between-failures is a "
    "LAG IGNORE NULLS over the same ordering (Spark: lag over the "
    "errors-only projection — identical result since only error rows "
    "read it). Epoch seconds by truncation on both engines "
    "(CLAUDE.md q152 corollary). One events scan, one user_id "
    "shuffle; percentiles ride the contracted grid.",
    tags=("events", "window", "stats", "audit"),
)
def q249(spark: SparkSession, sf: str) -> DataFrame:
    e = (
        load(spark, sf, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.expr(_SEC).alias("sec"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nxt_ok = F.min(
        F.when(F.col("event_type") != "error", F.col("sec"))
    ).over(w)
    rows = e.select("user_id", "event_id", "event_type", "sec", nxt_ok.alias("nxt_ok"))
    errs = rows.filter(F.col("event_type") == "error")
    we = Window.partitionBy("user_id").orderBy("sec", "event_id")
    errs = errs.select(
        "sec",
        "nxt_ok",
        F.lag("sec").over(we).alias("prev_err"),
    )
    # ONE pass, not a union of two filtered branches: different
    # filters/projections above the shared window lineage would
    # de-canonicalize it and double the events scan (trap 5 —
    # measured 2 scans, ReusedExchange 0 before this stack)
    vals = errs.select(
        F.expr(
            "stack(2, 'ttr', nxt_ok - sec, 'tbf', sec - prev_err) "
            "AS (metric, val)"
        )
    ).filter(F.col("val").isNotNull())
    grid = vals.groupBy("metric", "val").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("metric").orderBy("val")
    wa = Window.partitionBy("metric")
    cum = grid.select(
        "metric",
        "val",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wa).alias("n"),
    )
    return (
        cum.groupBy("metric")
        .agg(
            F.min("n").alias("n"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(50 * n + 99) div 100"),
                    F.col("val"),
                )
            ).alias("p50_sec"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(90 * n + 99) div 100"),
                    F.col("val"),
                )
            ).alias("p90_sec"),
        )
        .orderBy("metric")
    )


@declare(
    "q250_order_size_overdispersion",
    oracle="""
    WITH x AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS items
        FROM lineitem GROUP BY 1),
    seg AS (
        SELECT c.c_mktsegment AS segment, x.items
        FROM x JOIN orders o ON x.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey),
    s AS (
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(items) AS HUGEINT) AS sx,
               SUM(CAST(items AS HUGEINT) * items) AS sxx
        FROM seg GROUP BY segment)
    SELECT segment, n_orders,
           CAST(sx * 1000 // n_orders AS BIGINT) AS mean_items_milli,
           CAST(CASE WHEN n_orders > 1 AND sx > 0 THEN
                (n_orders * sxx - sx * sx) * 1000000
                // ((n_orders - 1) * sx) END AS BIGINT)
               AS dispersion_micro
    FROM s ORDER BY segment
    """,
    doc="Order-size overdispersion per market segment: the "
    "variance-to-mean ratio (index of dispersion) of lineitems per "
    "order in exact micro-units — a Poisson arrival process sits at "
    "~1e6, clumped/bursty ordering above it, quota-regularized below "
    "— the distribution-shape alarm q73's plain variance cannot "
    "raise by itself. Pure integer algebra: D = (n*Sxx - Sx^2) / "
    "((n-1) * Sx) lifted to DECIMAL(38,0)/HUGEINT products with ONE "
    "final integral division, zero-guarded. Lineitem contracts to "
    "per-order counts at the scan; the segment dimension attaches by "
    "equi-join; everything above is a bounded rollup.",
    tags=("tpch", "stats", "audit"),
)
def q250(spark: SparkSession, sf: str) -> DataFrame:
    x = (
        load(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("items"))
    )
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    seg = (
        x.join(o, x.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("segment", "items")
    )
    s = seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("items").cast("decimal(38,0)").alias("sx"),
        F.sum(F.expr("CAST(items AS DECIMAL(38,0)) * items")).alias("sxx"),
    )
    return s.select(
        "segment",
        "n_orders",
        F.expr("CAST(sx * 1000 div n_orders AS BIGINT)").alias(
            "mean_items_milli"
        ),
        F.expr(
            "CAST(CASE WHEN n_orders > 1 AND sx > 0 THEN "
            "(n_orders * sxx - sx * sx) * 1000000 "
            "div ((n_orders - 1) * sx) END AS BIGINT)"
        ).alias("dispersion_micro"),
    ).orderBy("segment")


@declare(
    "q251_lead_lag_correlation",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
    ser AS (
        SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS v
        FROM e GROUP BY event_type, day),
    j AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.v AS x, b.v AS y
        FROM ser a JOIN ser b
          ON b.day = a.day + INTERVAL 1 DAY
         AND a.event_type <> b.event_type),
    s AS (
        SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
               CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
        FROM j GROUP BY type_a, type_b)
    SELECT type_a, type_b, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                          / SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                          / SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 9)
           END AS corr_lag1
    FROM s ORDER BY type_a, type_b
    """,
    doc="Lead-lag cross-correlation: Pearson r between type A's daily "
    "cent volume and type B's volume ONE DAY LATER, for every ordered "
    "type pair — the temporal-precedence companion to q213's "
    "symmetric same-day matrix ('do errors today predict purchases "
    "tomorrow'). Identical determinism discipline: exact "
    "DECIMAL(38,0) moments off the bounded (type, day) series, one "
    "final fixed float expression using only IEEE-exact SQRT/divide "
    "(trap 13 — no ln), ROUND(, 9) to pin the printed form. The "
    "day-shift is an equi-join on day+1 over the contracted series, "
    "asymmetric pairs kept (lead-lag is directional).",
    tags=("events", "stats"),
)
def q251(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    ser = (
        e.filter(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .select(
            "event_type",
            F.expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)").alias(
                "day_i"
            ),
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("event_type", "day_i")
        .agg(F.sum("cents").alias("v"))
        # explicit not-null BEFORE the diamond branches: the join
        # would otherwise infer isnotnull(day_i + 1) on the shifted
        # side and isnotnull(day_i) on the other, de-canonicalizing
        # the shared series aggregate (trap 4/5 family)
        .filter(F.col("day_i").isNotNull())
    )
    a = ser.select(
        F.col("event_type").alias("type_a"),
        (F.col("day_i") + 1).alias("day_a"),
        F.col("v").alias("x"),
    )
    b = ser.select(
        F.col("event_type").alias("type_b"),
        F.col("day_i").alias("day_b"),
        F.col("v").alias("y"),
    )
    # null-safe join key (trap 12): plain equality would infer
    # isnotnull(day_i + 1) on the shifted side vs isnotnull(day_i) on
    # the other and de-canonicalize the shared series aggregate
    # (measured: 2 scans, ReusedExchange 0); day_i is non-null by the
    # pre-filter, so <=> is semantically identical here
    j = a.join(b, a.day_a.eqNullSafe(b.day_b)).filter(
        F.col("type_a") != F.col("type_b")
    )
    big = "decimal(38,0)"
    s = j.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast(big).alias("sx"),
        F.sum("y").cast(big).alias("sy"),
        F.sum(F.col("x").cast(big) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(big) * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast(big) * F.col("y")).alias("sxy"),
    )
    return s.select(
        "type_a",
        "type_b",
        "n",
        F.expr(
            "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"
            " THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)"
            "           / SQRT(CAST(n * sxx - sx * sx AS DOUBLE))"
            "           / SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 9)"
            " END"
        ).alias("corr_lag1"),
    ).orderBy("type_a", "type_b")


@declare(
    "q252_funnel_stage_latency",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, {_DSEC} AS sec
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IN ('view', 'click', 'purchase')),
    fv AS (SELECT user_id, MIN(CASE WHEN event_type = 'view'
                                    THEN sec END) AS v
           FROM e GROUP BY user_id),
    fc AS (
        SELECT e.user_id, fv.v,
               MIN(e.sec) AS c
        FROM e JOIN fv ON e.user_id = fv.user_id
        WHERE e.event_type = 'click' AND fv.v IS NOT NULL
          AND e.sec >= fv.v
        GROUP BY e.user_id, fv.v),
    fp AS (
        SELECT e.user_id, fc.v, fc.c, MIN(e.sec) AS p
        FROM e JOIN fc ON e.user_id = fc.user_id
        WHERE e.event_type = 'purchase' AND e.sec >= fc.c
        GROUP BY e.user_id, fc.v, fc.c),
    vals AS (
        SELECT 'view_to_click' AS stage_pair, c - v AS val FROM fc
        UNION ALL
        SELECT 'click_to_purchase' AS stage_pair, p - c AS val FROM fp),
    grid AS (
        SELECT stage_pair, val, COUNT(*) AS c FROM vals GROUP BY 1, 2),
    cum AS (
        SELECT stage_pair, val, c,
               SUM(c) OVER (PARTITION BY stage_pair ORDER BY val)
                   AS cum,
               SUM(c) OVER (PARTITION BY stage_pair) AS n
        FROM grid)
    SELECT stage_pair, CAST(MIN(n) AS BIGINT) AS n_users,
           CAST(MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN val END)
                AS BIGINT) AS p50_sec,
           CAST(MIN(CASE WHEN cum >= (90 * n + 99) // 100 THEN val END)
                AS BIGINT) AS p90_sec
    FROM cum GROUP BY stage_pair ORDER BY stage_pair
    """,
    doc="Funnel stage-latency decomposition: exact percentile_disc "
    "p50/p90 of first-view -> first-subsequent-click and that-click "
    "-> first-subsequent-purchase, per ORDERED stage transition — "
    "which stage is slow, the question q216's end-to-end "
    "view->purchase latency and q225's strict funnel COUNTS cannot "
    "answer between them. Stage anchors are conditional MIN "
    "aggregations per user (first view; first click at-or-after it; "
    "first purchase at-or-after that), so the whole funnel is three "
    "contracting aggregates on one user_id partitioning — no ordered "
    "window over raw events; percentiles ride the bounded "
    "(stage, seconds) grid via the cumulative selector. Same-second "
    "transitions count as latency 0 on both engines (>= anchors, "
    "truncated epoch seconds).",
    tags=("events", "stats", "audit"),
)
def q252(spark: SparkSession, sf: str) -> DataFrame:
    e = (
        load(spark, sf, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isin("view", "click", "purchase")
        )
        .select("user_id", "event_type", F.expr(_SEC).alias("sec"))
    )
    fv = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias(
            "v"
        )
    ).filter(F.col("v").isNotNull())
    fc = (
        e.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(F.col("sec") >= F.col("v"))
        .groupBy("user_id", "v")
        .agg(F.min("sec").alias("c"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("sec") >= F.col("c"))
        .groupBy("user_id", "v", "c")
        .agg(F.min("sec").alias("p"))
    )
    vals = fc.select(
        F.lit("view_to_click").alias("stage_pair"),
        (F.col("c") - F.col("v")).alias("val"),
    ).unionByName(
        fp.select(
            F.lit("click_to_purchase").alias("stage_pair"),
            (F.col("p") - F.col("c")).alias("val"),
        )
    )
    grid = vals.groupBy("stage_pair", "val").agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = Window.partitionBy("stage_pair").orderBy("val")
    wa = Window.partitionBy("stage_pair")
    cum = grid.select(
        "stage_pair",
        "val",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wa).alias("n"),
    )
    return (
        cum.groupBy("stage_pair")
        .agg(
            F.min("n").alias("n_users"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(50 * n + 99) div 100"),
                    F.col("val"),
                )
            ).alias("p50_sec"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(90 * n + 99) div 100"),
                    F.col("val"),
                )
            ).alias("p90_sec"),
        )
        .orderBy("stage_pair")
    )
