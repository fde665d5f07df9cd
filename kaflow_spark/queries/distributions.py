"""Round-13 batch 2: distribution-shape audits (q258-q261) + the
round-14 entropy evenness audit (q270) and pairwise smoothed-KL
drift matrix (q271).

The second-order screens a warehouse team layers on the round-12
risk pack — digit-level fraud conformance, directional rule mining,
concentration-as-diversity, and robust outlier rates — each exact
integer end to end so a DuckDB twin hash-checks it:

- q258 Benford SECOND-digit conformance per order priority (the
  follow-up screen auditors run when first digits pass: fabricators
  who learn the leading-digit law still draw later digits uniformly
  — Nigrini's standard two-digit test; q180's first-digit sibling)
- q259 brand association rules over order baskets — directional
  support/confidence/lift for every (antecedent -> consequent) brand
  pair (confidence is the asymmetric, actionable half q194's
  symmetric lift cannot express)
- q260 effective event-type diversity per day (inverse Simpson
  N²/Σc² in exact micro-units — the 'how many types is today really
  spread across' number; purely rational, no logs, unlike Shannon)
- q261 Tukey-fence outlier rate per market segment (share of orders
  outside [Q1 - 1.5·IQR, Q3 + 1.5·IQR] — quartiles by exact
  percentile_disc selectors, fences compared in doubled integer
  units so 1.5·IQR never needs a float)

House determinism rules throughout: bounded (value, count) grids
before any selector, cumulative integer selectors for quartiles,
DECIMAL(38,0)/HUGEINT for products that can pass 2^63, CAST(... AS
BIGINT) on every oracle integral output, non-negative operands
wherever truncating division appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaflow_spark.catalog import load
from kaflow_spark.queries.base import declare

_CENTS_O = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

# P(second digit = d) = sum_{k=1..9} log10(1 + 1/(10k+d)), in bp
_BENFORD2_BP = {
    0: 1197, 1: 1139, 2: 1088, 3: 1043, 4: 1003,
    5: 967, 6: 934, 7: 904, 8: 876, 9: 850,
}
_BENFORD2_SQL = " ".join(
    f"WHEN {d} THEN {bp}" for d, bp in _BENFORD2_BP.items()
)


@declare(
    "q258_benford_second_digit",
    oracle=f"""
    WITH amt AS (
        SELECT o_orderpriority, {_CENTS_O} AS cents FROM orders),
    cnt AS (
        SELECT o_orderpriority,
               CAST(substring(CAST(cents AS VARCHAR), 2, 1) AS INTEGER)
                   AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM amt WHERE cents >= 10
        GROUP BY 1, 2),
    tot AS (
        SELECT o_orderpriority, CAST(SUM(c) AS BIGINT) AS n
        FROM cnt GROUP BY o_orderpriority),
    grid AS (
        SELECT t.o_orderpriority, t.n, g.d
        FROM tot t, (SELECT unnest(range(0, 10)) AS d) g),
    bp AS (
        SELECT grid.o_orderpriority, grid.n,
               (COALESCE(cnt.c, 0) * 10000) // grid.n AS share_bp,
               CASE grid.d {_BENFORD2_SQL} END AS exp_bp
        FROM grid LEFT JOIN cnt
          ON cnt.o_orderpriority = grid.o_orderpriority
         AND cnt.d = grid.d)
    SELECT o_orderpriority, n AS n_amounts,
           CAST(SUM(ABS(share_bp - exp_bp)) AS BIGINT) AS l1_bp
    FROM bp GROUP BY o_orderpriority, n
    ORDER BY o_orderpriority
    """,
    doc="Benford's-law SECOND-digit conformance per order priority: "
    "L1 distance (basis points) between the second-significant-digit "
    "distribution of order totals and Nigrini's two-digit "
    "expectation P(d) = sum_k log10(1+1/(10k+d)) — the follow-up "
    "fraud screen for fabricators who learned the leading-digit law "
    "(second digits include 0 and flatten toward uniform; a "
    "hand-typed amount column usually fails here first). Same "
    "machinery as q180: digit from the exact-cents integer's string "
    "form (no float log10), densified 0-9 grid so absent digits "
    "contribute their full expected share, amounts under 10 cents "
    "(no second digit) excluded identically on both engines. One "
    "scan to the bounded (priority, digit) grid.",
    tags=("tpch", "audit", "stats"),
)
def q258(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf, "orders").select(
        "o_orderpriority", F.expr(_CENTS_O).alias("cents")
    )
    # ONE scan: the per-priority total rides the bounded digit grid
    # as a window instead of a second aggregation branch (trap 5 —
    # the groupBy-then-join-back form split the diamond and scanned
    # orders twice; the window and the densifying join both sit
    # above the single (priority, digit) partial aggregate)
    cnt = (
        o.filter(F.col("cents") >= 10)
        .select(
            "o_orderpriority",
            F.substring(F.col("cents").cast("string"), 2, 1)
            .cast("int")
            .alias("d"),
        )
        .groupBy("o_orderpriority", "d")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "n", F.sum("c").over(Window.partitionBy("o_orderpriority"))
        )
    )
    digits = spark.sql("SELECT explode(sequence(0, 9)) AS d")
    pr = cnt.select("o_orderpriority", "n").distinct()
    grid = pr.join(F.broadcast(digits))
    exp_bp = F.expr(f"CASE d {_BENFORD2_SQL} END")
    # null-safe join keys (trap-12 family): plain equi-keys make
    # InferFiltersFromConstraints push isnotnull(priority, d) into
    # the LEFT-OUTER join's inner branch only, de-canonicalizing the
    # shared (priority, digit) aggregate — the scan then runs twice.
    # eqNullSafe infers nothing and both consumers reuse ONE exchange
    # (plan-contracted).
    right = cnt.select(
        F.col("o_orderpriority").alias("_pr"),
        F.col("d").alias("_d"),
        "c",
    )
    bp = grid.join(
        right,
        grid["o_orderpriority"].eqNullSafe(right["_pr"])
        & grid["d"].eqNullSafe(right["_d"]),
        "left",
    ).select(
        "o_orderpriority",
        "n",
        F.expr("COALESCE(c, 0) * 10000 div n").alias("share_bp"),
        exp_bp.alias("exp_bp"),
    )
    return (
        bp.groupBy("o_orderpriority", "n")
        .agg(
            F.sum(F.abs(F.col("share_bp") - F.col("exp_bp"))).alias("l1_bp")
        )
        .select(
            "o_orderpriority",
            F.col("n").alias("n_amounts"),
            "l1_bp",
        )
        .orderBy("o_orderpriority")
    )


@declare(
    "q259_brand_association_rules",
    oracle="""
    WITH b AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n FROM b),
    marg AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_t
        FROM b GROUP BY brand),
    pairs AS (
        SELECT a.brand AS antecedent, c.brand AS consequent,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM b a JOIN b c
          ON a.okey = c.okey AND a.brand <> c.brand
        GROUP BY 1, 2)
    SELECT p.antecedent, p.consequent, p.n_ab,
           CAST(p.n_ab * 10000 // n.n AS BIGINT) AS support_bp,
           CAST(p.n_ab * 10000 // ma.n_t AS BIGINT) AS confidence_bp,
           CAST(p.n_ab::HUGEINT * n.n * 10000
                // (ma.n_t::HUGEINT * mc.n_t) AS BIGINT) AS lift_bp
    FROM pairs p
    JOIN marg ma ON ma.brand = p.antecedent
    JOIN marg mc ON mc.brand = p.consequent, n
    ORDER BY antecedent, consequent
    """,
    doc="Directional brand association rules over order baskets: for "
    "every (antecedent -> consequent) brand pair, exact-integer "
    "support (pair share of all orders), confidence (P(consequent | "
    "antecedent) — the asymmetric, actionable statistic q194's "
    "symmetric lift cannot express: 'buyers of A also buy B' and its "
    "reverse differ exactly when the marginals do), and lift. ONE "
    "corpus shuffle: orders contract to sorted distinct brand-sets "
    "(part is a broadcast dim), each unordered in-array pair emits "
    "BOTH directions, and the basket count, marginals and pair "
    "counts branch off that single aggregate with broadcast "
    "normalizers — the q194 plan shape with a 2x bounded cell table "
    "(<= |brands|^2 rows). DECIMAL(38,0)/HUGEINT lift product; "
    "non-negative truncating division throughout.",
    tags=("tpch", "audit", "join"),
)
def q259(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.events import association_rules

    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    p = load(spark, sf, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    b = li.join(F.broadcast(p), "l_partkey").select(
        F.col("l_orderkey").alias("okey"), "brand"
    )
    return association_rules(b, ["okey"], "brand")


@declare(
    "q260_effective_type_diversity",
    oracle="""
    WITH c AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2),
    d AS (
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CAST(SUM(c::HUGEINT * c) AS HUGEINT) AS sumsq
        FROM c GROUP BY day)
    SELECT day, n_events, n_types,
           CAST(n_events::HUGEINT * n_events * 1000000 // sumsq
                AS BIGINT) AS effective_types_micro
    FROM d ORDER BY day
    """,
    doc="Effective event-type diversity per day — the inverse Simpson "
    "index N^2/sum(c^2) in exact integer micro-units: 'how many "
    "equally-active types is today's traffic really spread across' "
    "(equals n_types when perfectly even, falls toward 1 as one type "
    "dominates — 1/HHI, the ecology/economics 'effective number'). "
    "Chosen over Shannon entropy deliberately: Simpson is purely "
    "RATIONAL in the counts, so the statistic is exact integer "
    "algebra with no log anywhere (trap 13 — ln is not portable and "
    "would force micro-floor hashing like q201). One scan contracts "
    "events to the bounded (day, type) grid; HUGEINT/DECIMAL(38,0) "
    "squares (c^2 times N^2 passes 2^63 early at scale).",
    tags=("events", "audit", "stats"),
)
def q260(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    c = (
        e.select(F.col("ts").cast("date").alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    d = c.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n_events"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c")).alias("sumsq"),
    )
    return d.select(
        "day",
        "n_events",
        "n_types",
        F.expr(
            "CAST(CAST(n_events AS DECIMAL(38,0)) * n_events * 1000000"
            " div sumsq AS BIGINT)"
        ).alias("effective_types_micro"),
    ).orderBy("day")


@declare(
    "q261_tukey_outlier_rate",
    oracle="""
    WITH o AS (
        SELECT c.c_mktsegment AS segment, {cents} AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    cnt AS (
        SELECT segment, cents, CAST(COUNT(*) AS BIGINT) AS c
        FROM o GROUP BY 1, 2),
    cum AS (
        SELECT segment, cents, c,
               SUM(c) OVER (PARTITION BY segment ORDER BY cents) AS cum,
               SUM(c) OVER (PARTITION BY segment) AS n
        FROM cnt),
    q AS (
        SELECT segment, CAST(MIN(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN cum * 4 >= n THEN cents END)
                    AS BIGINT) AS q1,
               CAST(MIN(CASE WHEN cum * 4 >= 3 * n THEN cents END)
                    AS BIGINT) AS q3
        FROM cum GROUP BY segment),
    f AS (
        SELECT segment, n, q1, q3,
               2 * q1 - 3 * (q3 - q1) AS lo2,
               2 * q3 + 3 * (q3 - q1) AS hi2
        FROM q)
    SELECT f.segment, f.n, f.q1 AS q1_cents, f.q3 AS q3_cents,
           CAST(COALESCE(SUM(CASE WHEN 2 * o.cents < f.lo2
                                    OR 2 * o.cents > f.hi2
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_outliers,
           CAST(COALESCE(SUM(CASE WHEN 2 * o.cents < f.lo2
                                    OR 2 * o.cents > f.hi2
                              THEN 1 ELSE 0 END), 0)
                * 10000 // f.n AS BIGINT) AS outlier_bp
    FROM f JOIN o ON o.segment = f.segment
    GROUP BY f.segment, f.n, f.q1, f.q3
    ORDER BY f.segment
    """.format(cents=_CENTS_O),
    doc="Tukey-fence outlier rate per market segment: the share of "
    "orders outside [Q1 - 1.5*IQR, Q3 + 1.5*IQR] in integer basis "
    "points — the boxplot whisker rule, the robust companion to "
    "q163's winsorized moments (winsorizing CAPS tails; this COUNTS "
    "them) and q247's type-7 quantiles. Quartiles are exact "
    "percentile_disc selectors (smallest value whose cumulative "
    "count reaches ceil(q*n), computed as cum*4 >= n / cum*4 >= 3n "
    "over the bounded (segment, cents) value grid); the fences "
    "compare in DOUBLED units (2x < 2*Q1 - 3*IQR) so 1.5*IQR stays "
    "integer. The outlier count never touches the fact table again: "
    "the value grid already carries every (value, count) row, so the "
    "fences re-join the BOUNDED grid (broadcast) and sum the counts "
    "outside — one orders scan total, plan-contracted.",
    tags=("tpch", "audit", "stats"),
)
def q261(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf, "orders").select(
        "o_custkey", F.expr(_CENTS_O).alias("cents")
    )
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    seg = o.join(F.broadcast(c), "o_custkey").select("segment", "cents")
    cnt = seg.groupBy("segment", "cents").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("segment")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("segment")
    cum = cnt.select(
        "segment",
        "cents",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    q = cum.groupBy("segment").agg(
        F.min("n").alias("n"),
        F.min(
            F.when(F.col("cum") * 4 >= F.col("n"), F.col("cents"))
        ).alias("q1_cents"),
        F.min(
            F.when(F.col("cum") * 4 >= 3 * F.col("n"), F.col("cents"))
        ).alias("q3_cents"),
    )
    f = q.select(
        "segment",
        "n",
        "q1_cents",
        "q3_cents",
        (2 * F.col("q1_cents") - 3 * (F.col("q3_cents") - F.col("q1_cents")))
        .alias("lo2"),
        (2 * F.col("q3_cents") + 3 * (F.col("q3_cents") - F.col("q1_cents")))
        .alias("hi2"),
    )
    # the value grid already carries every (cents, count) row, so the
    # outlier tally sums grid counts against the broadcast fences —
    # the fact table never scans again (both consumers of the grid
    # sit above ONE exchange; plan-contracted ReusedExchange)
    out_c = F.when(
        (2 * F.col("cents") < F.col("lo2"))
        | (2 * F.col("cents") > F.col("hi2")),
        F.col("c"),
    ).otherwise(F.lit(0))
    return (
        cum.select("segment", "cents", "c")
        .join(F.broadcast(f), "segment")
        .groupBy("segment", "n", "q1_cents", "q3_cents")
        .agg(F.sum(out_c).alias("n_outliers"))
        .select(
            "segment",
            "n",
            "q1_cents",
            "q3_cents",
            "n_outliers",
            F.expr("n_outliers * 10000 div n").alias("outlier_bp"),
        )
        .orderBy("segment")
    )


@declare(
    "q263_budgeted_weighted_draw",
    oracle="""
    WITH r AS (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY
                   CAST(CAST(concat('0x', substr(md5('w13b|'
                       || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                       AS DOUBLE)
                     / CAST(n_chars AS DOUBLE),
                   doc_id) AS rk,
               CAST(SUM(n_chars) OVER (PARTITION BY source) AS BIGINT)
                   AS w_tot
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
    tot AS (
        SELECT CAST(SUM(w_tot) AS BIGINT) AS total
        FROM (SELECT DISTINCT source, w_tot FROM r)),
    k AS (
        SELECT r.*, GREATEST(1, w_tot * 50 // tot.total) AS k_budget
        FROM r, tot)
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS weight,
           CAST(k_budget AS BIGINT) AS k_budget
    FROM k WHERE rk <= k_budget
    ORDER BY source, doc_id
    """,
    doc="Budget-PROPORTIONAL weighted draw: each source's sample size "
    "is its share of a 50-doc global budget (k_s = max(1, w_s * 50 "
    "div W), w = total chars — the q178 allocator shape reduced to "
    "proportional shares), and within each source exactly k_s docs "
    "are drawn by the q257 priority-sampling key (u/weight, one "
    "IEEE division of exact integers). The composition a mixture "
    "pipeline actually runs: allocate ACROSS sources, draw WITHIN "
    "each — variable-k per group, where q257 is the fixed-k "
    "primitive. One corpus exchange: the rank window and the "
    "per-source weight total share the source partitioning; the "
    "global normalizer routes through the bounded DISTINCT (source, "
    "w_tot) rollup (never a global window over raw rows) and "
    "returns as a 1-row broadcast.",
    tags=("curation", "sampling"),
)
def q263(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = (
        load(spark, sf, "documents")
        .select("source", "doc_id", "n_chars")
        .filter(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
    )
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("w13b|"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    key = u.cast("double") / F.col("n_chars").cast("double")
    wrank = Window.partitionBy("source").orderBy(key, "doc_id")
    wsrc = Window.partitionBy("source")
    r = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number().over(wrank).alias("rk"),
        F.sum("n_chars").over(wsrc).alias("w_tot"),
    )
    tot = (
        r.select("source", "w_tot")
        .distinct()
        .agg(F.sum("w_tot").alias("total"))
    )
    return (
        r.join(F.broadcast(tot))
        .select(
            "source",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.greatest(
                F.lit(1), F.expr("w_tot * 50 div total")
            ).alias("k_budget"),
            "rk",
        )
        .filter(F.col("rk") <= F.col("k_budget"))
        .drop("rk")
        .orderBy("source", "doc_id")
    )


@declare(
    "q264_chao1_vocab_richness",
    oracle="""
    WITH w AS (
        SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS tok
        FROM documents),
    uni AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS r
        FROM w GROUP BY source, tok),
    s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS s_obs,
               CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f1,
               CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f2
        FROM uni GROUP BY source)
    SELECT source, s_obs, f1, f2,
           CAST(s_obs * 1000
                + f1 * (f1 - 1) * 1000 // (2 * (f2 + 1))
                AS BIGINT) AS chao1_milli
    FROM s ORDER BY source
    """,
    doc="Chao1 species-richness estimate of each source's vocabulary "
    "— the 'how many word types does this source REALLY have, "
    "including the ones we haven't seen yet' lower-bound estimator "
    "(Chao 1984, bias-corrected form: S_obs + f1(f1-1)/(2(f2+1)) "
    "where f1/f2 are singleton/doubleton type counts). Completes the "
    "vocabulary-growth family: q196 Heaps measures how vocabulary "
    "GROWS with tokens, q197 Good-Turing the frequency spectrum, "
    "Chao1 the asymptote — together the tokenizer-budget trio. "
    "Purely rational (the bias-corrected denominator f2+1 never "
    "vanishes, so no guard branch), exact integer milli-units. Two "
    "partial-agg'd aggregations — corpus to per-(source, type) "
    "counts, counts to the 3-number-per-source summary; nothing "
    "wider than (source, token) ever shuffles.",
    tags=("curation", "text", "stats"),
)
def q264(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    uni = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("r"))
    s = uni.groupBy("source").agg(
        F.count(F.lit(1)).alias("s_obs"),
        F.sum(F.when(F.col("r") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("r") == 2, 1).otherwise(0)).alias("f2"),
    )
    return s.select(
        "source",
        "s_obs",
        "f1",
        "f2",
        F.expr(
            "s_obs * 1000 + f1 * (f1 - 1) * 1000 div (2 * (f2 + 1))"
        ).alias("chao1_milli"),
    ).orderBy("source")


@declare(
    "q265_mad_outlier_rate",
    oracle="""
    WITH o AS (
        SELECT c.c_mktsegment AS segment, {cents} AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    cnt AS (
        SELECT segment, cents, CAST(COUNT(*) AS BIGINT) AS c
        FROM o GROUP BY 1, 2),
    cum AS (
        SELECT segment, cents, c,
               SUM(c) OVER (PARTITION BY segment ORDER BY cents) AS cum,
               SUM(c) OVER (PARTITION BY segment) AS n
        FROM cnt),
    med AS (
        SELECT segment, CAST(MIN(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN cum * 2 >= n THEN cents END)
                    AS BIGINT) AS median_cents
        FROM cum GROUP BY segment),
    dev AS (
        SELECT cnt.segment, ABS(cnt.cents - med.median_cents) AS d,
               cnt.c, med.n, med.median_cents
        FROM cnt JOIN med ON med.segment = cnt.segment),
    dcum AS (
        SELECT segment, d, c, n, median_cents,
               SUM(c) OVER (PARTITION BY segment ORDER BY d) AS cum
        FROM dev),
    mad AS (
        SELECT segment, CAST(MIN(n) AS BIGINT) AS n,
               CAST(MIN(median_cents) AS BIGINT) AS median_cents,
               CAST(MIN(CASE WHEN cum * 2 >= n THEN d END)
                    AS BIGINT) AS mad_cents
        FROM dcum GROUP BY segment),
    flag AS (
        SELECT mad.segment, mad.n, mad.median_cents, mad.mad_cents,
               CAST(SUM(CASE WHEN ABS(cnt.cents - mad.median_cents)
                                  * 6745
                                > 35 * mad.mad_cents * 1000
                             THEN cnt.c ELSE 0 END) AS BIGINT)
                   AS n_outliers
        FROM cnt JOIN mad ON mad.segment = cnt.segment
        GROUP BY mad.segment, mad.n, mad.median_cents, mad.mad_cents)
    SELECT segment, n, median_cents, mad_cents, n_outliers,
           CAST(n_outliers * 10000 // n AS BIGINT) AS outlier_bp
    FROM flag ORDER BY segment
    """.format(cents=_CENTS_O),
    doc="Modified z-score (MAD) outlier rate per market segment — the "
    "robust-statistics companion to q261's Tukey fences: a point is "
    "an outlier when |x - median| * 0.6745 / MAD > 3.5 (Iglewicz & "
    "Hoaglin's standard cut), evaluated EXACTLY in integers as "
    "|x - median| * 6745 > 3.5 * MAD * 2000 (both sides scaled by "
    "10^4/10 — no float anywhere). Median and MAD are exact "
    "lower-median selectors: the median off the (segment, cents) "
    "value grid, the MAD off the DEVIATION grid derived from the "
    "same bounded table (|x-median| regroups grid rows, never fact "
    "rows), and the outlier tally again sums GRID counts — the fact "
    "table contributes one scan building the grid and is never "
    "touched again. Zero-MAD segments (over half the mass at the "
    "median) flag everything off-median, identically on both "
    "engines.",
    tags=("tpch", "audit", "stats"),
)
def q265(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf, "orders").select(
        "o_custkey", F.expr(_CENTS_O).alias("cents")
    )
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    seg = o.join(F.broadcast(c), "o_custkey").select("segment", "cents")
    cnt = seg.groupBy("segment", "cents").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("segment")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("segment")
    cum = cnt.select(
        "segment",
        "cents",
        "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    med = cum.groupBy("segment").agg(
        F.min("n").alias("n"),
        F.min(
            F.when(F.col("cum") * 2 >= F.col("n"), F.col("cents"))
        ).alias("median_cents"),
    )
    dev = cnt.join(F.broadcast(med), "segment").select(
        "segment",
        F.abs(F.col("cents") - F.col("median_cents")).alias("d"),
        "c",
        "n",
        "median_cents",
    )
    wdev = (
        Window.partitionBy("segment")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dcum = dev.withColumn("cum", F.sum("c").over(wdev))
    mad = dcum.groupBy("segment").agg(
        F.min("n").alias("n"),
        F.min("median_cents").alias("median_cents"),
        F.min(
            F.when(F.col("cum") * 2 >= F.col("n"), F.col("d"))
        ).alias("mad_cents"),
    )
    flagged = cnt.join(F.broadcast(mad), "segment").select(
        "segment",
        "n",
        "median_cents",
        "mad_cents",
        F.when(
            F.abs(F.col("cents") - F.col("median_cents")) * 6745
            > F.lit(35) * F.col("mad_cents") * 1000,
            F.col("c"),
        )
        .otherwise(F.lit(0))
        .alias("oc"),
    )
    return (
        flagged.groupBy("segment", "n", "median_cents", "mad_cents")
        .agg(F.sum("oc").alias("n_outliers"))
        .select(
            "segment",
            "n",
            "median_cents",
            "mad_cents",
            "n_outliers",
            F.expr("n_outliers * 10000 div n").alias("outlier_bp"),
        )
        .orderBy("segment")
    )


@declare(
    "q267_dup_cluster_size_spectrum",
    oracle="""
    WITH RECURSIVE
    sh AS (
        SELECT doc_id, list(DISTINCT substring(text, CAST(i AS INT), 5)) AS s
        FROM (SELECT doc_id, text,
                     unnest(range(1, greatest(length(text)-4, 1)+1)) AS i
              FROM documents)
        GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) >= 0.9),
    reach(node, label) AS (
        SELECT id_a, id_a FROM pairs
        UNION
        SELECT id_b, id_b FROM pairs
        UNION
        SELECT e.b, r.label
        FROM reach r JOIN (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION ALL
            SELECT id_b AS a, id_a AS b FROM pairs) e
        ON e.a = r.node),
    cc AS (
        SELECT node, MIN(label) AS cluster_id
        FROM reach GROUP BY node),
    sizes AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM cc GROUP BY cluster_id)
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs,
           CAST(COUNT(*) * (cluster_size - 1) AS BIGINT) AS n_removable
    FROM sizes GROUP BY cluster_size
    ORDER BY cluster_size
    """,
    doc="Duplicate-cluster SIZE spectrum: for each cluster size, how "
    "many verified near-dup clusters have it, how many documents "
    "they hold, and how many a keep-one-per-cluster dedup would "
    "remove — the one-page capacity-planning rollup over q83's "
    "connected components (q248 reports per-cluster detail; this is "
    "the histogram that says 'duplication is pairs' vs 'one giant "
    "template cluster', which decides whether keeper selection or "
    "boilerplate stripping is the right tool). Consumes the SHARED "
    "verified pair frame (8th consumer — zero extra LSH cost "
    "in-suite), runs the attested tiered CC, then two bounded "
    "rollups (|clusters| rows, then |distinct sizes|). Oracle is "
    "the q83 recursive-CTE fixpoint plus the same two rollups — "
    "quadratic in documents, so bench SF checks on the slice.",
    tags=("dedup", "audit", "quadratic-oracle"),
)
def q267(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.dedup import verified_pair_frame
    from kaflow_spark.operators.graph import connected_components

    d = load(spark, sf, "documents")
    pairs = verified_pair_frame(d, "doc_id", "text")
    cc = connected_components(pairs, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("n_clusters") * F.col("cluster_size")).alias("n_docs"),
            (F.col("n_clusters") * (F.col("cluster_size") - 1)).alias(
                "n_removable"
            ),
        )
        .orderBy("cluster_size")
    )


@declare(
    "q268_source_token_imbalance",
    oracle="""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(regexp_extract_all(text, '\\S+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    t AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
               CAST(SUM(n_tokens) AS BIGINT) AS tt
        FROM s)
    SELECT s.source, s.n_docs, s.n_tokens,
           CAST(s.n_docs * 10000 // t.td AS BIGINT) AS doc_share_bp,
           CAST(s.n_tokens * 10000 // t.tt AS BIGINT) AS token_share_bp,
           CAST(CASE WHEN s.n_docs * t.tt > 0 THEN
                CAST(s.n_tokens AS HUGEINT) * t.td * 10000
                // (CAST(s.n_docs AS HUGEINT) * t.tt) END AS BIGINT)
               AS imbalance_bp
    FROM s, t ORDER BY s.source
    """,
    doc="Source token-vs-document share imbalance: each source's "
    "share of DOCUMENTS vs its share of TOKENS, and their ratio in "
    "basis points (10000 = documents and tokens agree; above = this "
    "source's documents run long and it punches above its doc count "
    "in the actual training mixture) — the one-look audit that says "
    "whether doc-count-based sampling weights (q69 quotas, q84 "
    "temperature) silently over/under-weight long-document sources, "
    "and the reason the q178 allocator and q257/q263 draws weight by "
    "tokens/chars rather than doc counts. One scan to the bounded "
    "per-source rollup; the two global normalizers ride a 1-row "
    "broadcast; HUGEINT/DECIMAL(38,0) cross-product (n_tokens * "
    "total_docs * 1e4 passes 2^63 at corpus scale).",
    tags=("curation", "audit"),
)
def q268(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    # filter('' ) guard: Spark's split on an EMPTY/whitespace-only
    # string yields [''] (size 1) where DuckDB's \S+ extract yields 0
    # — the fixture has no such text, but the count must not depend
    # on that
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.size(
                F.filter(
                    F.split(F.trim("text"), r"\s+"),
                    lambda x: x != "",
                )
            )
        ).alias("n_tokens"),
    )
    t = s.agg(
        F.sum("n_docs").alias("td"), F.sum("n_tokens").alias("tt")
    )
    return (
        s.join(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("n_docs * 10000 div td").alias("doc_share_bp"),
            F.expr("n_tokens * 10000 div tt").alias("token_share_bp"),
            F.expr(
                "CAST(CASE WHEN n_docs * tt > 0 THEN"
                " CAST(n_tokens AS DECIMAL(38,0)) * td * 10000"
                " div (CAST(n_docs AS DECIMAL(38,0)) * tt) END AS BIGINT)"
            ).alias("imbalance_bp"),
        )
        .orderBy("source")
    )


@declare(
    "q270_source_entropy_evenness",
    oracle="""
    WITH cells AS (
        SELECT source, n_chars // 256 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, bucket),
    t AS (
        SELECT source, bucket, c,
               CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_src,
               CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS k
        FROM cells),
    s AS (
        SELECT source,
               CAST(MAX(n_src) AS BIGINT) AS n_docs,
               CAST(MAX(k) AS BIGINT) AS k_buckets,
               CAST(SUM(CAST(FLOOR(
                   -(CAST(c AS DOUBLE) / n_src)
                   * ln(CAST(c AS DOUBLE) / n_src) * 1000000)
                   AS BIGINT)) AS BIGINT) AS entropy_micro
        FROM t GROUP BY source)
    SELECT source, n_docs, k_buckets, entropy_micro,
           CASE WHEN k_buckets > 1 THEN LEAST(CAST(10000 AS BIGINT),
               CAST(entropy_micro * 10000
                    // CAST(FLOOR(ln(CAST(k_buckets AS DOUBLE)) * 1000000)
                            AS BIGINT) AS BIGINT))
           ELSE CAST(10000 AS BIGINT) END AS evenness_bp
    FROM s ORDER BY source
    """,
    doc="Shannon entropy + Pielou evenness of each source's document-"
    "length mixture (256-char buckets) — the diversity audit beside "
    "the HHI concentration (q207) and inverse-Simpson (q260) views: "
    "entropy in NATS reported as the SUM of per-cell FLOOR-quantized "
    "micro-unit contributions (-p ln p), evenness as integer basis "
    "points of the ln(k) maximum. The q201 ln discipline, extended "
    "to a SUM: ln is NOT correctly rounded (measured 1-ULP libm/JVM "
    "divergence), so each CELL's contribution floors to integer "
    "micro-units FIRST and the cross-cell sum is exact integer "
    "arithmetic — a sum of raw doubles would be order-dependent on "
    "top of the ULP. The evenness ratio is integer division of two "
    "quantized integers, LEAST-capped at 10000 (per-cell flooring "
    "can leave the quotient a hair above 1 on a perfectly uniform "
    "mixture). k=1 sources are maximally even by convention. One "
    "scan: cells -> per-source windows -> one bounded rollup.",
    tags=("audit", "curation"),
)
def q270(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    cells = (
        load(spark, sf, "documents")
        .select("source", F.expr("n_chars div 256").alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t = cells.select(
        "source",
        "c",
        F.sum("c").over(Window.partitionBy("source")).alias("n_src"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("k"),
    )
    s = t.groupBy("source").agg(
        F.max("n_src").cast("bigint").alias("n_docs"),
        F.max("k").cast("bigint").alias("k_buckets"),
        F.sum(
            F.expr(
                "CAST(FLOOR(-(CAST(c AS DOUBLE) / n_src)"
                " * ln(CAST(c AS DOUBLE) / n_src) * 1000000) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("entropy_micro"),
    )
    return s.select(
        "source",
        "n_docs",
        "k_buckets",
        "entropy_micro",
        F.when(
            F.col("k_buckets") > 1,
            F.least(
                F.lit(10000).cast("bigint"),
                F.expr(
                    "entropy_micro * 10000 div CAST(FLOOR("
                    "ln(CAST(k_buckets AS DOUBLE)) * 1000000) AS BIGINT)"
                ),
            ),
        )
        .otherwise(F.lit(10000).cast("bigint"))
        .alias("evenness_bp"),
    ).orderBy("source")


@declare(
    "q271_source_kl_matrix",
    oracle="""
    WITH cells AS (
        SELECT source, n_chars // 256 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2),
    srcs AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_src
        FROM cells GROUP BY source),
    grid AS (SELECT DISTINCT bucket FROM cells),
    nbf AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM grid),
    pa AS (
        SELECT s.source, g.bucket,
               CAST(COALESCE(c.c, 0) + 1 AS BIGINT) AS cs,
               CAST(s.n_src + nbf.nb AS BIGINT) AS tot
        FROM srcs s CROSS JOIN grid g CROSS JOIN nbf
        LEFT JOIN cells c ON c.source = s.source AND c.bucket = g.bucket)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(SUM(CAST(FLOOR((CAST(a.cs AS DOUBLE) / a.tot)
                * ln((CAST(a.cs AS DOUBLE) * b.tot)
                     / (CAST(b.cs AS DOUBLE) * a.tot))
                * 1000000) AS BIGINT)) AS BIGINT) AS kl_micro
    FROM pa a JOIN pa b ON a.bucket = b.bucket AND a.source <> b.source
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Pairwise smoothed KL-divergence drift matrix over the "
    "sources' document-length mixtures (256-char buckets, add-one "
    "smoothing over the union bucket grid so absent cells carry "
    "mass) — the asymmetric info-theoretic member beside the "
    "symmetric screens (q157 overlap, q158 L1, q183 KS, q201 PSI): "
    "KL(a||b) answers 'how surprised is b's mixture by a's "
    "documents', which is the direction that matters when source b "
    "is the training mix and a the candidate. The q270/q201 ln "
    "discipline: each CELL's p_a ln(p_a/p_b) term floors to integer "
    "micro-nats FIRST (ln is 1-ULP engine-divergent), the cross-cell "
    "sum is exact integer arithmetic. Plan shape (ONE corpus scan, "
    "plan-contracted): every branch — per-source totals, the "
    "densifying bucket grid, the global bucket count, the cell "
    "left-join, and BOTH self-join sides — reuses the single "
    "(source, bucket) cell aggregate; two trap-15 hazards are "
    "defused by construction: the grid's bucket projection rides "
    "the load-bearing least(_lb, 1) smoothing term (numerically "
    "exactly the +1 — a bare select('bucket') demotes the branch "
    "to DISTINCT straight off the scan, measured 2 scans), and the "
    "global count is sum(least(_lb, 1)) for the same reason.",
    tags=("audit", "curation", "stats"),
)
def q271(spark: SparkSession, sf: str) -> DataFrame:
    cells = (
        load(spark, sf, "documents")
        .select("source", F.expr("n_chars div 256").alias("bucket"))
        .groupBy("source", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    srcs = cells.groupBy("source").agg(F.sum("c").alias("n_src"))
    buckets = cells.groupBy("bucket").agg(
        F.sum(F.least(F.col("c"), F.lit(1))).alias("_lb")
    )
    nbf = buckets.agg(F.sum(F.least(F.col("_lb"), F.lit(1))).alias("nb"))
    grid = srcs.crossJoin(F.broadcast(buckets)).crossJoin(F.broadcast(nbf))
    right = cells.select(
        F.col("source").alias("_s"), F.col("bucket").alias("_b"), "c"
    )
    pa = (
        grid.join(
            right,
            grid["source"].eqNullSafe(right["_s"])
            & grid["bucket"].eqNullSafe(right["_b"]),
            "left",
        ).select(
            "source",
            "bucket",
            # least(_lb, 1) == 1 (every present bucket has _lb >= 1):
            # the add-one smoothing term, spelled load-bearing so the
            # grid branch keeps the shared cell aggregate (trap 15)
            (F.coalesce("c", F.lit(0)) + F.least(F.col("_lb"), F.lit(1)))
            .cast("bigint")
            .alias("cs"),
            (F.col("n_src") + F.col("nb")).cast("bigint").alias("tot"),
        )
    )
    a = pa.select(
        F.col("source").alias("source_a"),
        "bucket",
        F.col("cs").alias("cs_a"),
        F.col("tot").alias("tot_a"),
    )
    b = pa.select(
        F.col("source").alias("source_b"),
        F.col("bucket").alias("_bb"),
        F.col("cs").alias("cs_b"),
        F.col("tot").alias("tot_b"),
    )
    j = a.join(
        b,
        a["bucket"].eqNullSafe(b["_bb"])
        & (
            F.coalesce(a["source_a"], F.lit(""))
            != F.coalesce(b["source_b"], F.lit(""))
        ),
    )
    return (
        j.groupBy("source_a", "source_b")
        .agg(
            F.sum(
                F.expr(
                    "CAST(FLOOR((CAST(cs_a AS DOUBLE) / tot_a)"
                    " * ln((CAST(cs_a AS DOUBLE) * tot_b)"
                    " / (CAST(cs_b AS DOUBLE) * tot_a))"
                    " * 1000000) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("kl_micro")
        )
        .orderBy("source_a", "source_b")
    )
