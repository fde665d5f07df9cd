"""Round-11 declared queries: cohort/lifecycle analytics and robust
operations audits (q221-q228).

The retention-and-operations layer over the fixture domains: weekly
cohort retention (q221, the canonical triangle matrix), value-band
RFM segmentation (q222, quantile boundaries from the bounded
value-count table — no global rank window), consecutive-day activity
streaks (q223, gaps-and-islands on the contracted activity table),
MAD-based robust outlier audit (q224), strict-order three-step funnel
(q225), supplier lead-time tail percentiles (q226), monthly
order-priority mix drift (q227), and sessionized conversion by depth
(q228). Registry discipline throughout: exact integer arithmetic
(cents / basis points, cumulative-selector order statistics instead
of interpolating percentile functions), calendar-floor epoch days
(unix_date, the round-11 rule), ONE total order per logical window
pass (the q152 corollary), and every enumeration over a BOUNDED
contracted table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kaflow_spark.catalog import load
from kaflow_spark.queries.base import declare

# calendar-floor epoch day (matches the oracle's CAST(ts AS DATE))
_DAY = "CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)"
_DAY_SQL = "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)"


@declare(
    "q221_cohort_retention",
    oracle=f"""
    WITH act AS (
        SELECT DISTINCT user_id, {_DAY_SQL} // 7 AS week_i
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    w AS (
        SELECT user_id, week_i,
               MIN(week_i) OVER (PARTITION BY user_id) AS cw
        FROM act),
    g AS (
        SELECT cw AS cohort_week, week_i - cw AS weeks_since,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM w WHERE week_i - cw <= 8 GROUP BY 1, 2),
    f AS (
        SELECT cohort_week, weeks_since, n_active,
               MAX(CASE WHEN weeks_since = 0 THEN n_active END)
                   OVER (PARTITION BY cohort_week) AS n_cohort
        FROM g)
    SELECT cohort_week, weeks_since, n_active,
           CAST(n_cohort AS BIGINT) AS n_cohort,
           CAST(n_active * 10000 // n_cohort AS BIGINT) AS retention_bp
    FROM f ORDER BY cohort_week, weeks_since
    """,
    doc="Weekly cohort retention triangle: users grouped by their "
    "FIRST active week; for each (cohort, weeks-since) cell within 8 "
    "weeks, the active-user count and its share of the cohort in "
    "basis points. One lineage: the cohort floor is a window over "
    "the SAME user partitioning the distinct-activity contraction "
    "produced (no first-week self-join), the cell aggregation runs "
    "over that, and the cohort size rides the bounded cell table as "
    "a MAX-of-week-0 window (week 0 always exists by construction — "
    "a user is active in their own first week). Weeks are calendar-"
    "floor epoch days div 7 (both operands non-negative post-epoch, "
    "so // == div). Output bounded by |weeks|^2 / 2 cells.",
    tags=("events", "window", "agg"),
)
def q221(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    act = e.select(
        "user_id", F.expr(f"{_DAY} div 7").alias("week_i")
    ).distinct()
    w = act.withColumn(
        "cw", F.min("week_i").over(Window.partitionBy("user_id"))
    )
    g = (
        w.filter(F.expr("week_i - cw <= 8"))
        .groupBy(
            F.col("cw").alias("cohort_week"),
            F.expr("week_i - cw").alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    f = g.withColumn(
        "n_cohort",
        F.max(
            F.when(F.col("weeks_since") == 0, F.col("n_active"))
        ).over(Window.partitionBy("cohort_week")),
    )
    return f.select(
        "cohort_week",
        "weeks_since",
        "n_active",
        "n_cohort",
        F.expr("n_active * 10000 div n_cohort").alias("retention_bp"),
    ).orderBy("cohort_week", "weeks_since")


def _rfm_boundaries_sql(src: str, col: str) -> str:
    """DuckDB CTE body: 4 quintile boundaries of ``col`` from the
    bounded value-count table (k-th order statistics, cum*5 >= q*n —
    integer, no division)."""
    return f"""
        SELECT MIN(CASE WHEN cum * 5 >= 1 * n THEN v END) AS b1,
               MIN(CASE WHEN cum * 5 >= 2 * n THEN v END) AS b2,
               MIN(CASE WHEN cum * 5 >= 3 * n THEN v END) AS b3,
               MIN(CASE WHEN cum * 5 >= 4 * n THEN v END) AS b4
        FROM (
            SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
                   SUM(c) OVER () AS n
            FROM (SELECT {col} AS v, COUNT(*) AS c FROM {src}
                  GROUP BY 1))
    """


def _rfm_band(col: str, b: str) -> str:
    return (
        f"CASE WHEN {col} <= {b}.b1 THEN 1 WHEN {col} <= {b}.b2 THEN 2 "
        f"WHEN {col} <= {b}.b3 THEN 3 WHEN {col} <= {b}.b4 THEN 4 "
        "ELSE 5 END"
    )


@declare(
    "q222_rfm_segments",
    oracle=f"""
    WITH cust AS (
        SELECT MAX(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                   AS BIGINT)) AS last_day,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) // 100 AS BIGINT) AS dollars
        FROM orders GROUP BY o_custkey),
    br AS ({_rfm_boundaries_sql('cust', 'last_day')}),
    bf AS ({_rfm_boundaries_sql('cust', 'freq')}),
    bm AS ({_rfm_boundaries_sql('cust', 'dollars')}),
    seg AS (
        SELECT {_rfm_band('last_day', 'br')} AS r_band,
               {_rfm_band('freq', 'bf')} AS f_band,
               {_rfm_band('dollars', 'bm')} AS m_band,
               dollars
        FROM cust, br, bf, bm)
    SELECT CAST(r_band AS BIGINT) AS r_band,
           CAST(f_band AS BIGINT) AS f_band,
           CAST(m_band AS BIGINT) AS m_band,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(dollars) AS BIGINT) AS sum_dollars
    FROM seg GROUP BY 1, 2, 3 ORDER BY r_band, f_band, m_band
    """,
    doc="RFM segmentation of the order book: per customer, recency "
    "(last order's epoch day), frequency (order count) and monetary "
    "(exact total cents); each metric banded into VALUE-BASED "
    "quintiles whose 4 boundaries are k-th order statistics read off "
    "the bounded value-count table with the q148 cumulative selector "
    "(integer cum*5 >= q*n, no division) — never a global row_number "
    "over the customer population (rank quintiles need a single-"
    "partition sort of |customers|; value quintiles need |distinct "
    "values| rows, with monetary quantized to whole dollars to bound "
    "them — ties share a band, documented semantics). Boundaries "
    "broadcast as one row; output <= 125 segment cells with exact "
    "cents totals.",
    tags=("tpch", "agg", "stats"),
)
def q222(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    # ONE corpus aggregation; both consumers below project the same
    # three columns, so the exchange under it is reused (trap 5 —
    # the first cut computed boundaries per metric from three
    # separately-pruned copies and scanned orders four times)
    cust = o.groupBy("o_custkey").agg(
        F.expr(
            "MAX(CAST(unix_date(CAST(o_orderdate AS DATE)) AS BIGINT))"
        ).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.expr(
            "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 "
            "AS BIGINT)) div 100 AS BIGINT)"
        ).alias("dollars"),
    ).select("last_day", "freq", "dollars")

    # melt the three metrics into (metric, v) and read all 12
    # boundaries off ONE bounded value-count table
    melted = cust.select(
        F.explode(
            F.array(
                F.struct(F.lit("r").alias("m"), F.col("last_day").alias("v")),
                F.struct(F.lit("f").alias("m"), F.col("freq").alias("v")),
                F.struct(F.lit("m").alias("m"), F.col("dollars").alias("v")),
            )
        ).alias("mv")
    ).select("mv.m", "mv.v")
    cnt = melted.groupBy("m", "v").agg(F.count(F.lit(1)).alias("c"))
    wp = Window.partitionBy("m")
    cum = cnt.select(
        "m",
        "v",
        F.sum("c").over(wp.orderBy("v")).alias("cum"),
        F.sum("c").over(wp).alias("n"),
    )
    bounds = cum.agg(
        *[
            F.min(
                F.when(
                    (F.col("m") == metric) & F.expr(f"cum * 5 >= {q} * n"),
                    F.col("v"),
                )
            ).alias(f"{metric}{q}")
            for metric in ("r", "f", "m")
            for q in (1, 2, 3, 4)
        ]
    )

    def band(col: str, p: str) -> F.Column:
        return (
            F.when(F.col(col) <= F.col(f"{p}1"), 1)
            .when(F.col(col) <= F.col(f"{p}2"), 2)
            .when(F.col(col) <= F.col(f"{p}3"), 3)
            .when(F.col(col) <= F.col(f"{p}4"), 4)
            .otherwise(5)
            .cast("bigint")
        )

    seg = cust.crossJoin(F.broadcast(bounds)).select(
        band("last_day", "r").alias("r_band"),
        band("freq", "f").alias("f_band"),
        band("dollars", "m").alias("m_band"),
        "dollars",
    )
    return (
        seg.groupBy("r_band", "f_band", "m_band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("dollars").alias("sum_dollars"),
        )
        .orderBy("r_band", "f_band", "m_band")
    )


@declare(
    "q223_activity_streaks",
    oracle=f"""
    WITH act AS (
        SELECT DISTINCT event_type, user_id, {_DAY_SQL} AS day_i
        FROM events
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
          AND ts IS NOT NULL),
    isl AS (
        SELECT event_type, user_id,
               day_i - ROW_NUMBER() OVER (
                   PARTITION BY event_type, user_id ORDER BY day_i)
                   AS grp
        FROM act),
    streaks AS (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS len
        FROM isl GROUP BY event_type, user_id, grp),
    per_user AS (
        SELECT event_type, user_id, MAX(len) AS best
        FROM streaks GROUP BY event_type, user_id)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MAX(best) AS BIGINT) AS max_streak,
           CAST(COUNT(*) FILTER (best >= 7) AS BIGINT) AS users_7plus,
           CAST(SUM(best) AS BIGINT) AS sum_best
    FROM per_user GROUP BY event_type ORDER BY event_type
    """,
    doc="Consecutive-day activity streaks per event type: gaps-and-"
    "islands (day minus row_number — deterministic because the "
    "contracted activity table has DISTINCT days per (type, user), "
    "so the ordering is total) over the distinct-activity "
    "contraction, then each user's best streak and the per-type "
    "rollup: user count, longest streak anywhere, users with a "
    "7-day-plus streak, and the exact sum of best streaks (integer — "
    "the reader derives the mean at whatever precision they need). "
    "The explode-free cousin of the q203 rolling family: one window "
    "+ two partial-agg'd aggregations, never the raw event log "
    "beyond the first contraction.",
    tags=("events", "window", "agg"),
)
def q223(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    act = e.select(
        "event_type", "user_id", F.expr(_DAY).alias("day_i")
    ).distinct()
    isl = act.withColumn(
        "grp",
        F.col("day_i")
        - F.row_number().over(
            Window.partitionBy("event_type", "user_id").orderBy("day_i")
        ),
    )
    streaks = isl.groupBy("event_type", "user_id", "grp").agg(
        F.count(F.lit(1)).alias("len")
    )
    per_user = streaks.groupBy("event_type", "user_id").agg(
        F.max("len").alias("best")
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.max("best").alias("max_streak"),
            F.sum(
                (F.col("best") >= 7).cast("bigint")
            ).alias("users_7plus"),
            F.sum("best").alias("sum_best"),
        )
        .orderBy("event_type")
    )


@declare(
    "q224_mad_outliers",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL),
    cnt AS (SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS c
            FROM e GROUP BY 1, 2),
    cum AS (
        SELECT event_type, cents, c,
               SUM(c) OVER (PARTITION BY event_type ORDER BY cents)
                   AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM cnt),
    med AS (
        SELECT event_type, MIN(cents) AS med, MIN(n) AS n
        FROM cum WHERE cum >= (n + 1) // 2 GROUP BY event_type),
    dcnt AS (
        SELECT cnt.event_type, ABS(cnt.cents - m.med) AS d,
               CAST(SUM(cnt.c) AS BIGINT) AS c
        FROM cnt JOIN med m ON cnt.event_type = m.event_type
        GROUP BY 1, 2),
    dcum AS (
        SELECT event_type, d, c,
               SUM(c) OVER (PARTITION BY event_type ORDER BY d) AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM dcnt),
    mad AS (
        SELECT event_type, MIN(d) AS mad
        FROM dcum WHERE cum >= (n + 1) // 2 GROUP BY event_type)
    SELECT m.event_type,
           CAST(m.n AS BIGINT) AS n,
           CAST(m.med AS BIGINT) AS median_cents,
           CAST(d.mad AS BIGINT) AS mad_cents,
           CAST(SUM(CASE WHEN v.d > 3 * d.mad THEN v.c ELSE 0 END)
               AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN v.d > 3 * d.mad THEN v.c ELSE 0 END)
               * 10000 // m.n AS BIGINT) AS outlier_bp
    FROM dcnt v JOIN med m ON v.event_type = m.event_type
                JOIN mad d ON v.event_type = d.event_type
    GROUP BY m.event_type, m.n, m.med, d.mad
    ORDER BY m.event_type
    """,
    doc="Robust outlier audit per event type: exact lower-median of "
    "the cents-quantized value, exact MAD (lower-median of absolute "
    "deviations), and the share of rows beyond 3 MADs in basis "
    "points — the outlier monitor that a mean/stddev z-score audit "
    "gets wrong on heavy-tailed metrics (the outliers inflate the "
    "stddev that is supposed to flag them). Both medians are k-th "
    "order statistics via the q148 cumulative selector over bounded "
    "(type, value, count) tables — no interpolating percentile "
    "function (engine-dependent float), no collect. A zero MAD "
    "(majority-constant series) degenerates to flagging every "
    "non-median value — the documented MAD convention, exact on "
    "both engines. ONE corpus scan: the deviation distribution is "
    "DERIVED from the same (type, cents, count) contraction that "
    "produced the median (re-group its counts by |cents - med|) "
    "rather than re-scanning events — every stage after the first "
    "aggregation runs on the bounded value table, and the three "
    "consumers of that aggregate keep identical subtrees so the "
    "exchange is reused (plan-asserted).",
    tags=("events", "stats", "audit"),
)
def q224(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_type",
        F.expr(
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
    )

    # the ONE corpus aggregation; everything below runs on this
    # bounded (type, cents, count) table
    cnt = e.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).alias("c")
    )

    def selector(df: DataFrame, val: str, out: str) -> DataFrame:
        wp = Window.partitionBy("event_type")
        cum = df.select(
            "event_type",
            val,
            F.sum("c").over(wp.orderBy(val)).alias("cum"),
            F.sum("c").over(wp).alias("n"),
        )
        return (
            cum.filter(F.expr("cum >= (n + 1) div 2"))
            .groupBy("event_type")
            .agg(F.min(val).alias(out), F.min("n").alias("n"))
        )

    med = selector(cnt, "cents", "med")
    # deviation distribution DERIVED from cnt — no second events scan
    dcnt = (
        cnt.join(F.broadcast(med.select("event_type", "med")), "event_type")
        .groupBy(
            "event_type",
            F.abs(F.col("cents") - F.col("med")).alias("d"),
        )
        .agg(F.sum("c").alias("c"))
    )
    mad = selector(dcnt, "d", "mad").drop("n")
    return (
        dcnt.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med", "mad")
        .agg(
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), F.col("c")).otherwise(
                    F.lit(0)
                )
            ).alias("n_outliers")
        )
        .select(
            "event_type",
            "n",
            F.col("med").alias("median_cents"),
            F.col("mad").alias("mad_cents"),
            "n_outliers",
            F.expr("n_outliers * 10000 div n").alias("outlier_bp"),
        )
        .orderBy("event_type")
    )


@declare(
    "q225_funnel_strict",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IN ('view', 'click', 'purchase')),
    f1 AS (
        SELECT user_id, event_type, sec,
               MIN(CASE WHEN event_type = 'view' THEN sec END)
                   OVER (PARTITION BY user_id) AS fv
        FROM s),
    f2 AS (
        SELECT user_id, event_type, sec, fv,
               MIN(CASE WHEN event_type = 'click' AND fv IS NOT NULL
                        AND sec >= fv THEN sec END)
                   OVER (PARTITION BY user_id) AS fc
        FROM f1),
    per_user AS (
        SELECT user_id, MIN(fv) AS fv, MIN(fc) AS fc,
               MIN(CASE WHEN event_type = 'purchase' AND fc IS NOT NULL
                        AND sec >= fc THEN sec END) AS fp
        FROM f2 GROUP BY user_id),
    seg AS (
        SELECT c.c_mktsegment AS segment, u.fv, u.fc, u.fp
        FROM per_user u JOIN customer c ON c.c_custkey = u.user_id
        WHERE u.fv IS NOT NULL)
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_viewed,
           CAST(COUNT(fc) AS BIGINT) AS n_clicked,
           CAST(COUNT(fp) AS BIGINT) AS n_purchased,
           CAST(COUNT(fc) * 10000 // COUNT(*) AS BIGINT) AS click_bp,
           CAST(COUNT(fp) * 10000 // COUNT(*) AS BIGINT)
               AS purchase_bp
    FROM seg GROUP BY segment ORDER BY segment
    """,
    doc="Strict-order three-step funnel by market segment: first "
    "view, first click AT OR AFTER that view, first purchase at or "
    "after that click — order-sensitive by construction (a purchase "
    "before the click chain does not count), which is what separates "
    "a funnel from three independent EXISTS tests. The step floors "
    "are CHAINED window minima over the same user partitioning (two "
    "window passes, one shuffle — each step's floor conditions on "
    "the previous step's, the q216 shape extended one level); the "
    "per-user row then joins the broadcast customer dim. Truncated "
    "epoch seconds on both engines; counts and basis points only.",
    tags=("events", "window", "join"),
)
def q225(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    s = e.filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id", "event_type", F.expr("CAST(ts AS LONG)").alias("sec")
    )
    w = Window.partitionBy("user_id")
    f1 = s.withColumn(
        "fv",
        F.min(
            F.when(F.col("event_type") == "view", F.col("sec"))
        ).over(w),
    )
    f2 = f1.withColumn(
        "fc",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & F.col("fv").isNotNull()
                & (F.col("sec") >= F.col("fv")),
                F.col("sec"),
            )
        ).over(w),
    )
    per_user = f2.groupBy("user_id").agg(
        F.min("fv").alias("fv"),
        F.min("fc").alias("fc"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("fc").isNotNull()
                & (F.col("sec") >= F.col("fc")),
                F.col("sec"),
            )
        ).alias("fp"),
    )
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    seg = per_user.filter(F.col("fv").isNotNull()).join(
        F.broadcast(c), "user_id"
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_viewed"),
            F.count("fc").alias("n_clicked"),
            F.count("fp").alias("n_purchased"),
        )
        .select(
            "segment",
            "n_viewed",
            "n_clicked",
            "n_purchased",
            F.expr("n_clicked * 10000 div n_viewed").alias("click_bp"),
            F.expr("n_purchased * 10000 div n_viewed").alias(
                "purchase_bp"
            ),
        )
        .orderBy("segment")
    )


@declare(
    "q226_lead_time_percentiles",
    oracle="""
    WITH lt AS (
        SELECT n.n_name AS nation,
               CAST(CAST(l.l_shipdate AS DATE)
                    - CAST(o.o_orderdate AS DATE) AS BIGINT) AS days
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey),
    cnt AS (SELECT nation, days, COUNT(*) AS c FROM lt GROUP BY 1, 2),
    cum AS (
        SELECT nation, days,
               SUM(c) OVER (PARTITION BY nation ORDER BY days) AS cum,
               SUM(c) OVER (PARTITION BY nation) AS n
        FROM cnt)
    SELECT nation, CAST(MIN(n) AS BIGINT) AS n_items,
           CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN days END)
               AS BIGINT) AS p50,
           CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN days END)
               AS BIGINT) AS p90,
           CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN days END)
               AS BIGINT) AS p99
    FROM cum GROUP BY nation ORDER BY nation
    """,
    doc="Supplier lead-time tail percentiles by nation: order-date to "
    "ship-date in whole days, exact p50/p90/p99 as k-th order "
    "statistics (ceiling rank via integer cum*100 >= p*n — no "
    "interpolation, no engine percentile function) read off the "
    "bounded (nation, days, count) table in ONE pass — all three "
    "percentiles are conditional minima of the same cumulative "
    "selector, so adding p99.9 would cost nothing. The fact-to-fact "
    "lineitem-orders join shuffles on the shared order key (co-"
    "partitioned at scale); supplier and nation attach broadcast. "
    "Day difference is a DATE subtraction on both engines — no "
    "epoch arithmetic, no timezone exposure.",
    tags=("tpch", "join", "stats"),
)
def q226(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    lt = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.expr(
                "CAST(datediff(CAST(l_shipdate AS DATE), "
                "CAST(o_orderdate AS DATE)) AS BIGINT)"
            ).alias("days"),
        )
    )
    cnt = lt.groupBy("nation", "days").agg(F.count(F.lit(1)).alias("c"))
    wp = Window.partitionBy("nation")
    cum = cnt.select(
        "nation",
        "days",
        F.sum("c").over(wp.orderBy("days")).alias("cum"),
        F.sum("c").over(wp).alias("n"),
    )
    return (
        cum.groupBy("nation")
        .agg(
            F.min("n").alias("n_items"),
            F.min(
                F.when(F.expr("cum * 100 >= 50 * n"), F.col("days"))
            ).alias("p50"),
            F.min(
                F.when(F.expr("cum * 100 >= 90 * n"), F.col("days"))
            ).alias("p90"),
            F.min(
                F.when(F.expr("cum * 100 >= 99 * n"), F.col("days"))
            ).alias("p99"),
        )
        .orderBy("nation")
    )


@declare(
    "q227_priority_mix_shift",
    oracle="""
    WITH o AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                    + EXTRACT(month FROM o_orderdate) AS BIGINT)
                   AS month_i,
               o_orderpriority AS prio
        FROM orders),
    cell AS (SELECT month_i, prio, CAST(COUNT(*) AS BIGINT) AS c
             FROM o GROUP BY 1, 2),
    grid AS (
        SELECT m.month_i, p.prio, COALESCE(cell.c, 0) AS c
        FROM (SELECT DISTINCT month_i FROM cell) m
        CROSS JOIN (SELECT DISTINCT prio FROM cell) p
        LEFT JOIN cell ON cell.month_i = m.month_i
                      AND cell.prio = p.prio),
    share AS (
        SELECT month_i, prio, c,
               CAST(c * 10000 // SUM(c) OVER (PARTITION BY month_i)
                   AS BIGINT) AS bp
        FROM grid),
    lagd AS (
        SELECT month_i, prio, c, bp,
               LAG(bp) OVER (PARTITION BY prio ORDER BY month_i)
                   AS prev_bp,
               LAG(month_i) OVER (PARTITION BY prio ORDER BY month_i)
                   AS prev_m
        FROM share)
    SELECT month_i, CAST(SUM(c) AS BIGINT) AS n_orders,
           CAST(SUM(ABS(bp - prev_bp)) // 2 AS BIGINT) AS l1_shift_bp
    FROM lagd WHERE prev_m = month_i - 1
    GROUP BY month_i ORDER BY month_i
    """,
    doc="Monthly order-priority mix drift: each month's priority "
    "share vector in basis points, and the L1/2 distance to the "
    "PREVIOUS month's vector — the time-series cousin of q158's "
    "source drift (same metric, adjacent-period comparison instead "
    "of source-vs-corpus). The corpus contracts to a |months| x "
    "|priorities| cell table in one aggregation; the dense grid "
    "(missing cells = 0 share, so a priority VANISHING counts as "
    "drift) and both windows run over that bounded table. Only "
    "months with a calendar-adjacent predecessor emit — a gap month "
    "compares to nothing. Calendar month via year*12+month on both "
    "engines (UTC timestamps; no epoch-day approximation of months).",
    tags=("tpch", "window", "audit"),
)
def q227(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        F.expr(
            "CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)"
        ).alias("month_i"),
        F.col("o_orderpriority").alias("prio"),
    )
    cell = o.groupBy("month_i", "prio").agg(
        F.count(F.lit(1)).alias("c")
    )
    months = cell.select("month_i").distinct()
    prios = cell.select("prio").distinct()
    grid = (
        months.crossJoin(F.broadcast(prios))
        .join(cell, ["month_i", "prio"], "left")
        .select(
            "month_i", "prio", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    share = grid.withColumn(
        "bp",
        F.expr(
            "c * 10000 div SUM(c) OVER (PARTITION BY month_i)"
        ),
    )
    wl = Window.partitionBy("prio").orderBy("month_i")
    lagd = share.select(
        "month_i",
        "prio",
        "c",
        "bp",
        F.lag("bp").over(wl).alias("prev_bp"),
        F.lag("month_i").over(wl).alias("prev_m"),
    )
    return (
        lagd.filter(F.expr("prev_m = month_i - 1"))
        .groupBy("month_i")
        .agg(
            F.sum("c").alias("n_orders"),
            F.expr(
                "CAST(SUM(ABS(bp - prev_bp)) div 2 AS BIGINT)"
            ).alias("l1_shift_bp"),
        )
        .orderBy("month_i")
    )


@declare(
    "q228_session_depth_conversion",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id,
               CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec,
               event_type = 'purchase' AS is_purchase
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    flagged AS (
        SELECT user_id, sec, event_id, is_purchase,
               CASE WHEN sec - LAG(sec) OVER w > 1800
                    OR LAG(sec) OVER w IS NULL THEN 1 ELSE 0 END
                   AS new_sess
        FROM s WINDOW w AS (PARTITION BY user_id
                            ORDER BY sec, event_id)),
    sess AS (
        SELECT user_id, is_purchase,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY sec, event_id) AS sid
        FROM flagged),
    per_sess AS (
        SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(is_purchase) AS converted
        FROM sess GROUP BY user_id, sid),
    banded AS (
        SELECT LEAST(n_events, 10) AS depth_band, converted
        FROM per_sess)
    SELECT CAST(depth_band AS BIGINT) AS depth_band,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (converted) AS BIGINT) AS n_converted,
           CAST(COUNT(*) FILTER (converted) * 10000 // COUNT(*)
               AS BIGINT) AS conversion_bp
    FROM banded GROUP BY depth_band ORDER BY depth_band
    """,
    doc="Sessionized conversion by depth: sessions are 30-minute-gap "
    "islands per user (the new-session flag and its running sum "
    "share ONE total order (sec, event_id) — the q152 corollary: two "
    "window specs in one logical pass must agree on ordering or ties "
    "mis-assemble islands); per session, the event count and whether "
    "it contains a purchase; output per depth band (1..9, 10+ "
    "capped) the session count and conversion share in basis points "
    "— the engagement-depth curve behind 'do longer sessions "
    "convert'. Both windows ride one user-partitioned shuffle; the "
    "rollup contracts to <= 10 rows. Truncated epoch seconds on "
    "both engines.",
    tags=("events", "window", "agg"),
)
def q228(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.expr("CAST(ts AS LONG)").alias("sec"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = e.withColumn(
        "new_sess",
        F.when(
            (F.col("sec") - F.lag("sec").over(w) > 1800)
            | F.lag("sec").over(w).isNull(),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn("sid", F.sum("new_sess").over(w))
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("is_purchase").alias("converted"),
    )
    banded = per_sess.select(
        F.least(F.col("n_events"), F.lit(10)).alias("depth_band"),
        "converted",
    )
    return (
        banded.groupBy("depth_band")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.col("converted").cast("bigint")).alias("n_converted"),
        )
        .select(
            "depth_band",
            "n_sessions",
            "n_converted",
            F.expr("n_converted * 10000 div n_sessions").alias(
                "conversion_bp"
            ),
        )
        .orderBy("depth_band")
    )
