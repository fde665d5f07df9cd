"""Round-11 declared queries, batch 2: sequence and distribution
analytics (q229-q233, q235-q240).

Shapes the earlier suites don't cover: a within-order shipment
dispersion audit (q229 — split shipments per priority), sweep-line
peak concurrency of 30-minute sessions (q230 — the +1/-1 delta
prefix-sum idiom, partitioned per day by clipping sessions at
midnight so no global single-reducer cumulative sum exists), an
Instacart-style repeat-purchase share per part brand (q231), a
time-to-next-event survival curve per event type (q232 — survival
read off the bounded (type, gap) contraction, never the raw gap
rows), and Pareto revenue coverage per market segment (q233 — "how
few customers cover 80% of revenue", an exact integer cumulative
selector over the per-segment value table in the q222/q148 family).
Batch 3 adds single change-point detection per event type (q235 —
binary segmentation through an exact quantized integer objective)
and the Mann-Whitney U / common-language effect size between source
pairs over document length (q236 — the tie-corrected rank-sum kept
integral by doubling). Batch 4 adds the co-spike incident matrix
(q238 — tail-event alignment between event types), the supplier
price-spread audit (q239 — exact milli-cent unit prices, no float
division), and the stale-part audit (q240 — data-defined horizon).
q237 reads the OTHER classic sweep-line
statistic off q230's shared day-clipped delta grid: daily busy-time
coverage (interval-union length — overlaps counted once). The
cluster-quality silhouette (q234) lives with the other embedding
queries in llm.py.

Registry discipline throughout: exact integer arithmetic (cents and
basis points; `div` / `//` truncation identical on both engines for
the non-negative operands used here), truncated epoch seconds
(CAST(ts AS LONG) == epoch_us // 1e6), ONE total order shared by
every window of a logical pass (the q152 corollary), and unique-key
tie-breaks (event_id / (orderkey, linenumber)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kaflow_spark.catalog import load
from kaflow_spark.queries.base import declare

_SEC = "CAST(ts AS LONG)"
_SEC_SQL = "CAST(epoch_us(ts) // 1000000 AS BIGINT)"


@declare(
    "q229_split_shipments",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               CAST(MAX(CAST(CAST(l_shipdate AS DATE)
                    - DATE '1970-01-01' AS BIGINT))
                  - MIN(CAST(CAST(l_shipdate AS DATE)
                    - DATE '1970-01-01' AS BIGINT)) AS BIGINT)
                   AS span_days,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY 1),
    j AS (
        SELECT o.o_orderpriority, p.span_days
        FROM per_order p JOIN orders o ON p.l_orderkey = o.o_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN span_days >= 7 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_split,
           CAST(SUM(CASE WHEN span_days >= 7 THEN 1 ELSE 0 END)
               * 10000 // COUNT(*) AS BIGINT) AS split_bp,
           CAST(MAX(span_days) AS BIGINT) AS max_span_days,
           CAST(SUM(span_days) // COUNT(*) AS BIGINT)
               AS mean_span_days
    FROM j GROUP BY 1 ORDER BY o_orderpriority
    """,
    doc="Split-shipment audit per order priority: each order's "
    "lineitems span a shipdate range (calendar-floor epoch days); "
    "an order is SPLIT when that span reaches 7 days — the "
    "fulfillment-quality signal behind 'are high-priority orders "
    "shipping in one go'. Per priority: order count, split count "
    "and share in basis points, the worst span, and the floor-mean "
    "span. Shape: lineitem contracts to one row per order in a "
    "partial-agg'd groupBy on the order key (the natural bucketing "
    "key of a TPC-H warehouse — co-partitioned with orders, so the "
    "join adds no extra fact shuffle), then the rollup is "
    "|priorities| rows. Distinct from q226 (supplier lead-time "
    "percentiles — per-line latency) and q117 (lateness share): "
    "this one audits WITHIN-order dispersion.",
    tags=("tpch", "join", "agg", "audit"),
)
def q229(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(unix_date(CAST(l_shipdate AS DATE)) AS BIGINT)").alias(
            "ship_day"
        ),
    )
    per_order = li.groupBy("l_orderkey").agg(
        (F.max("ship_day") - F.min("ship_day")).alias("span_days"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    j = per_order.join(o, per_order.l_orderkey == o.o_orderkey)
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("span_days") >= 7, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("n_split"),
            F.max("span_days").alias("max_span_days"),
            F.sum("span_days").alias("_sum_span"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "n_split",
            F.expr("n_split * 10000 div n_orders").alias("split_bp"),
            "max_span_days",
            F.expr("_sum_span div n_orders").alias("mean_span_days"),
        )
        .orderBy("o_orderpriority")
    )


# ---- shared session-span delta grid (q230 peak / q237 coverage) ----

_SPAN_GRID_SQL = f"""e AS (
        SELECT user_id, event_id, {_SEC_SQL} AS sec
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    f AS (
        SELECT user_id, sec, event_id,
               CASE WHEN sec - LAG(sec) OVER w > 1800
                    OR LAG(sec) OVER w IS NULL THEN 1 ELSE 0 END
                   AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id
                            ORDER BY sec, event_id)),
    s AS (
        SELECT user_id, sec,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY sec, event_id) AS sid
        FROM f),
    ps AS (
        SELECT user_id, sid, MIN(sec) AS s0, MAX(sec) AS s1
        FROM s GROUP BY 1, 2),
    spans AS (
        SELECT UNNEST(generate_series(s0 // 86400, s1 // 86400))
                   AS day_i, s0, s1
        FROM ps),
    cl AS (
        SELECT day_i, GREATEST(s0, day_i * 86400) AS lo,
               LEAST(s1, day_i * 86400 + 86399) AS hi
        FROM spans),
    d AS (
        SELECT day_i, lo AS sec, 1 AS delta FROM cl
        UNION ALL
        SELECT day_i, hi + 1, -1 FROM cl),
    g AS (
        SELECT day_i, sec, SUM(delta) AS dsum,
               SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS starts
        FROM d GROUP BY 1, 2)"""


def _session_delta_grid(spark: SparkSession, sf: str) -> DataFrame:
    """Day-clipped session-span +1/-1 delta grid (the shared sweep-
    line substrate of q230's peak and q237's coverage): sessionize
    (30-minute gap islands; flag and running sum share ONE total
    order — the q152 corollary), clip each session span at midnight
    (concurrency/coverage at an instant depend only on sessions
    overlapping it, so everything downstream partitions BY DAY and
    distributes — no global prefix sum), emit +1/-1 at span edges
    and aggregate per (day, second) so the downstream running sum
    has a unique total order. Returns (day_i, sec, dsum, starts)."""
    e = (
        load(spark, sf, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "event_id", F.expr(_SEC).alias("sec"))
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
        F.min("sec").alias("s0"), F.max("sec").alias("s1")
    )
    spans = per_sess.select(
        F.explode(
            F.sequence(F.expr("s0 div 86400"), F.expr("s1 div 86400"))
        ).alias("day_i"),
        "s0",
        "s1",
    )
    cl = spans.select(
        "day_i",
        F.greatest("s0", F.expr("day_i * 86400")).alias("lo"),
        F.least("s1", F.expr("day_i * 86400 + 86399")).alias("hi"),
    )
    deltas = cl.select(
        "day_i",
        F.expr(
            "stack(2, lo, CAST(1 AS BIGINT), "
            "hi + 1, CAST(-1 AS BIGINT)) AS (sec, delta)"
        ),
    )
    return deltas.groupBy("day_i", "sec").agg(
        F.sum("delta").alias("dsum"),
        F.sum(
            F.when(F.col("delta") == 1, F.lit(1)).otherwise(F.lit(0))
        ).alias("starts"),
    )


@declare(
    "q230_peak_concurrency",
    oracle=f"""
    WITH {_SPAN_GRID_SQL},
    r AS (
        SELECT day_i, starts,
               SUM(dsum) OVER (PARTITION BY day_i ORDER BY sec) AS run
        FROM g)
    SELECT CAST(day_i AS BIGINT) AS day_i,
           CAST(SUM(starts) AS BIGINT) AS n_sessions,
           CAST(MAX(run) AS BIGINT) AS peak_concurrent
    FROM r GROUP BY 1 ORDER BY day_i
    """,
    doc="Peak concurrent sessions per day, sweep-line: sessionize "
    "(30-minute gap islands, flag and running sum sharing ONE total "
    "order — the q152 corollary), clip each session's [start, end] "
    "second span at midnight boundaries (sequence over its day "
    "range; sessions are short by construction so the explode is "
    "1-2 rows), emit +1/-1 deltas at span edges, aggregate deltas "
    "per (day, second) so the running sum has a unique total order, "
    "and take the per-day max of the prefix sum. Clipping is the "
    "scale design: concurrency at any instant only depends on "
    "sessions overlapping it, so the cumulative window partitions "
    "BY DAY and distributes — no global single-reducer prefix sum. "
    "A -1 landing one second past midnight stays attached to its "
    "own day where it is ordered after every real sample point; a "
    "decrease never raises a max. Truncated sec//86400 days on "
    "both engines (identical truncation semantics).",
    tags=("events", "window", "agg"),
)
def q230(spark: SparkSession, sf: str) -> DataFrame:
    g = _session_delta_grid(spark, sf)
    r = g.withColumn(
        "run",
        F.sum("dsum").over(Window.partitionBy("day_i").orderBy("sec")),
    )
    return (
        r.groupBy("day_i")
        .agg(
            F.sum("starts").alias("n_sessions"),
            F.max("run").alias("peak_concurrent"),
        )
        .orderBy("day_i")
    )


@declare(
    "q231_reorder_share",
    oracle="""
    WITH j AS (
        SELECT l.l_partkey, o.o_custkey,
               ROW_NUMBER() OVER (
                   PARTITION BY o.o_custkey, l.l_partkey
                   ORDER BY o.o_orderdate, l.l_orderkey, l.l_linenumber
               ) AS rn
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    g AS (
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN j.rn > 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_repeat
        FROM j JOIN part p ON j.l_partkey = p.p_partkey
        GROUP BY 1)
    SELECT p_brand, n_lines, n_repeat,
           CAST(n_repeat * 10000 // n_lines AS BIGINT) AS repeat_bp
    FROM g ORDER BY p_brand
    """,
    doc="Repeat-purchase share per part brand (the Instacart "
    "'reordered' flag): a line is a repeat when the same customer "
    "bought the same part in an earlier order — ROW_NUMBER over "
    "(customer, part) ordered by (orderdate, orderkey, linenumber), "
    "a unique total order. One big-big shuffle join lineitem x "
    "orders on the order key (co-partitioned lineage in a bucketed "
    "warehouse), one (cust, part) window shuffle, then the part "
    "dim joins BROADCAST onto the flagged lines and the rollup "
    "contracts to |brands| rows with the share in basis points.",
    tags=("tpch", "join", "window", "agg"),
)
def q231(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    w = Window.partitionBy("o_custkey", "l_partkey").orderBy(
        "o_orderdate", "l_orderkey", "l_linenumber"
    )
    flagged = j.select(
        "l_partkey", F.row_number().over(w).alias("rn")
    )
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    g = (
        flagged.join(
            F.broadcast(p), flagged.l_partkey == p.p_partkey
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("rn") > 1, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_repeat"),
        )
    )
    return g.select(
        "p_brand",
        "n_lines",
        "n_repeat",
        F.expr("n_repeat * 10000 div n_lines").alias("repeat_bp"),
    ).orderBy("p_brand")


@declare(
    "q232_gap_survival",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, {_SEC_SQL} AS sec, event_type
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IS NOT NULL),
    g AS (
        SELECT event_type,
               (LEAD(sec) OVER (PARTITION BY user_id, event_type
                                ORDER BY sec, event_id) - sec)
                   // 86400 AS gap_days
        FROM e),
    c AS (
        SELECT event_type, gap_days, CAST(COUNT(*) AS BIGINT) AS c
        FROM g WHERE gap_days IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT CAST(v AS BIGINT) AS t_days
          FROM (VALUES (1), (7), (14), (28)) AS tv(v)),
    j AS (
        SELECT event_type, t_days,
               CAST(SUM(c) AS BIGINT) AS n_gaps,
               CAST(SUM(CASE WHEN gap_days >= t_days THEN c ELSE 0 END)
                   AS BIGINT) AS n_survive
        FROM c CROSS JOIN t GROUP BY 1, 2)
    SELECT event_type, t_days, n_gaps, n_survive,
           CAST(n_survive * 10000 // n_gaps AS BIGINT) AS surviving_bp
    FROM j ORDER BY event_type, t_days
    """,
    doc="Time-to-next-event survival curve per event type: gaps "
    "between consecutive same-type events of a user (unique "
    "event_id tie-break), bucketed to whole days (truncating "
    "div 86400 on non-negative gaps, identical on both engines); "
    "S(t) = share of gaps surviving past t in {{1, 7, 14, 28}} days, "
    "in basis points. The survival read rides the BOUNDED (type, "
    "gap_days) contraction crossed with the 4-row threshold frame — "
    "the raw gap rows are aggregated exactly once, so adding "
    "thresholds costs |types| x |gaps-grid| x 4, never another "
    "corpus pass. The churn-model primitive behind 'how long until "
    "they do it again'.",
    tags=("events", "window", "stats"),
)
def q232(spark: SparkSession, sf: str) -> DataFrame:
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
            F.expr(_SEC).alias("sec"),
            "event_type",
        )
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "sec", "event_id"
    )
    gaps = e.select(
        "event_type",
        F.expr(
            "(LEAD(sec) OVER (PARTITION BY user_id, event_type "
            "ORDER BY sec, event_id) - sec) div 86400"
        ).alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    c = gaps.groupBy("event_type", "gap_days").agg(
        F.count(F.lit(1)).alias("c")
    )
    # JVM VALUES relation, not createDataFrame: a Python-list frame
    # scans as a pickled ExistingRDD through Python workers (the q206
    # report-assembly trap); VALUES folds to a LocalRelation
    thr = spark.sql(
        "SELECT CAST(t_days AS BIGINT) AS t_days "
        "FROM VALUES (1), (7), (14), (28) AS t(t_days)"
    )
    j = (
        c.crossJoin(F.broadcast(thr))
        .groupBy("event_type", "t_days")
        .agg(
            F.sum("c").alias("n_gaps"),
            F.sum(
                F.when(
                    F.col("gap_days") >= F.col("t_days"), F.col("c")
                ).otherwise(F.lit(0))
            ).alias("n_survive"),
        )
    )
    return j.select(
        "event_type",
        "t_days",
        "n_gaps",
        "n_survive",
        F.expr("n_survive * 10000 div n_gaps").alias("surviving_bp"),
    ).orderBy("event_type", "t_days")


@declare(
    "q233_pareto_coverage",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1),
    seg AS (
        SELECT c.c_mktsegment AS segment, r.cents
        FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey),
    grid AS (
        SELECT segment, cents, CAST(COUNT(*) AS BIGINT) AS c
        FROM seg GROUP BY 1, 2),
    cum AS (
        SELECT segment, cents, c,
               SUM(cents * c) OVER (PARTITION BY segment
                                    ORDER BY cents DESC) AS cum_rev,
               SUM(c) OVER (PARTITION BY segment
                            ORDER BY cents DESC) AS cum_cnt,
               SUM(cents * c) OVER (PARTITION BY segment) AS tot_rev,
               SUM(c) OVER (PARTITION BY segment) AS tot_cnt
        FROM grid),
    sel AS (
        SELECT segment, tot_cnt, tot_rev,
               cum_cnt - c
               + (4 * tot_rev - 5 * (cum_rev - cents * c)
                  + 5 * cents - 1) // (5 * cents) AS n_top80
        FROM cum
        WHERE 5 * (cum_rev - cents * c) < 4 * tot_rev
          AND 5 * cum_rev >= 4 * tot_rev)
    SELECT segment,
           CAST(tot_cnt AS BIGINT) AS n_customers,
           CAST(tot_rev AS BIGINT) AS total_cents,
           CAST(n_top80 AS BIGINT) AS n_top80,
           CAST(n_top80 * 10000 // tot_cnt AS BIGINT) AS top80_bp
    FROM sel ORDER BY segment
    """,
    doc="Pareto revenue coverage per market segment: the exact "
    "minimum number of customers whose (descending) revenues cover "
    ">= 80% of the segment's total, and that count's share of the "
    "segment in basis points — 'how top-heavy is each segment'. "
    "All integer: per-customer exact cents, the cumulative selector "
    "over the (segment, cents) value grid (the q222/q148 family — "
    "never a global row_number over customers), and the partial "
    "take within the boundary value row as an exact ceiling "
    "division (all operands positive, so // == div == floor+1 "
    "semantics match across engines). The boundary row is unique "
    "by construction: the first value (descending) whose cumulative "
    "revenue crosses 4/5 of the total. Output is |segments| rows.",
    tags=("tpch", "agg", "stats"),
)
def q233(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("order_cents"),
    )
    rev = o.groupBy("o_custkey").agg(
        F.sum("order_cents").alias("cents")
    )
    c = load(spark, sf, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    seg = rev.join(c, rev.o_custkey == c.c_custkey).select(
        "segment", "cents"
    )
    grid = seg.groupBy("segment", "cents").agg(
        F.count(F.lit(1)).alias("c")
    )
    wd = Window.partitionBy("segment").orderBy(F.col("cents").desc())
    wa = Window.partitionBy("segment")
    cum = grid.select(
        "segment",
        "cents",
        "c",
        F.sum(F.col("cents") * F.col("c")).over(wd).alias("cum_rev"),
        F.sum("c").over(wd).alias("cum_cnt"),
        F.sum(F.col("cents") * F.col("c")).over(wa).alias("tot_rev"),
        F.sum("c").over(wa).alias("tot_cnt"),
    )
    sel = cum.filter(
        (5 * (F.col("cum_rev") - F.col("cents") * F.col("c")) < 4 * F.col("tot_rev"))
        & (5 * F.col("cum_rev") >= 4 * F.col("tot_rev"))
    ).select(
        "segment",
        "tot_cnt",
        "tot_rev",
        F.expr(
            "cum_cnt - c + (4 * tot_rev - 5 * (cum_rev - cents * c) "
            "+ 5 * cents - 1) div (5 * cents)"
        ).alias("n_top80"),
    )
    return sel.select(
        "segment",
        F.col("tot_cnt").alias("n_customers"),
        F.col("tot_rev").alias("total_cents"),
        "n_top80",
        F.expr("n_top80 * 10000 div tot_cnt").alias("top80_bp"),
    ).orderBy("segment")


_DAY = "CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)"
_DAY_SQL = "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)"


@declare(
    "q235_change_point",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, {_DAY_SQL} AS day_i,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                   AS BIGINT)) // 100 AS BIGINT) AS x
        FROM events
        WHERE event_type IS NOT NULL AND ts IS NOT NULL
          AND value IS NOT NULL
        GROUP BY 1, 2),
    pre AS (
        SELECT event_type, day_i, x,
               ROW_NUMBER() OVER w AS j,
               SUM(x) OVER w AS sl,
               SUM(x) OVER (PARTITION BY event_type) AS s,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day_i)),
    keyed AS (
        SELECT event_type, day_i, j, n, sl, s - sl AS sr,
               ((sl * sl * (n - j) + (s - sl) * (s - sl) * j) * 1000)
                   // (j * (n - j)) AS k
        FROM pre WHERE j < n),
    best AS (
        SELECT event_type, day_i, j, n, sl, sr,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY k DESC, day_i) AS rn
        FROM keyed)
    SELECT event_type,
           CAST(day_i AS BIGINT) AS split_day,
           CAST(n AS BIGINT) AS n_days,
           CAST(sl // j AS BIGINT) AS pre_mean_dollars,
           CAST(sr // (n - j) AS BIGINT) AS post_mean_dollars,
           CAST(sr // (n - j) - sl // j AS BIGINT) AS shift_dollars
    FROM best WHERE rn = 1 ORDER BY event_type
    """,
    doc="Single change-point detection per event type (binary "
    "segmentation, one split): over the daily whole-dollar value "
    "series, pick the split day maximizing the between-segment "
    "variance SL^2/j + SR^2/(n-j) — equivalent to minimizing "
    "two-segment SSE since total SS is fixed. All integer: the "
    "objective is compared through the quantized key "
    "(N_j * 1000) div (j * (n - j)) with N_j = SL^2*(n-j) + SR^2*j "
    "— both engines compute the identical quantized key, so the "
    "argmax (ties -> earliest day) is deterministic; magnitudes "
    "bounded by (series-total dollars)^2 * n_days * 1000 (lift to "
    "DECIMAL(38,0) for corpora beyond ~10^5 daily dollars x 1000 "
    "days). ONE corpus aggregation contracts events to the bounded "
    "(type, day) series; prefix sums, the key, and the argmax are "
    "windows riding that contraction on a single partitioning. "
    "Types with a single active day have no valid split and drop "
    "out (j < n). The 'did the metric level-shift, and when' "
    "monitor behind alerting — complementary to q179's CUSUM "
    "(sequential drift detection over VOLUME): q235 is the "
    "offline globally-optimal single split over VALUE.",
    tags=("events", "window", "stats"),
)
def q235(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.events import change_point_from_daily

    e = load(spark, sf, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    daily = e.groupBy(
        "event_type", F.expr(_DAY).alias("day_i")
    ).agg(
        F.expr(
            "SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) "
            "div 100"
        ).alias("x")
    )
    return (
        change_point_from_daily(daily, "event_type", "day_i", "x")
        .select(
            "event_type",
            "split_day",
            "n_days",
            F.col("pre_mean").alias("pre_mean_dollars"),
            F.col("post_mean").alias("post_mean_dollars"),
            F.col("shift").alias("shift_dollars"),
        )
        .orderBy("event_type")
    )


@declare(
    "q236_source_length_shift",
    oracle="""
    WITH d AS (
        SELECT source, CAST(n_chars AS BIGINT) AS v
        FROM documents
        WHERE source IS NOT NULL AND n_chars IS NOT NULL),
    grid AS (
        SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM d GROUP BY 1, 2),
    srcs AS (SELECT DISTINCT source FROM grid),
    vals AS (SELECT DISTINCT v FROM grid),
    dense AS (
        SELECT s.source, va.v, COALESCE(g.c, 0) AS c
        FROM srcs s CROSS JOIN vals va
        LEFT JOIN grid g ON g.source = s.source AND g.v = va.v),
    cums AS (
        SELECT source, v, c,
               SUM(c) OVER (PARTITION BY source ORDER BY v) - c
                   AS below
        FROM dense),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
            FROM grid GROUP BY 1),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(SUM(a.c * (2 * b.below + b.c)) AS BIGINT) AS u2
        FROM grid a
        JOIN cums b ON a.v = b.v AND a.source <> b.source
        GROUP BY 1, 2)
    SELECT p.source_a, p.source_b,
           ta.n AS n_a, tb.n AS n_b, p.u2,
           CAST(p.u2 * 10000 // (2 * ta.n * tb.n) AS BIGINT)
               AS cles_bp
    FROM pairs p
    JOIN tot ta ON p.source_a = ta.source
    JOIN tot tb ON p.source_b = tb.source
    ORDER BY source_a, source_b
    """,
    doc="Mann-Whitney U / common-language effect size between every "
    "ordered source pair over document length: 2*U_ab = sum over "
    "values of c_a(v) * (2 * count_b_below(v) + c_b(v)) — the exact "
    "tie-corrected rank-sum statistic kept integral by doubling "
    "(ties contribute half wins), and CLES = U / (n_a * n_b) in "
    "basis points: P(random a-doc longer than random b-doc, ties "
    "half). The nonparametric 'is this source's length distribution "
    "shifted vs that one' audit — robust where q158's L1 needs "
    "binning and mean tests need moments (q175's AUC is the "
    "binary-labels special case of the same rank statistic; this "
    "is the all-pairs two-sample matrix over a value grid). Scale shape: documents "
    "contract to the (source, n_chars) value grid in ONE pass; the "
    "dense per-source cumulative rides a |sources| x |values| "
    "crossed frame (bounded: sources are enum-small, lengths "
    "bounded); the pair join is value-grid x dense on the value "
    "key — never a document-level pair join. Sanity identity: "
    "u2(a,b) + u2(b,a) = 2 * n_a * n_b. Magnitude bound: u2 * 1e4 "
    "needs n_a * n_b < ~4.6e14 — lift to DECIMAL(38,0) beyond "
    "~2e7 docs per source.",
    tags=("text", "stats"),
)
def q236(spark: SparkSession, sf: str) -> DataFrame:
    d = (
        load(spark, sf, "documents")
        .filter(F.col("source").isNotNull() & F.col("n_chars").isNotNull())
        .select("source", F.col("n_chars").cast("bigint").alias("v"))
    )
    grid = d.groupBy("source", "v").agg(F.count(F.lit(1)).alias("c"))
    # Every downstream branch is an aggregate OVER grid (never a bare
    # .distinct(), which collapses straight onto the scan — trap 15b)
    # and the otherwise-prunable marker columns are 0-weighted into
    # the dense count so the shared subtree stays canonically
    # identical (trap 12) — one documents scan, grid's exchange
    # reused by every consumer.
    tot = grid.groupBy("source").agg(F.sum("c").alias("n"))
    vgrid = grid.groupBy("v").agg(F.sum("c").alias("vn"))
    dense = (
        tot.crossJoin(vgrid)
        .join(grid, ["source", "v"], "left")
        .select(
            "source",
            "v",
            "n",
            (
                F.coalesce(F.col("c"), F.lit(0)) + F.lit(0) * F.col("vn")
            ).alias("c"),
        )
    )
    wc = Window.partitionBy("source").orderBy("v")
    cums = dense.select(
        F.col("source").alias("source_b"),
        "v",
        F.col("n").alias("n_b"),
        F.col("c").alias("cb"),
        (F.sum("c").over(wc) - F.col("c")).alias("below"),
    )
    a = grid.select(
        F.col("source").alias("source_a"),
        "v",
        F.col("c").alias("ca"),
    )
    pairs = (
        a.join(
            cums,
            (a.v == cums.v) & (a.source_a != cums.source_b),
        )
        .groupBy("source_a", "source_b", "n_b")
        .agg(
            F.sum(
                F.col("ca") * (2 * F.col("below") + F.col("cb"))
            ).alias("u2")
        )
    )
    ta = tot.select(
        F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "u2",
            F.expr("u2 * 10000 div (2 * n_a * n_b)").alias("cles_bp"),
        )
        .orderBy("source_a", "source_b")
    )


@declare(
    "q237_daily_coverage",
    oracle=f"""
    WITH {_SPAN_GRID_SQL},
    r AS (
        SELECT day_i, starts,
               SUM(dsum) OVER (PARTITION BY day_i ORDER BY sec) AS run,
               LEAD(sec) OVER (PARTITION BY day_i ORDER BY sec) - sec
                   AS seg
        FROM g)
    SELECT CAST(day_i AS BIGINT) AS day_i,
           CAST(SUM(starts) AS BIGINT) AS n_sessions,
           CAST(COALESCE(SUM(CASE WHEN run > 0 THEN seg END), 0)
               AS BIGINT) AS busy_seconds,
           CAST(COALESCE(SUM(CASE WHEN run > 0 THEN seg END), 0)
               * 10000 // 86400 AS BIGINT) AS coverage_bp
    FROM r GROUP BY 1 ORDER BY day_i
    """,
    doc="Daily busy-time coverage: the union length of all session "
    "intervals per day — 'how many seconds of the day had at least "
    "one active session', with its share of the day in basis "
    "points. Interval-union length is the sweep-line's other "
    "classic read: on q230's day-clipped +1/-1 delta grid, a "
    "positive running count means COVERED, so coverage is the sum "
    "of inter-grid-point segment lengths where the prefix sum is "
    "positive (overlapping sessions counted once — unlike summed "
    "durations, which double-count). The LEAD and the running sum "
    "share the grid's one total order (distinct seconds after the "
    "delta aggregation), and the per-day partitioning distributes "
    "exactly as q230's. The last grid point of each day always "
    "carries a zero running count (every clipped span closes "
    "in-day), so its NULL LEAD never meets run > 0.",
    tags=("events", "window", "agg"),
)
def q237(spark: SparkSession, sf: str) -> DataFrame:
    g = _session_delta_grid(spark, sf)
    wg = Window.partitionBy("day_i").orderBy("sec")
    r = g.select(
        "day_i",
        "starts",
        F.sum("dsum").over(wg).alias("run"),
        (F.lead("sec").over(wg) - F.col("sec")).alias("seg"),
    )
    return (
        r.groupBy("day_i")
        .agg(
            F.sum("starts").alias("n_sessions"),
            F.coalesce(
                F.sum(F.when(F.col("run") > 0, F.col("seg"))), F.lit(0)
            ).alias("busy_seconds"),
        )
        .select(
            "day_i",
            "n_sessions",
            "busy_seconds",
            F.expr("busy_seconds * 10000 div 86400").alias("coverage_bp"),
        )
        .orderBy("day_i")
    )


@declare(
    "q238_co_spike_matrix",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, {_DAY_SQL} AS day_i,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events
        WHERE event_type IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2),
    med AS (
        SELECT event_type, MIN(cnt) AS med
        FROM (
            SELECT event_type, cnt,
                   SUM(c) OVER (PARTITION BY event_type
                                ORDER BY cnt) AS cum,
                   SUM(c) OVER (PARTITION BY event_type) AS n
            FROM (SELECT event_type, cnt, COUNT(*) AS c
                  FROM daily GROUP BY 1, 2))
        WHERE cum * 2 >= n GROUP BY 1),
    spikes AS (
        SELECT d.event_type, d.day_i
        FROM daily d JOIN med m USING (event_type)
        WHERE d.cnt > 2 * m.med),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_co
        FROM spikes a JOIN spikes b
          ON a.day_i = b.day_i AND a.event_type < b.event_type
        GROUP BY 1, 2),
    per AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM spikes GROUP BY 1)
    SELECT p.type_a, p.type_b, pa.n AS n_a, pb.n AS n_b, p.n_co,
           CAST(p.n_co * 10000 // LEAST(pa.n, pb.n) AS BIGINT)
               AS co_bp
    FROM pairs p
    JOIN per pa ON p.type_a = pa.event_type
    JOIN per pb ON p.type_b = pb.event_type
    ORDER BY type_a, type_b
    """,
    doc="Co-spike incident matrix: a day is a SPIKE for an event "
    "type when its daily volume exceeds 2x that type's overall "
    "median daily volume (exact lower median via the cumulative "
    "selector over the bounded (type, count) grid); for every type "
    "pair, how many days spiked TOGETHER, with the overlap share of "
    "the rarer type's spikes in basis points — 'when checkout "
    "errors spike, do refunds spike the same day' incident "
    "correlation. The pair join runs over SPIKE DAYS only (a "
    "contraction of the contraction), bounded by |types| x "
    "|spike days|; output pairs with zero co-occurrence don't "
    "appear (sparse matrix semantics, documented). Complements "
    "q200 (per-type trailing-baseline spikes) and q213 (full daily "
    "cross-correlation): q238 reads tail-event ALIGNMENT, not "
    "series correlation.",
    tags=("events", "stats", "audit"),
)
def q238(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    # day_i non-nullable via coalesce (ts is filtered NOT NULL, so
    # the sentinel never fires): the pairs self-join would otherwise
    # infer isnotnull(day_i) into a and b but not into `per`,
    # de-canonicalizing spikes' third consumer into a second events
    # scan (trap 5 / the q100 family)
    daily = e.groupBy(
        "event_type", F.expr(f"coalesce({_DAY}, -1)").alias("day_i")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    grid = daily.groupBy("event_type", "cnt").agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = Window.partitionBy("event_type").orderBy("cnt")
    wa = Window.partitionBy("event_type")
    med = (
        grid.select(
            "event_type",
            "cnt",
            F.sum("c").over(wc).alias("cum"),
            F.sum("c").over(wa).alias("n"),
        )
        .filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("cnt").alias("med"))
    )
    spikes = daily.join(F.broadcast(med), "event_type").filter(
        F.col("cnt") > 2 * F.col("med")
    ).select("event_type", "day_i")
    a = spikes.select(
        F.col("event_type").alias("type_a"), "day_i"
    )
    b = spikes.select(
        F.col("event_type").alias("type_b"), "day_i"
    )
    pairs = (
        a.join(b, ["day_i"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    per = spikes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    pa = per.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    pb = per.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_co",
            F.expr("n_co * 10000 div least(n_a, n_b)").alias("co_bp"),
        )
        .orderBy("type_a", "type_b")
    )


@declare(
    "q239_supplier_price_spread",
    oracle="""
    WITH unit AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                   * 100 AS BIGINT)) * 1000
                   // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS unit_mcents
        FROM lineitem GROUP BY 1, 2),
    per_part AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               MAX(unit_mcents) - MIN(unit_mcents) AS spread
        FROM unit GROUP BY 1),
    multi AS (
        SELECT p.p_brand, pp.spread
        FROM per_part pp JOIN part p ON pp.l_partkey = p.p_partkey
        WHERE pp.n_suppliers >= 2)
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(spread) // COUNT(*) AS BIGINT)
               AS mean_spread_mcents,
           CAST(MAX(spread) AS BIGINT) AS max_spread_mcents
    FROM multi GROUP BY 1 ORDER BY p_brand
    """,
    doc="Procurement price-spread audit per brand: for every part "
    "traded by 2+ suppliers, the spread between the cheapest and "
    "dearest supplier's effective unit price — exact integer "
    "milli-cents via total_cents * 1000 div total_units per "
    "(part, supplier), no float division anywhere (a DOUBLE "
    "price/quantity ratio would be summation-order-dependent and "
    "never hash). Per brand: the multi-sourced part count, the "
    "floor-mean spread, and the worst spread — 'where is "
    "renegotiation worth it'. Shape: lineitem contracts to (part, "
    "supplier) in one partial-agg'd pass, then to |parts|, then the "
    "part dim broadcasts; single-sourced parts (no spread to "
    "measure) drop out, so brands with none vanish (sparse "
    "semantics). Complements q220 (volume concentration) with the "
    "PRICE dispersion read on the same derived partsupp relation.",
    tags=("tpch", "agg", "audit"),
)
def q239(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("cents"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("qty"),
    )
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.expr("SUM(cents) * 1000 div SUM(qty)").alias("unit_mcents")
    )
    per_part = unit.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        (F.max("unit_mcents") - F.min("unit_mcents")).alias("spread"),
    )
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    multi = per_part.filter(F.col("n_suppliers") >= 2).join(
        F.broadcast(p), per_part.l_partkey == p.p_partkey
    )
    return (
        multi.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("spread").alias("_sum_spread"),
            F.max("spread").alias("max_spread_mcents"),
        )
        .select(
            "p_brand",
            "n_parts",
            F.expr("_sum_spread div n_parts").alias("mean_spread_mcents"),
            "max_spread_mcents",
        )
        .orderBy("p_brand")
    )


@declare(
    "q240_stale_parts",
    oracle="""
    WITH last_ship AS (
        SELECT l_partkey,
               MAX(CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                   AS BIGINT)) AS last_day
        FROM lineitem GROUP BY 1),
    horizon AS (SELECT MAX(last_day) AS max_day FROM last_ship),
    flagged AS (
        SELECT p.p_brand,
               CASE WHEN ls.last_day < h.max_day - 90
                    THEN 1 ELSE 0 END AS stale
        FROM last_ship ls
        JOIN part p ON ls.l_partkey = p.p_partkey
        CROSS JOIN horizon h)
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(stale) AS BIGINT) AS n_stale,
           CAST(SUM(stale) * 10000 // COUNT(*) AS BIGINT) AS stale_bp
    FROM flagged GROUP BY 1 ORDER BY p_brand
    """,
    doc="Stale-part audit per brand: a traded part is STALE when its "
    "last shipment is more than 90 days before the newest shipment "
    "anywhere in the fact table (the data-defined horizon — no wall "
    "clock, so the answer is reproducible on a frozen fixture). Per "
    "brand: traded-part count, stale count, stale share in basis "
    "points — the dead-inventory signal behind assortment pruning. "
    "Shape: lineitem contracts to one (part, last_day) row per "
    "part, the 1-row horizon broadcasts into the flagging (a "
    "broadcast nested loop of ONE row — not a real cross join), "
    "the part dim broadcasts, rollup is |brands| rows. Parts never "
    "traded don't appear (no lineitem row — documented sparse "
    "semantics; q130's important-stock family covers the "
    "never-traded read).",
    tags=("tpch", "agg", "audit"),
)
def q240(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").select(
        "l_partkey",
        F.expr("CAST(unix_date(CAST(l_shipdate AS DATE)) AS BIGINT)").alias(
            "ship_day"
        ),
    )
    last_ship = li.groupBy("l_partkey").agg(
        F.max("ship_day").alias("last_day")
    )
    horizon = last_ship.agg(F.max("last_day").alias("max_day"))
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    # eqNullSafe: a plain equi-join infers isnotnull(l_partkey) into
    # THIS branch of the last_ship diamond only, de-canonicalizing
    # the horizon branch into a second lineitem scan (trap 12)
    flagged = (
        last_ship.join(
            F.broadcast(p), last_ship.l_partkey.eqNullSafe(p.p_partkey)
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "p_brand",
            F.when(
                F.col("last_day") < F.col("max_day") - 90, F.lit(1)
            ).otherwise(F.lit(0)).alias("stale"),
        )
    )
    return (
        flagged.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("stale").alias("n_stale"),
        )
        .select(
            "p_brand",
            "n_parts",
            "n_stale",
            F.expr("n_stale * 10000 div n_parts").alias("stale_bp"),
        )
        .orderBy("p_brand")
    )
