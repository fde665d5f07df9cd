"""Declared dedup / sessionization / text queries Q29-Q33 (SURVEY §2B).

Batch analogs of the streaming operators plus the first slice of the
LLM-data-pipeline surface (text stats, exact text dedup). The
approximate operators (MinHash LSH, cosine ANN) live in
``kaflow_spark.operators`` and are declared separately (rows-only
checks) because they are not oracle-hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kaflow_spark.catalog import load
from kaflow_spark.queries.base import declare


@declare(
    "q29_dedup_groupmin",
    oracle="""
    SELECT user_id, event_type, MIN(event_id) AS first_event FROM events
    GROUP BY user_id, event_type ORDER BY user_id, event_type
    """,
    doc="Deterministic exact dedup: keep-first-by-key as group-min "
    "(dropDuplicates is order-nondeterministic under shuffle; this "
    "is the scale-safe declared form).",
    tags=("dedup",),
)
def q29(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event"))
        .orderBy("user_id", "event_type")
    )


@declare(
    "q30_tumbling_window_batch",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS h, event_type, COUNT(*) AS n FROM events
    GROUP BY DATE_TRUNC('hour', ts), event_type ORDER BY h, event_type
    """,
    doc="Tumbling-window batch analog (streaming twin: window(ts,'1 hour') "
    "in kaflow_spark.streaming.windows).",
    tags=("window-agg",),
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("h", "event_type")
    )



def _sessionized(df, gap_s: int = 30 * 60, extra_cols: tuple[str, ...] = ()):
    """Gaps-and-islands sessionization shared by q31 and q125: assign a
    per-user session index with a ``gap_s``-second inactivity gap; the
    (ts, event_id) order with the unique event_id tie-break is the
    determinism contract both queries' oracles state."""
    order_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(order_w)
    return df.select(
        "user_id",
        "ts",
        "event_id",
        *extra_cols,
        F.when(gap > gap_s, 1).otherwise(0).alias("new_s"),
    ).withColumn("sess", F.sum("new_s").over(run_w))


@declare(
    "q31_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        FROM events),
    numbered AS (
        SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
        FROM flagged)
    SELECT user_id, sess, COUNT(*) AS n, MIN(event_id) AS first_e
    FROM numbered GROUP BY user_id, sess ORDER BY user_id, sess
    """,
    doc="Sessionization (30-min gap) via gaps-and-islands: lag + "
    "running sum + group. One shuffle on user_id reused by both "
    "windows and the final aggregation (same partition key). "
    "Streaming twin: session_window(ts, '30 minutes').",
    tags=("dedup", "window-agg"),
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _sessionized(load(spark, sf, "events"))
        .groupBy("user_id", "sess")
        .agg(F.count(F.lit(1)).alias("n"), F.min("event_id").alias("first_e"))
        .orderBy("user_id", "sess")
    )


@declare(
    "q46_sliding_window_batch",
    oracle="""
    WITH ev AS (
        SELECT (epoch_us(ts) // 1800000000) * 1800 AS b FROM events),
    grid AS (SELECT b AS s FROM ev UNION ALL SELECT b - 1800 AS s FROM ev)
    SELECT make_timestamp(s * 1000000) AS window_start, COUNT(*) AS n
    FROM grid GROUP BY s ORDER BY window_start
    """,
    doc="Sliding-window batch analog via the native window(ts, '1 hour',"
    " '30 minutes') operator (each event lands in 2 windows); the "
    "oracle states the same grid arithmetic explicitly.",
    tags=("window-agg",),
)
def q46(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "n")
        .orderBy("window_start")
    )


_GROUPING_SETS_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g1,
           CAST(GROUPING(o_orderpriority) AS INT) AS g2,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@declare(
    "q47_grouping_sets",
    oracle=_GROUPING_SETS_SQL,
    doc="Explicit GROUPING SETS (beyond rollup/cube shapes of q15/q16).",
    tags=("agg",),
)
def q47(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


@declare(
    "q32_text_stats",
    oracle="""
    SELECT doc_id, CAST(LENGTH(text) AS INT) AS nch,
           CAST(len(string_split(text, ' ')) AS INT) AS ntok
    FROM documents ORDER BY doc_id
    """,
    doc="Text stats: char length + whitespace token count, all JVM-side.",
    tags=("text",),
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            F.length("text").cast("int").alias("nch"),
            F.size(F.split(F.col("text"), " ", -1)).cast("int").alias("ntok"),
        )
        .orderBy("doc_id")
    )


@declare(
    "q33_exact_text_dup",
    oracle="""
    SELECT MD5(text) AS h, COUNT(*) AS n, MIN(doc_id) AS keeper FROM documents
    GROUP BY MD5(text) HAVING COUNT(*) > 1 ORDER BY h
    """,
    doc="Exact duplicate-text groups by content hash; the aggregation "
    "keys on the 32-byte digest, not the document body, so the "
    "shuffle moves hashes, not texts.",
    tags=("dedup", "text"),
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n") > 1)
        .orderBy("h")
    )


@declare(
    "q93_retention_cohorts",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
    coh AS (SELECT u, MIN(d) AS cohort_day FROM days GROUP BY u)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, d) AS BIGINT) AS offset_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM days JOIN coh USING (u)
    GROUP BY cohort_day, offset_days
    ORDER BY cohort_day, offset_days
    """,
    doc="Retention cohort matrix: users cohorted by first active day; "
    "per (cohort_day, offset_days) the count still active. Events "
    "collapse to partial-agg'd DISTINCT (user, day) pairs before "
    "anything shuffles, so cost tracks users x days, not event "
    "volume; output is cohorts x horizon — dashboard-sized.",
    tags=("events",),
)
def q93(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.events import retention_cohorts

    e = load(spark, sf, "events")
    return retention_cohorts(e, "user_id", "ts").orderBy(
        "cohort_day", "offset_days"
    )


@declare(
    "q94_transition_matrix",
    oracle="""
    WITH p AS (
        SELECT event_type AS next_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events),
    c AS (SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM p WHERE prev_type IS NOT NULL
          GROUP BY prev_type, next_type)
    SELECT prev_type, next_type, n,
           (n * 10000) // CAST(SUM(n) OVER (PARTITION BY prev_type)
                               AS BIGINT) AS p_bp
    FROM c ORDER BY prev_type, next_type
    """,
    doc="First-order Markov transition matrix over each user's event "
    "timeline (lag ordered by ts with event_id tie-break — q19's "
    "proven discipline). ONE shuffle on user_id; the matrix and its "
    "per-prev_type shares run over |event types|^2 rows. p_bp is "
    "exact integer division — no float drift.",
    tags=("events", "window"),
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.events import transition_counts

    e = load(spark, sf, "events")
    return transition_counts(
        e, "user_id", "ts", "event_type", "event_id"
    ).orderBy("prev_type", "next_type")


@declare(
    "q121_ohlc_bars",
    oracle="""
    WITH w AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS hour, value,
               row_number() OVER (PARTITION BY event_type, DATE_TRUNC('hour', ts)
                                  ORDER BY ts, event_id) AS ra,
               row_number() OVER (PARTITION BY event_type, DATE_TRUNC('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rd
        FROM events)
    SELECT event_type, hour,
           MAX(CASE WHEN ra = 1 THEN value END) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           MAX(CASE WHEN rd = 1 THEN value END) AS close_v,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM w GROUP BY event_type, hour ORDER BY event_type, hour
    """,
    doc="OHLC resampling bars per (event_type, hour): open/close are "
    "the values at the earliest/latest (ts, event_id) — event_id is "
    "the unique tie-break, so first/last are deterministic; high/low "
    "are plain min/max (exact, no float summation anywhere). Spark "
    "side is a SINGLE partial-agg'd groupBy using max_by/min_by keyed "
    "on struct(ts, event_id) (structs compare lexicographically), so "
    "the shuffle carries |event_type x hour| aggregate rows — no "
    "window, no per-row shuffle. The oracle states the same pick via "
    "row_number, the portable formulation. Streaming twin: the same "
    "aggs run under window(ts, '1 hour') in append mode.",
    tags=("window-agg", "events"),
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "ts",
        "event_id",
        "value",
    )
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("event_type", "hour")
        .agg(
            F.min_by("value", key).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max_by("value", key).alias("close_v"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .orderBy("event_type", "hour")
    )


@declare(
    "q125_session_paths",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        FROM events),
    n AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess
          FROM o),
    r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess
                                       ORDER BY ts, event_id) AS rn
          FROM n),
    p AS (SELECT user_id, sess,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= 8 GROUP BY user_id, sess)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path ORDER BY n_sessions DESC, path
    """,
    doc="Session path analysis: the frequency table of ordered "
    "event-type sequences (first 8 events per 30-min-gap session) — "
    "the classic path/funnel report, and the export shape sequence-"
    "model training data takes (q94's transition matrix is its bigram "
    "marginal). Sessionization reuses q31's gaps-and-islands windows "
    "(one shuffle on user_id); the per-session path assembles from "
    "sort_array(collect_list(struct(rn, type))) so the agg stays "
    "partial-aggregable and order-insensitive to shuffle; the final "
    "count groups the (tiny) distinct-path table. event_id is the "
    "unique tie-break throughout.",
    tags=("events", "window-agg"),
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    sess_w = W.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    sessed = (
        _sessionized(load(spark, sf, "events"), extra_cols=("event_type",))
        .withColumn("rn", F.row_number().over(sess_w))
        .filter(F.col("rn") <= 8)
    )
    paths = sessed.groupBy("user_id", "sess").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
    )


@declare(
    "q131_value_trend_ols",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS x,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL),
    agg AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM s GROUP BY event_type)
    SELECT event_type, n,
           CASE WHEN n * sxx - sx * sx <> 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_cents_per_day
    FROM agg
    ORDER BY event_type
    """,
    doc="Per-type OLS value trend ('is checkout value drifting?'). "
    "The five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are exact "
    "integers — x in whole days, y in cents — so the single "
    "partial-agg'd groupBy is shuffle-order-independent, and the "
    "closed-form slope is ONE IEEE division of two exactly-computed "
    "integer operands (bit-identical across engines; no libm, no "
    "running-mean float state). Shuffle = |event types| rows of five "
    "bigint sums. Degenerate x spread emits NULL, not a crash.",
    tags=("agg", "events", "stats"),
)
def q131(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.events import value_trend

    e = load(spark, sf, "events")
    return value_trend(e, "event_type").orderBy("event_type")


@declare(
    "q132_zscore_anomalies",
    oracle="""
    WITH s AS (
        SELECT event_id, event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL),
    st AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(y) AS sy, SUM(y * y) AS syy
        FROM s GROUP BY event_type)
    SELECT event_id, s.event_type, y AS value_cents
    FROM s JOIN st ON s.event_type = st.event_type
    WHERE (n * y - sy) * (n * y - sy) > 9 * (n * syy - sy * sy)
    ORDER BY event_id
    """,
    doc="Exact 3-sigma outlier report per event type. The z-test is "
    "pure integer algebra — (n·y − Σy)² > 9·(n·Σy² − Σy·Σy) in "
    "DECIMAL(38,0) cents — no square roots, no IEEE boundary to flip "
    "between engines. Plan: the narrow (id, type, cents) projection "
    "is built once behind one uniform exchange; the stats branch "
    "partial-aggs it to |types| rows broadcast back onto the row "
    "branch — ONE events scan via ReusedExchange (the projection is "
    "deliberately narrow: an extra column would let pruning "
    "de-canonicalize the diamond; asserted in test_plans).",
    tags=("events", "stats", "subquery"),
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.events import zscore_anomalies

    e = load(spark, sf, "events")
    return zscore_anomalies(e, "event_type").orderBy("event_id")


@declare(
    "q138_mad_outliers",
    oracle="""
    WITH s AS (
        SELECT event_id, event_type,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL),
    c1 AS (SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS c
           FROM s GROUP BY event_type, y),
    m1 AS (SELECT event_type, MIN(y) AS med FROM (
             SELECT event_type, y,
                    SUM(c) OVER (PARTITION BY event_type ORDER BY y
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum,
                    SUM(c) OVER (PARTITION BY event_type) AS n
             FROM c1)
           WHERE 2 * cum >= n GROUP BY event_type),
    d AS (SELECT s.event_id, s.event_type, s.y, ABS(s.y - m1.med) AS dv
          FROM s JOIN m1 USING (event_type)),
    c2 AS (SELECT event_type, dv, CAST(COUNT(*) AS BIGINT) AS c
           FROM d GROUP BY event_type, dv),
    m2 AS (SELECT event_type, MIN(dv) AS mad FROM (
             SELECT event_type, dv,
                    SUM(c) OVER (PARTITION BY event_type ORDER BY dv
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum,
                    SUM(c) OVER (PARTITION BY event_type) AS n
             FROM c2)
           WHERE 2 * cum >= n GROUP BY event_type)
    SELECT d.event_id, d.event_type, d.y AS value_cents
    FROM d JOIN m2 USING (event_type)
    WHERE d.dv > 3 * m2.mad
    ORDER BY event_id
    """,
    doc="Robust MAD outliers per event type — the quarantine rule the "
    "z-score (q132) can't provide: a few extreme values drag a mean "
    "and inflate sigma, but not a median. Both medians are exact "
    "set-selections (smallest value whose cumulative count reaches "
    "half the group — integer 2*cum >= n, never interpolation), each "
    "computed over a per-(type, cents) COUNT table bounded by the "
    "metric's distinct-cent range (corpus-size-independent for "
    "bounded metrics; bin first otherwise). The flag |y - med| > "
    "3*mad is pure bigint. Plan: one narrow (id, type, cents) "
    "projection; the two |types|-row median maps broadcast back onto "
    "it; shuffles carry count-table rows, never events.",
    tags=("events", "stats", "window"),
)
def q138(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.events import mad_outliers

    e = load(spark, sf, "events")
    return mad_outliers(e, "event_type").orderBy("event_id")


@declare(
    "q139_gapfill_locf",
    oracle="""
    WITH bars AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS hour,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM events
        WHERE event_type IS NOT NULL AND value IS NOT NULL
        GROUP BY event_type, DATE_TRUNC('hour', ts)),
    rng AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM bars),
    spine AS (
        SELECT t.event_type, h.hour
        FROM (SELECT DISTINCT event_type FROM bars) t
        CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                        AS hour FROM rng) h)
    SELECT event_type, hour,
           last_value(cents IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_cents,
           cents IS NULL AS is_gap
    FROM spine LEFT JOIN bars USING (event_type, hour)
    ORDER BY event_type, hour
    """,
    doc="Hourly gap-fill with last-observation-carried-forward — the "
    "resample step a time-series consumer runs before charting or "
    "joining ('every (type, hour) cell exists; silent hours repeat "
    "the last bar'). The spine is generated, not scanned: distinct "
    "types x an hour sequence spanning the observed range (both "
    "derived from the already-aggregated |types x hours| bar table, "
    "never from raw events rows — the fused summary costs one extra "
    "column-pruned (ts, type) scan aggregated map-side to a single "
    "row; fused because separate range/distinct branches cost a scan "
    "EACH). Fill = one last-non-null window per "
    "type over the spine — hours are unique within a type, so the "
    "frame is deterministic; bars carry exact bigint cents; leading "
    "gaps before a type's first bar stay NULL on both engines. "
    "Shuffles touch bar/spine rows only.",
    tags=("events", "window", "asof"),
)
def q139(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    bars = (
        e.filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("bigint")
            .alias("cents")
        )
    )
    # ONE summary aggregate derives the hour range AND the type set.
    # Separate min/max and distinct branches cost a scan each (three
    # events passes measured); fused, the optimizer collapses this to
    # a single extra column-pruned (ts, type) pass aggregated map-side
    # to one row — min/max/collect_set are duplicate-insensitive, so
    # it legally bypasses the bars aggregate. Two scans total: the
    # full bars pass plus this metadata-cheap one (at rest, parquet
    # min/max stats serve it; callers with known bounds can skip it
    # by passing an explicit spine). collect_set is bounded by the
    # event-type taxonomy.
    summary = bars.agg(
        F.min("hour").alias("lo"),
        F.max("hour").alias("hi"),
        F.sort_array(F.collect_set("event_type")).alias("_types"),
    )
    spine = (
        summary.select(
            F.explode("_types").alias("event_type"),
            F.sequence(
                F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR")
            ).alias("_hours"),
        )
        .select("event_type", F.explode("_hours").alias("hour"))
    )
    w = W.partitionBy("event_type").orderBy("hour").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        spine.join(bars, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.last("cents", ignorenulls=True).over(w).alias("filled_cents"),
            F.col("cents").isNull().alias("is_gap"),
        )
        .orderBy("event_type", "hour")
    )


@declare(
    "q141_scd2_intervals",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    flagged AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN prev_type IS NULL
                         OR prev_type <> event_type THEN 1 ELSE 0
               END AS chg
        FROM o),
    islands AS (
        SELECT user_id, event_type, ts,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS island
        FROM flagged),
    runs AS (
        SELECT user_id, island,
               MIN(event_type) AS event_type,
               MIN(ts) AS valid_from,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM islands GROUP BY user_id, island)
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY island) AS valid_to,
           n_events
    FROM runs
    ORDER BY user_id, valid_from
    """,
    doc="SCD Type-2 interval build: collapse each user's timeline into "
    "runs of the same event_type and emit validity intervals "
    "[valid_from, valid_to) — the slowly-changing-dimension history a "
    "warehouse keeps for point-in-time joins (valid_to NULL = current "
    "run). Pure gaps-and-islands: one lag window flags changes, a "
    "running sum numbers islands, a partial-agg'd groupBy collapses "
    "runs, and a lead window closes the intervals. Determinism: every "
    "window orders by (ts, event_id) — the unique-key tie-break "
    "discipline; island MIN(event_type) is constant within a run by "
    "construction. Scale: all three windows and the groupBy share the "
    "ONE user_id hash partitioning — a single shuffle of (user, type, "
    "ts, id) rows end-to-end, and runs-per-user is bounded by the "
    "user's own event count (no skew beyond the data's).",
    tags=("events", "window", "scd"),
)
def q141(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.events import scd2_intervals

    e = load(spark, sf, "events")
    return scd2_intervals(e, "user_id", "event_type").orderBy(
        "user_id", "valid_from"
    )


@declare(
    "q143_ordered_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id),
    n AS (SELECT (SELECT COUNT(*) FROM s1) AS n1,
                 (SELECT COUNT(*) FROM s2) AS n2,
                 (SELECT COUNT(*) FROM s3) AS n3)
    SELECT step, n_users, conv_bp FROM (
        SELECT 1 AS step, 'view' AS step_name, n1 AS n_users,
               CAST(10000 AS BIGINT) AS conv_bp FROM n
        UNION ALL
        SELECT 2, 'click', n2, (n2 * 10000) // GREATEST(n1, 1) FROM n
        UNION ALL
        SELECT 3, 'purchase', n3, (n3 * 10000) // GREATEST(n2, 1) FROM n)
    ORDER BY step
    """,
    doc="ORDERED conversion funnel (view -> click -> purchase, each "
    "step strictly after the previous one's first occurrence) — the "
    "sequence-constrained matching q87's unordered funnel can't "
    "express (a purchase BEFORE the first view must not count). "
    "Cascaded earliest-step semantics: t1 = first view; t2 = first "
    "click after t1; t3 = first purchase after t2 — each step is a "
    "per-user conditional MIN, deterministic under ties by value "
    "equality. Per-step conversion is exact integer bp. Scale: three "
    "type-pushed scans each collapse to per-user minima BEFORE "
    "joining (the join sides are one row per surviving user, "
    "co-partitioned on user_id); counts are 1-row aggregates "
    "assembled by a 3-row union — nothing wide ever moves.",
    tags=("events", "funnel", "join"),
)
def q143(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).alias("n")).withColumn("step", F.lit(1))
    n2 = s2.agg(F.count(F.lit(1)).alias("n")).withColumn("step", F.lit(2))
    n3 = s3.agg(F.count(F.lit(1)).alias("n")).withColumn("step", F.lit(3))
    from kaflow_spark.functions.textstats import int_div

    counts = (
        n1.unionAll(n2)
        .unionAll(n3)
        .groupBy()
        .pivot("step", [1, 2, 3])
        .sum("n")
        .select(
            F.col("1").alias("n1"), F.col("2").alias("n2"), F.col("3").alias("n3")
        )
    )
    one = counts.select(
        F.lit(1).alias("step"),
        F.col("n1").cast("bigint").alias("n_users"),
        F.lit(10000).cast("bigint").alias("conv_bp"),
    )
    two = counts.select(
        F.lit(2).alias("step"),
        F.col("n2").cast("bigint").alias("n_users"),
        int_div(F.col("n2") * 10000, F.greatest(F.col("n1"), F.lit(1))).alias(
            "conv_bp"
        ),
    )
    three = counts.select(
        F.lit(3).alias("step"),
        F.col("n3").cast("bigint").alias("n_users"),
        int_div(F.col("n3") * 10000, F.greatest(F.col("n2"), F.lit(1))).alias(
            "conv_bp"
        ),
    )
    return one.unionAll(two).unionAll(three).orderBy("step")


@declare(
    "q150_cohort_ltv_curve",
    oracle="""
    WITH om AS (
        SELECT o_custkey,
               CAST(EXTRACT(year FROM o_orderdate) * 12
                    + EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS cents
        FROM orders),
    coh AS (SELECT o_custkey, MIN(m) AS cm FROM om GROUP BY o_custkey),
    sz AS (SELECT cm, CAST(COUNT(*) AS BIGINT) AS n_custs
           FROM coh GROUP BY cm),
    rev AS (
        SELECT coh.cm, om.m - coh.cm AS off, SUM(om.cents) AS cents
        FROM om JOIN coh USING (o_custkey)
        GROUP BY coh.cm, om.m - coh.cm),
    cum AS (
        SELECT cm, off,
               SUM(cents) OVER (PARTITION BY cm ORDER BY off
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_cents
        FROM rev)
    SELECT cum.cm AS cohort_month, cum.off AS offset_months,
           sz.n_custs, CAST(cum.cum_cents AS BIGINT) AS cum_cents,
           CAST(cum.cum_cents // sz.n_custs AS BIGINT) AS ltv_cents
    FROM cum JOIN sz USING (cm)
    ORDER BY cohort_month, offset_months
    """,
    doc="Cohort LTV curve: customers cohorted by first-order month; "
    "per (cohort, months-since) the cumulative revenue and the "
    "per-customer lifetime value — the product-analytics deliverable "
    "that q93's retention counts feed into. Exactness: months are "
    "integer year*12+month, revenue is exact cents, the cumulative "
    "window orders by the integer offset (unique within a cohort), "
    "and ltv = truncating integer division. Scale: orders collapse "
    "to per-customer first-month (one custkey shuffle the revenue "
    "join reuses — same-key diamond), revenue partial-aggs to "
    "|cohorts x offsets| rows before the window, and cohort sizes "
    "join the windowed table, never raw orders.",
    tags=("events", "agg", "window", "join"),
)
def q150(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    om = o.filter(F.col("o_custkey").isNotNull()).select(
        "o_custkey",
        (F.year("o_orderdate").cast("bigint") * 12
         + F.month("o_orderdate").cast("bigint")).alias("m"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    coh = om.groupBy("o_custkey").agg(F.min("m").alias("cm"))
    sz = coh.groupBy("cm").agg(F.count(F.lit(1)).cast("bigint").alias("n_custs"))
    rev = (
        om.join(coh, "o_custkey")
        .groupBy("cm", (F.col("m") - F.col("cm")).alias("off"))
        .agg(F.sum("cents").alias("cents"))
    )
    w_cum = W.partitionBy("cm").orderBy("off").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = rev.select(
        "cm", "off", F.sum("cents").over(w_cum).alias("cum_cents")
    )
    return (
        cum.join(F.broadcast(sz), "cm")
        .select(
            F.col("cm").alias("cohort_month"),
            F.col("off").alias("offset_months"),
            "n_custs",
            F.col("cum_cents").cast("bigint").alias("cum_cents"),
            F.expr("cum_cents div n_custs").alias("ltv_cents"),
        )
        .orderBy("cohort_month", "offset_months")
    )


@declare(
    "q151_longest_streak",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d
        FROM events),
    isl AS (
        SELECT user_id, d,
               d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                   AS grp
        FROM days),
    runs AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len,
               MIN(d) AS start_d
        FROM isl GROUP BY user_id, grp),
    best AS (
        SELECT user_id, len, start_d,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, start_d) AS rn
        FROM runs)
    SELECT user_id, len AS streak_days,
           CAST(start_d AS BIGINT) AS start_day
    FROM best WHERE rn = 1
    ORDER BY user_id
    """,
    doc="Longest consecutive-day activity streak per user — the "
    "engagement metric behind 'N-day streak' product features, and "
    "the VALUE-based island idiom (day minus row_number is constant "
    "within a consecutive run) that complements the gap-based "
    "islands of q31/q141. Ties break to the EARLIEST streak "
    "(deterministic row_number with start_d tie-break). Days "
    "collapse to distinct (user, day) integers first — partial-agg'd "
    "like q93 — so both windows and the run groupBy ride one "
    "user_id-compatible partitioning over day-grain rows, never raw "
    "events.",
    tags=("events", "window"),
)
def q151(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    days = (
        e.select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
        )
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("d")
    runs = (
        days.withColumn("grp", F.col("d") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("len"),
            F.min("d").alias("start_d"),
        )
    )
    w_best = W.partitionBy("user_id").orderBy(F.desc("len"), "start_d")
    return (
        runs.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("streak_days"),
            F.col("start_d").cast("bigint").alias("start_day"),
        )
        .orderBy("user_id")
    )


@declare(
    "q152_interval_coverage",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts) // 1000000 AS s,
               epoch_us(ts) // 1000000
                   + CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 100
                   AS e
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL),
    flagged AS (
        SELECT user_id, s, e, event_id,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775808)
                    THEN 1 ELSE 0 END AS brk
        FROM iv),
    isl AS (
        SELECT user_id, s, e,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS grp
        FROM flagged),
    merged AS (
        SELECT user_id, grp, MIN(s) AS ms, MAX(e) AS me
        FROM isl GROUP BY user_id, grp)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(me - ms) AS BIGINT) AS covered_seconds
    FROM merged GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Overlapping-interval coalescing: treat each event as an "
    "active span [ts, ts + floor(value) seconds), merge overlaps per "
    "user, and report merged-interval counts and total covered "
    "seconds — the utilization/downtime-merging interval-algebra "
    "family (distinct from point-event islands: the break test "
    "compares each START against the RUNNING MAX of preceding ENDS, "
    "because an early long interval can swallow several later "
    "ones). Exactness: epoch seconds and cents-derived durations are "
    "pure bigint (cents div 100 truncates identically on both "
    "engines — never a raw double->bigint cast, which Spark "
    "truncates and DuckDB rounds; the second-grain timestamps use "
    "epoch_us // 1e6 for the same reason, CAST(epoch(ts)) would "
    "ROUND fractional seconds). Both windows share ONE total "
    "order (s, e, event_id) — a break flag computed under one "
    "ordering but summed under another mis-assembles islands "
    "whenever starts tie (caught at sf0.01). One user_id shuffle "
    "end-to-end.",
    tags=("events", "window"),
)
def q152(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    iv = e.filter(F.col("ts").isNotNull() & F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("s"),
        (
            F.col("ts").cast("long")
            + F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div 100"
            )
        ).alias("e"),
    )
    # ONE total order for BOTH windows (s, e, event_id): the break
    # flag computed under one ordering but summed under another
    # mis-assembles islands whenever starts tie (caught at sf0.01 as
    # one-second coverage drift).
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        "event_id",
        F.when(
            F.col("s")
            > F.coalesce(F.max("e").over(w_prev), F.lit(-(2**63))),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    merged = (
        flagged.withColumn("grp", F.sum("brk").over(w_cum))
        .groupBy("user_id", "grp")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum(F.col("me") - F.col("ms")).cast("bigint").alias("covered_seconds"),
        )
        .orderBy("user_id")
    )
