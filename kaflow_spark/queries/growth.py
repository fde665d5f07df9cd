"""Round-10 declared queries: growth accounting and cross-domain
provenance (q209-q220).

The product-analytics layer a live deployment runs on top of the
round-9 monitors: daily growth accounting (q209 new/retained/
resurrected/churned — the canonical DAU decomposition), engagement
stickiness (q210 DAU/MAU), timing-shape fingerprints (q211
inter-event gap histogram), per-source vocabulary freshness (q212
hapax share), cross-series co-movement (q213 pairwise Pearson over
aligned daily series, the q74 exact-moment discipline applied per
type pair), and the vector-table provenance star (q214 embedding
norms by the document dimensions, q208's enrichment shape applied to
the vector corpus), plus the cross-source duplicate provenance
matrix (q215, q41's verified pairs attributed to |sources|^2 cells)
and view-to-purchase conversion latency by segment (q216, exact
lower-median via the q148 cumulative selector), the hour-of-day
profile (q217), the dominant-account audit (q218) the
repeat-purchase cadence (q219) and the supply-concentration audit
(q220, q205's HHI algebra on the TPC-H supply domain). Registry discipline throughout: exact integer
arithmetic (cents / basis points / micro-units, DECIMAL(38,0) where
products outgrow int64), floats only in final fixed expressions of
correctly-rounded IEEE ops with explicit zero-denominator guards on
both engines, deterministic total orders, and every enumeration runs
over a BOUNDED contracted table (distinct activity, per-type day
series, |types|^2 pairs), never the raw event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaflow_spark.catalog import load
from kaflow_spark.queries.base import declare


def _activity(e: DataFrame) -> DataFrame:
    """Contracted distinct (event_type, day_i, user_id) activity —
    the shared input grain of the growth-accounting family (same
    contraction as q203/q207: the explode fans out THIS table, never
    the event log). day_i is the CALENDAR floor (unix_date over the
    session-TZ date) matching the oracle's CAST(ts AS DATE) — an
    epoch-seconds div 86400 truncates toward zero and diverges for
    pre-1970 timestamps."""
    return (
        e.filter(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)").alias("day_i"),
            "user_id",
        )
        .distinct()
    )


_ACT_SQL = """
    SELECT DISTINCT event_type,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_i,
           user_id
    FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
"""


@declare(
    "q209_growth_accounting",
    oracle=f"""
    WITH act AS ({_ACT_SQL}),
    act2 AS (
        SELECT event_type, user_id, day_i,
               MIN(day_i) OVER (PARTITION BY event_type, user_id)
                   AS first_day
        FROM act),
    contrib AS (
        SELECT event_type, user_id, day_i, first_day,
               TRUE AS cur, FALSE AS prev FROM act2
        UNION ALL
        SELECT event_type, user_id, day_i + 1, first_day,
               FALSE, TRUE FROM act2),
    pu AS (
        SELECT event_type, day_i, user_id,
               MAX(cur) AS cur, MAX(prev) AS prev,
               MIN(first_day) AS first_day
        FROM contrib GROUP BY event_type, day_i, user_id),
    agg AS (
        SELECT event_type, day_i,
           CAST(SUM(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT)
               AS n_active,
           CAST(SUM(CASE WHEN cur AND first_day = day_i THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN cur AND prev THEN 1 ELSE 0 END) AS BIGINT)
               AS n_retained,
           CAST(SUM(CASE WHEN cur AND NOT prev AND first_day < day_i
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
           CAST(SUM(CASE WHEN prev AND NOT cur THEN 1 ELSE 0 END)
               AS BIGINT) AS n_churned
        FROM pu GROUP BY event_type, day_i)
    SELECT event_type, DATE '1970-01-01' + CAST(day_i AS INT) AS day,
           n_active, n_new, n_retained, n_resurrected, n_churned
    FROM agg WHERE n_active > 0
    ORDER BY event_type, day
    """,
    doc="Daily growth accounting per event type — the canonical DAU "
    "decomposition (new + retained + resurrected = active; churned = "
    "yesterday's actives who left): per (type, day), users first seen "
    "that day, users also active the previous day, users back after "
    "a gap, and users active yesterday but not today. ONE lineage, "
    "no diamond: first-seen day rides the contracted activity table "
    "as a window (same bounded table the 2-way presence explode fans "
    "out), one aggregation per (type, day, user) merges the "
    "today/yesterday markers, one bounded rollup counts the four "
    "cohorts. Emitted for observed (n_active > 0) days; identity "
    "n_new + n_retained + n_resurrected = n_active holds by "
    "construction and is property-tested.",
    tags=("events", "window", "audit"),
)
def q209(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.events import growth_accounting

    act = _activity(load(spark, sf, "events"))
    return (
        growth_accounting(act, "event_type", "day_i", "user_id")
        .select(
            "event_type",
            F.date_from_unix_date(F.col("day_i").cast("int")).alias("day"),
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            "n_churned",
        )
        .orderBy("event_type", "day")
    )


@declare(
    "q210_dau_mau_stickiness",
    oracle=f"""
    WITH act AS ({_ACT_SQL}),
    contrib AS (
        SELECT event_type, user_id, day_i + off.off AS day_i,
               off.off = 0 AS here
        FROM act, (SELECT unnest(range(0, 28)) AS off) off),
    g AS (
        SELECT event_type, day_i,
               CAST(COUNT(DISTINCT CASE WHEN here THEN user_id END)
                   AS BIGINT) AS dau,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau,
               MAX(here) AS observed
        FROM contrib GROUP BY event_type, day_i)
    SELECT event_type, DATE '1970-01-01' + CAST(day_i AS INT) AS day,
           dau, mau, CAST(dau * 10000 // mau AS BIGINT) AS stickiness_bp
    FROM g WHERE observed
    ORDER BY event_type, day
    """,
    doc="DAU/MAU stickiness per event type — the engagement-intensity "
    "ratio next to q203's WAU: distinct users active on day d over "
    "distinct users active in [d-27, d], integer basis points. The "
    "q207 shape: one aggregation per (type, day, user) merges the "
    "explode's offset-0 markers, then BOTH cardinalities fall out of "
    "one bounded rollup (count(*) = MAU since rows are distinct "
    "users, sum(here) = DAU) — measured 1.5x faster than the "
    "conditional-COUNT-DISTINCT form, whose dual distincts plan an "
    "Expand that doubles the shuffle. No two-window diamond; the 28x "
    "fan-out multiplies the CONTRACTED activity table, never the "
    "event log. Observed days only; mau >= dau >= 1 by construction, "
    "so the division needs no guard.",
    tags=("events", "window"),
)
def q210(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.events import _windowed_presence_counts

    act = _activity(load(spark, sf, "events"))
    # r14: interval-delta kernel replaces the 28-way offset explode
    # (80k activity rows -> 2.3M before; islands emit ~2 endpoint
    # deltas per user-burst) — dau = per-day distinct actives rides
    # the marker rows, mau = the cumulative interval count, emitted
    # for observed days only, value-identical to the explode form.
    g = _windowed_presence_counts(
        act, "event_type", "day_i", "user_id", 28
    ).select(
        "event_type",
        "day_i",
        F.col("n_today").alias("dau"),
        F.col("n_window").alias("mau"),
    )
    return (
        g.select(
            "event_type",
            F.date_from_unix_date(F.col("day_i").cast("int")).alias("day"),
            "dau",
            "mau",
            F.expr("dau * 10000 div mau").alias("stickiness_bp"),
        )
        .orderBy("event_type", "day")
    )


@declare(
    "q211_interarrival_histogram",
    oracle="""
    WITH s AS (
        SELECT event_type, user_id,
               CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec, event_id
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
          AND event_type IS NOT NULL),
    g AS (
        SELECT event_type,
               sec - LAG(sec) OVER (PARTITION BY event_type, user_id
                                    ORDER BY sec, event_id) AS gap
        FROM s)
    SELECT event_type,
           CAST(LENGTH(CAST(gap AS VARCHAR)) AS BIGINT) AS gap_digits,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM g WHERE gap IS NOT NULL
    GROUP BY event_type, gap_digits
    ORDER BY event_type, gap_digits
    """,
    doc="Inter-event timing fingerprint: per event type, the "
    "histogram of consecutive same-user gap durations bucketed by "
    "DECIMAL DIGIT COUNT of the gap in seconds (1 digit = under 10s, "
    "5 digits = hours-to-a-day...) — the bot-vs-human / batch-vs-"
    "organic shape audit next to q188's burstiness scalar. The digit "
    "bucket is length(CAST(gap AS VARCHAR)) — pure integer-to-text, "
    "identical in both engines, where floor(log10/log2) would ride "
    "on a non-correctly-rounded libm log (the q201 lesson). Epoch "
    "seconds via truncation on BOTH sides (Spark's LONG cast "
    "truncates; DuckDB's epoch() CAST rounds — epoch_us // 1e6 is "
    "the portable form, the q152 corollary). One user-partitioned "
    "lag window, then a bounded (|types| x ~12 digit-buckets) "
    "rollup.",
    tags=("events", "window", "audit"),
)
def q211(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf, "events")
    s = e.filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
    ).select(
        "event_type",
        "user_id",
        F.expr("CAST(ts AS LONG)").alias("sec"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "user_id").orderBy("sec", "event_id")
    g = s.select(
        "event_type",
        (F.col("sec") - F.lag("sec").over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return (
        g.groupBy(
            "event_type",
            F.length(F.col("gap").cast("string")).cast("bigint").alias(
                "gap_digits"
            ),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "gap_digits")
    )


@declare(
    "q212_source_hapax_share",
    oracle="""
    WITH tk AS (
        SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS t
        FROM documents),
    pt AS (SELECT source, t, COUNT(*) AS c FROM tk GROUP BY source, t)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 10000
                // GREATEST(COUNT(*), 1) AS BIGINT) AS hapax_bp
    FROM pt GROUP BY source ORDER BY source
    """,
    doc="Per-source vocabulary freshness: hapax legomena (tokens "
    "occurring exactly once in the source) as a share of the "
    "source's distinct vocabulary — high hapax share = heavy-tailed, "
    "fresh text; low = templated/repetitive, the complement to "
    "q196's Heaps growth and q204's boilerplate prefixes for mixture "
    "weighting. q77's corpus-global shape at the source grain: one "
    "token explode, one (source, token) partial-agg'd count, one "
    "bounded per-source fold; integer basis points.",
    tags=("curation", "text", "audit"),
)
def q212(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    tk = d.select(
        "source",
        F.explode(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).alias("t"),
    )
    pt = tk.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    return (
        pt.groupBy("source")
        .agg(
            F.sum("c").alias("total_tokens"),
            F.count(F.lit(1)).alias("distinct_tokens"),
            F.sum((F.col("c") == 1).cast("long")).alias("hapax"),
        )
        .select(
            "source",
            "total_tokens",
            "distinct_tokens",
            "hapax",
            F.expr(
                "hapax * 10000 div greatest(distinct_tokens, 1)"
            ).alias("hapax_bp"),
        )
        .orderBy("source")
    )


@declare(
    "q213_cross_type_correlation",
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
          ON a.day = b.day AND a.event_type < b.event_type),
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
           END AS corr_r
    FROM s ORDER BY type_a, type_b
    """,
    doc="Cross-series co-movement: pairwise Pearson correlation "
    "between event types' daily cent volumes over their ALIGNED days "
    "(inner join on day — days where both series have volume) — the "
    "'do refunds track checkouts' monitor. q74's exact-moment "
    "discipline applied per pair: all six sufficient statistics are "
    "exact DECIMAL(38,0) sums over the BOUNDED per-type day series "
    "(the |types|^2 pair join never sees the event log), and floats "
    "enter only in the final fixed expression (cast, two "
    "correctly-rounded IEEE sqrts, two divides, one round) behind an "
    "explicit positive-variance guard on BOTH engines (the q198 "
    "zero-variance lesson) — constant series emit NULL, not "
    "NaN-vs-NULL divergence.",
    tags=("events", "stats"),
)
def q213(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    ser = (
        e.filter(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .select(
            "event_type",
            F.expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)").alias("day_i"),
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("event_type", "day_i")
        .agg(F.sum("cents").alias("v"))
    )
    a = ser.select(
        F.col("event_type").alias("type_a"),
        "day_i",
        F.col("v").alias("x"),
    )
    b = ser.select(
        F.col("event_type").alias("type_b"),
        "day_i",
        F.col("v").alias("y"),
    )
    j = a.join(b, "day_i").filter(F.col("type_a") < F.col("type_b"))
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
        ).alias("corr_r"),
    ).orderBy("type_a", "type_b")


@declare(
    "q214_vector_provenance_audit",
    oracle="""
    WITH n AS (
        SELECT d.source, d.lang,
               CAST(FLOOR(sqrt(list_sum(list_transform(e.embedding,
                    x -> CAST(x AS DOUBLE) * x))) * 1000000) AS BIGINT)
                   AS norm_micro
        FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id)
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(norm_micro) AS BIGINT) AS min_norm,
           CAST(MAX(norm_micro) AS BIGINT) AS max_norm,
           CAST(SUM(norm_micro) // COUNT(*) AS BIGINT) AS mean_norm
    FROM n GROUP BY source, lang
    ORDER BY source, lang
    """,
    doc="Vector-table provenance star: embedding norms rolled up by "
    "the DOCUMENT dimensions (source, lang) via the vec_id = doc_id "
    "identity — q208's cross-domain enrichment shape applied to the "
    "vector corpus, and the audit that localizes q202's norm "
    "anomalies to a provenance cell ('which source shipped the "
    "near-zero vectors'). The dimension projection (doc_id, source, "
    "lang) broadcasts — narrow id-keyed rows, no shuffle of the "
    "vector table (plan-asserted: no SortMergeJoin); norms "
    "floor-quantized to integer micro-units before any aggregation "
    "(the q202 discipline — per-row float work is sequential and "
    "identical on both engines, cross-row work is pure integers).",
    tags=("vectors", "join", "audit"),
)
def q214(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    d = load(spark, sf, "documents").select("doc_id", "source", "lang")
    n = emb.join(
        F.broadcast(d), emb["vec_id"] == d["doc_id"]
    ).select(
        "source",
        "lang",
        F.expr(
            "CAST(FLOOR(sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE),"
            " (acc, x) -> acc + CAST(x AS DOUBLE) * x)) * 1000000)"
            " AS BIGINT)"
        ).alias("norm_micro"),
    )
    return (
        n.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("norm_micro").alias("min_norm"),
            F.max("norm_micro").alias("max_norm"),
            F.expr("SUM(norm_micro) div COUNT(*)").alias("mean_norm"),
        )
        .orderBy("source", "lang")
    )


@declare(
    "q215_cross_source_dup_matrix",
    oracle="""
    WITH sh AS (
        SELECT doc_id, list(DISTINCT substring(text, CAST(i AS INT), 5)) AS s
        FROM (SELECT doc_id, text,
                     unnest(range(1, greatest(length(text)-4, 1)+1)) AS i
              FROM documents)
        GROUP BY doc_id),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
    e AS (SELECT id_a, id_b FROM p WHERE jaccard >= 0.9),
    j AS (
        SELECT LEAST(da.source, db.source) AS source_a,
               GREATEST(da.source, db.source) AS source_b
        FROM e JOIN documents da ON da.doc_id = e.id_a
               JOIN documents db ON db.doc_id = e.id_b)
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM j GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """,
    doc="Cross-source duplicate provenance matrix: q41's VERIFIED "
    "jaccard >= 0.9 near-dup pairs attributed to their (source, "
    "source) cell — the dedup-QA report that separates 'one crawl "
    "mirrored another' (off-diagonal mass -> dedup ACROSS sources "
    "before mixing) from 'a source re-posts itself' (diagonal mass "
    "-> per-source dedup suffices). Pair ends attach to the narrow "
    "(doc_id, source) projection by id equi-join (the verified pair "
    "list is churn-bounded and tiny next to the corpus; only ids and "
    "short source labels shuffle), then one bounded |sources|^2 "
    "rollup with the unordered cell canonicalized via least/"
    "greatest. Oracle is the same brute-force O(n^2) jaccard CTE "
    "q41 hash-checks against (quadratic in documents — sf0.001/0.01 "
    "gate, like q206).",
    tags=("dedup", "audit", "quadratic-oracle"),
)
def q215(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.dedup import verified_pair_frame

    d = load(spark, sf, "documents")
    # q41's shared persisted verified-pair frame — one LSH + verify
    # materialization serves q41/q137/q206/q215
    pairs = verified_pair_frame(d, "doc_id", "text").select("id_a", "id_b")
    src = d.select("doc_id", "source")
    a = src.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("_sa")
    )
    b = src.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("_sb")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.least("_sa", "_sb").alias("source_a"),
            F.greatest("_sa", "_sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("source_a", "source_b")
    )


@declare(
    "q216_conversion_latency",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type,
               CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL
          AND event_type IN ('view', 'purchase')),
    f AS (
        SELECT user_id, event_type, sec,
               MIN(CASE WHEN event_type = 'view' THEN sec END)
                   OVER (PARTITION BY user_id) AS fv
        FROM s),
    conv AS (
        SELECT user_id, MIN(sec - fv) AS lat
        FROM f
        WHERE event_type = 'purchase' AND fv IS NOT NULL AND sec >= fv
        GROUP BY user_id),
    seg AS (
        SELECT c.c_mktsegment AS segment, conv.lat
        FROM conv JOIN customer c ON c.c_custkey = conv.user_id),
    cnt AS (SELECT segment, lat, COUNT(*) AS c FROM seg
            GROUP BY segment, lat),
    cum AS (
        SELECT segment, lat,
               SUM(c) OVER (PARTITION BY segment ORDER BY lat) AS cum,
               SUM(c) OVER (PARTITION BY segment) AS n
        FROM cnt)
    SELECT segment, CAST(MIN(n) AS BIGINT) AS n_converted,
           CAST(MIN(lat) AS BIGINT) AS median_latency_s
    FROM cum WHERE cum >= (n + 1) // 2
    GROUP BY segment ORDER BY segment
    """,
    doc="View-to-purchase conversion latency by market segment: per "
    "user, seconds from the FIRST view to the first purchase at or "
    "after it; per segment, the converted-user count and the exact "
    "LOWER-median latency. One lineage to the per-user row: the "
    "first-view floor is a window over the SAME user partitioning "
    "the purchase aggregation then groups on (no second scan, no "
    "first-view join); the segment attaches by broadcast (customer "
    "is a dim, q208's shape); the median comes from the q148-style "
    "cumulative selector over the bounded (segment, latency) "
    "value-count table — never a collect_list over an unbounded "
    "user population. Truncated epoch seconds on both engines (the "
    "q152 corollary); integer throughout.",
    tags=("events", "join", "stats"),
)
def q216(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf, "events")
    s = e.filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isin("view", "purchase")
    ).select(
        "user_id",
        "event_type",
        F.expr("CAST(ts AS LONG)").alias("sec"),
    )
    w = Window.partitionBy("user_id")
    f = s.withColumn(
        "fv",
        F.min(
            F.when(F.col("event_type") == "view", F.col("sec"))
        ).over(w),
    )
    conv = (
        f.filter(
            (F.col("event_type") == "purchase")
            & F.col("fv").isNotNull()
            & (F.col("sec") >= F.col("fv"))
        )
        .groupBy("user_id")
        .agg(F.min(F.col("sec") - F.col("fv")).alias("lat"))
    )
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    seg = conv.join(F.broadcast(c), "user_id").select("segment", "lat")
    cnt = seg.groupBy("segment", "lat").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("segment").orderBy("lat")
    cum = cnt.select(
        "segment",
        "lat",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(Window.partitionBy("segment")).alias("n"),
    )
    return (
        cum.filter(F.expr("cum >= (n + 1) div 2"))
        .groupBy("segment")
        .agg(
            F.min("n").alias("n_converted"),
            F.min("lat").alias("median_latency_s"),
        )
        .orderBy("segment")
    )


@declare(
    "q217_hourly_profile",
    oracle="""
    WITH e AS (
        SELECT event_type,
               (CAST(epoch_us(ts) // 1000000 AS BIGINT) // 3600) % 24
                   AS hod
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    prof AS (
        SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM e GROUP BY event_type, hod)
    SELECT event_type, CAST(hod AS BIGINT) AS hod, n_events,
           CAST(n_events * 10000 // CAST(SUM(n_events)
                OVER (PARTITION BY event_type) AS BIGINT) AS BIGINT)
               AS share_bp
    FROM prof ORDER BY event_type, hod
    """,
    doc="Hour-of-day activity profile per event type: each UTC "
    "hour's share of the type's event count in basis points — the "
    "intraday seasonality baseline next to q199's weekly one (and "
    "the count-based complement to its cents basis). Hour as pure "
    "integer arithmetic on truncated epoch seconds ((sec div 3600) "
    "mod 24 — no engine hour()/timezone convention can disagree; "
    "the q152 epoch-truncation corollary on the oracle side). One "
    "partial-agg'd aggregation contracts the corpus to <= |types| x "
    "24 rows; the share window runs over that bounded table; counts "
    "are >= 1 wherever a row exists, so the division needs no "
    "guard.",
    tags=("events", "audit"),
)
def q217(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    prof = (
        e.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "event_type",
            F.expr("(CAST(ts AS LONG) div 3600) % 24").alias("hod"),
        )
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        prof.select(
            "event_type",
            F.col("hod").cast("bigint").alias("hod"),
            "n_events",
            F.expr(
                "n_events * 10000 div sum(n_events)"
                " over (partition by event_type)"
            ).alias("share_bp"),
        )
        .orderBy("event_type", "hod")
    )


@declare(
    "q218_dominant_user_audit",
    oracle="""
    WITH cnt AS (
        SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        GROUP BY event_type, user_id),
    r AS (
        SELECT event_type, user_id, n,
               CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
                   AS total,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_users,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, user_id) AS rn
        FROM cnt)
    SELECT event_type, user_id AS top_user, n AS top_n, n_users, total,
           CAST(n * 10000 // total AS BIGINT) AS top_share_bp
    FROM r WHERE rn = 1
    ORDER BY event_type
    """,
    doc="Dominant-account audit per event type: the single heaviest "
    "user's share of the type's events in basis points, with the "
    "user count and total — the 'is this metric one bot' check run "
    "before trusting any per-type aggregate, and the argmax "
    "companion to q205's full HHI distribution. Deterministic "
    "winner under the (count DESC, user_id ASC) total order (ties "
    "cannot flap the row). One shuffle to the (type, user) count "
    "table; every window runs over that contracted table, "
    "partitioned by the bounded type key; total >= top_n >= 1, so "
    "the division needs no guard.",
    tags=("events", "audit"),
)
def q218(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf, "events")
    cnt = (
        e.filter(
            F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
        )
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.asc("user_id")
    )
    r = cnt.select(
        "event_type",
        "user_id",
        "n",
        F.sum("n").over(wt).alias("total"),
        F.count(F.lit(1)).over(wt).alias("n_users"),
        F.row_number().over(wr).alias("rn"),
    )
    return (
        r.filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("user_id").alias("top_user"),
            F.col("n").alias("top_n"),
            "n_users",
            "total",
            F.expr("n * 10000 div total").alias("top_share_bp"),
        )
        .orderBy("event_type")
    )


@declare(
    "q219_reorder_interval",
    oracle="""
    WITH o AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_orderkey
        FROM orders WHERE o_orderdate IS NOT NULL),
    g AS (
        SELECT o_custkey,
               od - LAG(od) OVER (PARTITION BY o_custkey
                                  ORDER BY od, o_orderkey) AS gap
        FROM o),
    seg AS (
        SELECT c.c_mktsegment AS segment, CAST(g.gap AS BIGINT) AS gap
        FROM g JOIN customer c ON c.c_custkey = g.o_custkey
        WHERE g.gap IS NOT NULL),
    cnt AS (SELECT segment, gap, COUNT(*) AS c FROM seg
            GROUP BY segment, gap),
    cum AS (
        SELECT segment, gap,
               SUM(c) OVER (PARTITION BY segment ORDER BY gap) AS cum,
               SUM(c) OVER (PARTITION BY segment) AS n
        FROM cnt)
    SELECT segment, CAST(MIN(n) AS BIGINT) AS n_gaps,
           CAST(MIN(gap) AS BIGINT) AS median_gap_days
    FROM cum WHERE cum >= (n + 1) // 2
    GROUP BY segment ORDER BY segment
    """,
    doc="Repeat-purchase cadence by market segment: days between a "
    "customer's consecutive orders (ordered by date with the order "
    "key as the deterministic tie-break; same-day reorders count as "
    "gap 0), rolled up to the per-segment gap count and exact "
    "LOWER-median gap — the replenishment-cycle input to inventory "
    "and CRM cadence planning, and q216's orders-fact sibling. One "
    "shuffle to the customer timeline (lag window), segment by "
    "broadcast dim, median via the q148 cumulative selector over "
    "the bounded (segment, gap) value-count table. Integer days "
    "end-to-end (DATE subtraction both engines).",
    tags=("tpch", "join", "stats"),
)
def q219(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("od"),
            "o_orderkey",
        )
    )
    w = Window.partitionBy("o_custkey").orderBy("od", "o_orderkey")
    g = o.select(
        "o_custkey",
        F.datediff(F.col("od"), F.lag("od").over(w))
        .cast("bigint")
        .alias("gap"),
    ).filter(F.col("gap").isNotNull())
    c = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_mktsegment").alias("segment"),
    )
    seg = g.join(F.broadcast(c), "o_custkey").select("segment", "gap")
    cnt = seg.groupBy("segment", "gap").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("segment").orderBy("gap")
    cum = cnt.select(
        "segment",
        "gap",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(Window.partitionBy("segment")).alias("n"),
    )
    return (
        cum.filter(F.expr("cum >= (n + 1) div 2"))
        .groupBy("segment")
        .agg(
            F.min("n").alias("n_gaps"),
            F.min("gap").alias("median_gap_days"),
        )
        .orderBy("segment")
    )


@declare(
    "q220_supply_concentration",
    oracle="""
    WITH q AS (
        SELECT p.p_brand, l.l_suppkey,
               CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS q
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity IS NOT NULL
        GROUP BY p.p_brand, l.l_suppkey)
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(q) AS BIGINT) AS total_qty,
           CAST(SUM(q::HUGEINT * q) * 10000
                // (SUM(q)::HUGEINT * SUM(q)) AS BIGINT) AS hhi_bp,
           CAST((SUM(q)::HUGEINT * SUM(q)) * 100
                // SUM(q::HUGEINT * q) AS BIGINT) AS eff_suppliers_pct
    FROM q GROUP BY p_brand ORDER BY p_brand
    """,
    doc="Supply-concentration audit per part brand: Herfindahl index "
    "over each supplier's share of the brand's traded quantity (HHI "
    "in basis points — 10000 = single-sourced) plus the inverse-"
    "Simpson 'effective number of suppliers' in percent — the "
    "procurement-risk report ('which brands are one bankruptcy away "
    "from a stockout'), q205's concentration algebra applied to the "
    "TPC-H supply domain. The fixture has no partsupp, so supply is "
    "the quantity actually traded per (brand, supplier) (the q123 "
    "derivation). Exact integers throughout: quantities in "
    "hundredths, both ratios lifted to DECIMAL(38,0)/HUGEINT before "
    "the truncating division (q_s^2 sums outgrow int64 at "
    "warehouse scale). Part broadcasts (dim); two aggregations "
    "contract lineitem -> (brand, supplier) -> |brands| rows.",
    tags=("tpch", "agg", "audit"),
)
def q220(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").filter(
        F.col("l_quantity").isNotNull()
    )
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    q = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .select(
            "p_brand",
            "l_suppkey",
            F.expr(
                "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("qq"),
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum("qq").alias("q"))
    )
    return (
        q.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("q").alias("total_qty"),
            F.expr(
                "CAST(CAST(SUM(q * CAST(q AS DECIMAL(38,0))) AS DECIMAL(38,0))"
                " * 10000 div (CAST(SUM(q) AS DECIMAL(38,0)) * SUM(q))"
                " AS BIGINT)"
            ).alias("hhi_bp"),
            F.expr(
                "CAST(CAST(SUM(q) AS DECIMAL(38,0)) * SUM(q) * 100"
                " div CAST(SUM(q * CAST(q AS DECIMAL(38,0))) AS DECIMAL(38,0))"
                " AS BIGINT)"
            ).alias("eff_suppliers_pct"),
        )
        .orderBy("p_brand")
    )
