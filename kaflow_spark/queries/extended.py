"""Extended declared queries q50+ — operator families beyond the core
SURVEY tables that a reference user would expect from an analytics
engine: ordered array aggregation, lateral explode, pivot, exact
percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaflow_spark.catalog import load
from kaflow_spark.queries.base import declare


@declare(
    "q50_array_agg_sorted",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(c_name)), '|') AS names,
           COUNT(*) AS n
    FROM customer
    WHERE c_custkey <= 40
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Ordered array aggregation: collect_list is shuffle-order-"
    "nondeterministic, so the declared form sorts the result array "
    "(deterministic set semantics). The declared output serializes "
    "the array to a '|'-joined string because pandas-side result "
    "canonicalizers cannot sort/hash list cells; in-engine consumers "
    "would keep the array (same plan minus the final join).",
    tags=("agg", "array"),
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "customer")
        .filter(F.col("c_custkey") <= 40)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), "|").alias(
                "names"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@declare(
    "q51_posexplode",
    oracle="""
    SELECT doc_id, tok, CAST(ord AS INT) AS pos
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                 generate_subscripts(string_split(text, ' '), 1) AS ord
          FROM documents WHERE doc_id <= 20)
    ORDER BY doc_id, pos
    """,
    doc="Lateral explode with position (UDTF-shaped 1->N operator; "
    "posexplode is 0-based in Spark, normalized to 1-based here).",
    tags=("udtf", "array"),
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").filter(F.col("doc_id") <= 20)
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ", -1)).alias("pos0", "tok"),
        )
        .select("doc_id", "tok", (F.col("pos0") + 1).cast("int").alias("pos"))
        .orderBy("doc_id", "pos")
    )


@declare(
    "q52_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Pivot (long->wide): Spark's native pivot with explicit value "
    "list (one aggregation pass, no per-value scans); oracle states "
    "it as conditional aggregation.",
    tags=("agg", "pivot"),
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    pivoted = (
        load(spark, sf, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return (
        pivoted.select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("f_cnt"),
            F.coalesce(F.col("O"), F.lit(0)).alias("o_cnt"),
            F.coalesce(F.col("P"), F.lit(0)).alias("p_cnt"),
        )
        .orderBy("o_orderpriority")
    )


@declare(
    "q54_topn_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, rn FROM (
        SELECT c_mktsegment, c_custkey,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        FROM customer) t
    WHERE rn <= 3 ORDER BY c_mktsegment, rn
    """,
    doc="Top-N per group (window rank + filter): the rank filter "
    "pushes through so only N rows per partition survive the sort.",
    tags=("window", "topk"),
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        load(spark, sf, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@declare(
    "q55_string_agg",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    doc="Ordered string aggregation (listagg): sort-then-join is the "
    "deterministic declared form.",
    tags=("agg",),
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("names")
        )
        .orderBy("n_regionkey")
    )


@declare(
    "q56_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT)
               AS days_left,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom
    FROM orders ORDER BY o_orderkey
    """,
    doc="Date arithmetic: add-interval, day difference, end-of-month.",
    tags=("scalar",),
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    d = F.to_date("o_orderdate")
    return (
        load(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.date_add(d, 30).alias("due"),
            F.datediff(F.lit("1998-01-01").cast("date"), d).cast("int").alias(
                "days_left"
            ),
            F.last_day(d).alias("eom"),
        )
        .orderBy("o_orderkey")
    )


@declare(
    "q57_regexp",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(text, 'data|spark') AS has_kw
    FROM documents WHERE doc_id <= 50 ORDER BY doc_id
    """,
    doc="Regexp family. Dialect: Spark regexp_replace is global by "
    "default, DuckDB needs the 'g' flag; Spark rlike == DuckDB "
    "regexp_matches.",
    tags=("scalar",),
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .filter(F.col("doc_id") <= 50)
        .select(
            "doc_id",
            F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
            F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
            F.col("text").rlike("data|spark").alias("has_kw"),
        )
        .orderBy("doc_id")
    )


@declare(
    "q58_dist_windows",
    oracle="""
    SELECT c_custkey,
           ROUND(PERCENT_RANK() OVER w, 10) AS pr,
           ROUND(CUME_DIST() OVER w, 10) AS cd
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
    doc="Distribution window functions (percent_rank/cume_dist); the "
    "k/n divisions are identical IEEE ops in both engines, rounded "
    "for safety.",
    tags=("window",),
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        load(spark, sf, "customer")
        .select(
            "c_custkey",
            F.round(F.percent_rank().over(w), 10).alias("pr"),
            F.round(F.cume_dist().over(w), 10).alias("cd"),
        )
        .orderBy("c_custkey")
    )


@declare(
    "q59_bitwise_least_greatest",
    oracle="""
    SELECT n_nationkey,
           n_nationkey & 12 AS ba, n_nationkey | 3 AS bo,
           xor(n_nationkey, 5) AS bx,
           n_nationkey << 2 AS shl, n_nationkey >> 1 AS shr,
           LEAST(n_nationkey, n_regionkey) AS lo,
           GREATEST(n_nationkey, n_regionkey) AS hi
    FROM nation ORDER BY n_nationkey
    """,
    doc="Bitwise family + least/greatest (dialect: Spark infix ^ is "
    "XOR while DuckDB spells it xor()).",
    tags=("scalar",),
)
def q59(spark: SparkSession, sf: str) -> DataFrame:
    k = F.col("n_nationkey")
    return (
        load(spark, sf, "nation")
        .select(
            "n_nationkey",
            k.bitwiseAND(F.lit(12)).alias("ba"),
            k.bitwiseOR(F.lit(3)).alias("bo"),
            k.bitwiseXOR(F.lit(5)).alias("bx"),
            F.shiftleft(k, 2).alias("shl"),
            F.shiftright(k, 1).alias("shr"),
            F.least(k, F.col("n_regionkey")).alias("lo"),
            F.greatest(k, F.col("n_regionkey")).alias("hi"),
        )
        .orderBy("n_nationkey")
    )


@declare(
    "q60_try_cast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(lang AS INT) AS lang_int,
           TRY_CAST(n_chars AS SMALLINT) AS nch_small,
           TRY_CAST(CAST(doc_id AS VARCHAR) AS INT) AS id_round
    FROM documents WHERE doc_id <= 100 ORDER BY doc_id
    """,
    doc="try_cast semantics: invalid conversions yield NULL instead of "
    "errors (engine runs ANSI mode, so plain CAST would throw).",
    tags=("scalar",),
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .filter(F.col("doc_id") <= 100)
        .select(
            "doc_id",
            F.col("lang").try_cast("int").alias("lang_int"),
            F.col("n_chars").try_cast("smallint").alias("nch_small"),
            F.col("doc_id").cast("string").try_cast("int").alias("id_round"),
        )
        .orderBy("doc_id")
    )


@declare(
    "q61_salted_aggregate",
    oracle="""
    SELECT user_id, COUNT(*) AS n, MIN(event_id) AS first_e,
           MAX(event_id) AS last_e
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="Skew-safe two-phase salted aggregation (operators.skew): the "
    "salt only routes rows, so count/min/max results are EXACTLY the "
    "plain GROUP BY — which is the oracle.",
    tags=("agg", "skew"),
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.skew import salted_aggregate

    return salted_aggregate(
        load(spark, sf, "events"),
        ["user_id"],
        {
            "n": ("count", "*"),
            "first_e": ("min", "event_id"),
            "last_e": ("max", "event_id"),
        },
        salt=8,
    ).orderBy("user_id")


@declare(
    "q62_salted_join",
    oracle="""
    SELECT o_orderkey, c_name FROM orders
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey
    """,
    doc="Skew-safe salted equi-join (operators.skew): dim replicated "
    "salt x, fact salted — the result set is EXACTLY the plain join.",
    tags=("join", "skew"),
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.skew import salted_join

    o = load(spark, sf, "orders").withColumnRenamed("o_custkey", "k")
    c = load(spark, sf, "customer").withColumnRenamed("c_custkey", "k")
    return (
        salted_join(o, c.select("k", "c_name"), "k", salt=4)
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


@declare(
    "q64_binned_range_join",
    oracle="""
    SELECT s_suppkey, p_partkey FROM supplier
    JOIN part ON p_retailprice BETWEEN s_acctbal - 10 AND s_acctbal + 10
    ORDER BY s_suppkey, p_partkey
    """,
    doc="Binned range join (operators.rangejoin): the large-x-large "
    "rewrite of q10's broadcast-NLJ range join — equi-join on bin id "
    "+ residual filter. Same semantics, so q10's oracle applies.",
    tags=("join",),
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.rangejoin import binned_range_join

    s = load(spark, sf, "supplier").select(
        "s_suppkey",
        (F.col("s_acctbal") - 10).alias("lo"),
        (F.col("s_acctbal") + 10).alias("hi"),
    )
    p = load(spark, sf, "part").select("p_partkey", "p_retailprice")
    return (
        binned_range_join(p, s, "p_retailprice", "lo", "hi", bin_width=20.0)
        .select("s_suppkey", "p_partkey")
        .orderBy("s_suppkey", "p_partkey")
    )


@declare(
    "q65_map_funcs",
    oracle="""
    SELECT n_nationkey,
           array_to_string(list_sort(map_keys(
               MAP(['x','y'], [n_nationkey, n_regionkey]))), ',') AS ks,
           CAST(map_extract(MAP(['x','y'], [n_nationkey, n_regionkey]), 'x')[1] AS INT) AS vx,
           CAST(len(map_entries(MAP(['x','y'], [n_nationkey, n_regionkey]))) AS INT) AS n
    FROM nation ORDER BY n_nationkey
    """,
    doc="Map family (construction, keys, point lookup, cardinality) — "
    "the Kafka-headers shape. Keys sorted then ','-joined: sorted for "
    "cross-engine determinism, joined because pandas-side "
    "canonicalizers cannot hash list cells (dialect: DuckDB "
    "map_extract returns a list).",
    tags=("scalar", "map"),
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    m = F.create_map(
        F.lit("x"), F.col("n_nationkey"), F.lit("y"), F.col("n_regionkey")
    )
    return (
        load(spark, sf, "nation")
        .select(
            "n_nationkey",
            F.array_join(F.sort_array(F.map_keys(m)), ",").alias("ks"),
            F.element_at(m, "x").cast("int").alias("vx"),
            F.size(F.map_entries(m)).cast("int").alias("n"),
        )
        .orderBy("n_nationkey")
    )


@declare(
    "q66_ts_interval",
    oracle="""
    SELECT event_id,
           ts + INTERVAL 90 MINUTE AS later,
           ts - INTERVAL 1 DAY AS yesterday,
           CAST(date_trunc('minute', ts) AS TIMESTAMP) AS m
    FROM events WHERE event_id <= 200 ORDER BY event_id
    """,
    doc="Timestamp interval arithmetic + minute truncation.",
    tags=("scalar",),
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .filter(F.col("event_id") <= 200)
        .select(
            "event_id",
            (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("later"),
            (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("yesterday"),
            F.date_trunc("minute", F.col("ts")).alias("m"),
        )
        .orderBy("event_id")
    )


@declare(
    "q67_range_interval_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS mv30
    FROM events ORDER BY user_id, event_id
    """,
    doc="Time-based RANGE frame: per-user 30-minute trailing sum. "
    "Decimal-cast inside the SUM keeps the accumulation exact and "
    "order-independent; the final DECIMAL->DOUBLE cast (both sides) "
    "avoids engine-specific decimal rendering in pandas. RANGE frames "
    "include ALL peers at equal ts, so no tie-break is needed for "
    "determinism.",
    tags=("window",),
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS mv30
        FROM events ORDER BY user_id, event_id
        """
    )


_Q53_SQL = """
    WITH r AS (
        SELECT o_orderpriority, o_totalprice AS v,
               CUME_DIST() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice) AS cd
        FROM orders)
    SELECT o_orderpriority,
           MIN(CASE WHEN cd >= 0.5 THEN v END) AS med,
           MIN(CASE WHEN cd >= 0.9 THEN v END) AS p90
    FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@declare(
    "q53_percentile_exact",
    oracle=_Q53_SQL,
    doc="Exact percentiles with percentile_disc semantics, stated as "
    "set-selection (smallest value whose cume_dist reaches p): the "
    "result is an actual data value, so no interpolation arithmetic "
    "can drift between engines (cume_dist = k/n is a single exactly-"
    "rounded IEEE division in both). Sort-based, deterministic — "
    "unlike approx_percentile which stays engine-only.",
    tags=("agg",),
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q53_SQL)


_Q73_SQL = """
    WITH s AS (
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sx,
               SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0))
                   * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sxx
        FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, n,
           CAST(sx AS DOUBLE) / 100 AS sum_price,
           CAST((num - num % den) / den AS BIGINT) AS var_c2,
           CAST(CAST((num - num % den) / den AS BIGINT) AS DOUBLE)
               / 10000 AS var_price
    FROM (SELECT o_orderpriority, n, sx,
                 n * sxx - sx * sx AS num,
                 CAST(n AS DECIMAL(38,0)) * (n - 1) AS den
          FROM s) f
    ORDER BY o_orderpriority
"""


@declare(
    "q73_exact_variance",
    oracle=_Q73_SQL,
    doc="Sample variance with no floating point in any AGGREGATE: "
    "prices in integer cents, exact decimal sums of x and x^2, "
    "variance as the exact floor division (n*Sxx - Sx^2) DIV "
    "(n*(n-1)) in cents^2, written as (num - num % den) / den so the "
    "quotient is an exact integer BEFORE any division happens — "
    "Spark's decimal `/` (truncating cast) and DuckDB's decimal `/` "
    "(double division, rounding cast) then agree bit-for-bit. Doubles "
    "appear only in the final per-group projection, converting exact "
    "integers < 2^53 — a correctly-rounded, order-independent op on "
    "both engines (and it keeps the output dtype identical across "
    "Spark/DuckDB: wide DECIMALs round-trip differently through "
    "pandas). Spark's var_samp / "
    "DuckDB's var_samp sum doubles in shuffle order and can differ in "
    "the last ulp run-to-run; this formulation is hash-stable at any "
    "scale and parallelism.",
    tags=("agg", "stats"),
)
def q73(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q73_SQL)


_Q74_SQL = """
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DECIMAL(38,0)) AS sx,
               CAST(SUM(o_custkey) AS DECIMAL(38,0)) AS sy,
               SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0))
                   * CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS sxx,
               SUM(CAST(o_custkey AS DECIMAL(38,0)) * o_custkey) AS syy,
               SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(38,0))
                   * o_custkey) AS sxy
        FROM orders)
    SELECT n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                 / SQRT(CAST(n * syy - sy * sy AS DOUBLE)), 9) AS corr_r,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE) / 100, 6) AS covar_s
    FROM s
"""


@declare(
    "q74_corr_from_exact_sums",
    oracle=_Q74_SQL,
    doc="Pearson correlation / sample covariance computed from EXACT "
    "decimal moment sums, with floating point entering only in the "
    "final fixed expression (cast, sqrt, three divides — all "
    "correctly-rounded IEEE ops on both engines, so the result is "
    "bit-stable regardless of row order, unlike the native corr() "
    "aggregate whose double summation is shuffle-order-dependent).",
    tags=("agg", "stats"),
)
def q74(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q74_SQL)


_Q75_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    ORDER BY c_custkey
"""


@declare(
    "q75_exists_not_exists",
    oracle=_Q75_SQL,
    doc="EXISTS + NOT EXISTS correlated subqueries in one predicate: "
    "Catalyst rewrites them to a left-semi and a left-anti join on "
    "c_custkey (verified in the plan test) — the declarative SQL "
    "surface a migrating user writes, planned as the joins an engine "
    "should run.",
    tags=("subquery", "join"),
)
def q75(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q75_SQL)


# Final cast to DOUBLE, not DECIMAL(38,2) (the q12 convention): the
# exact decimal sum renders with a fixed scale on the Spark side
# ("...26.20") while DuckDB converts wide decimals to float64 whose
# shortest repr drops the trailing zero ("...26.2") — a pure string-
# form hash mismatch on EQUAL values, first hit at sf0.1 magnitudes
# (round-11 full-registry sweep). One correctly-rounded decimal->
# double cast of the SAME exact sum is identical on both engines.
_Q79_SQL = """
    SELECT o_orderpriority,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                         FILTER (WHERE o_orderstatus = 'F'), 0)
                AS DOUBLE) AS sum_f
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


@declare(
    "q79_filtered_aggregates",
    oracle=_Q79_SQL,
    doc="ANSI FILTER-clause aggregates: three differently-filtered "
    "aggregates in ONE pass over the table (the alternative — three "
    "self-joined subqueries — scans three times). Decimal cast before "
    "SUM keeps the filtered sum hash-exact.",
    tags=("agg",),
)
def q79(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q79_SQL)


_Q80_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
    ORDER BY c.c_custkey
"""


@declare(
    "q80_lateral_top1",
    oracle=_Q80_SQL,
    doc="Correlated LATERAL derived table (each customer's single "
    "largest order, unique-key tie-break): the SQL surface a "
    "migrating user writes for per-entity top-1; Catalyst "
    "decorrelates it into a join + per-key windowed limit rather "
    "than executing the subquery per row.",
    tags=("subquery", "join"),
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q80_SQL)


@declare(
    "q147_bitmap_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="EXACT distinct counting via bitmap buckets — the scale "
    "pattern for repeated exact distincts over dense integer ids: "
    "ids map to (bucket = id div 63, bit = 1 << (id % 63)) and the "
    "aggregation is bit_or per (group, bucket) then a sum of "
    "bit_count — fully mergeable integer state, so the shuffle "
    "carries |groups| x |buckets| masks (63 ids per 8-byte mask) "
    "instead of the expanded (group, id) pairs a two-phase "
    "count_distinct dedups through (q13's plan). 63 bits, not 64: "
    "1 << 63 wraps into the sign bit, and while bit_or/bit_count "
    "are sign-agnostic, keeping masks non-negative keeps every "
    "engine's semantics trivially identical. The ORACLE is the "
    "specification — a plain COUNT(DISTINCT) — so the hash match "
    "attests the bitmap algorithm against the straightforward "
    "semantics, not against itself.",
    tags=("agg", "events"),
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").filter(F.col("user_id").isNotNull())
    # pmod keeps the mapping injective for NEGATIVE ids too (signed %
    # plus Java shift-masking would alias -62 and 2 into one bit —
    # review-caught): bit position is the non-negative residue and the
    # bucket is the matching floor quotient.
    masks = (
        e.select(
            "event_type",
            F.expr("(user_id - pmod(user_id, 63)) div 63").alias("_bucket"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 63) AS INT))")
            .alias("_bit"),
        )
        .groupBy("event_type", "_bucket")
        .agg(F.expr("bit_or(_bit)").alias("_mask"))
    )
    return (
        masks.groupBy("event_type")
        .agg(F.sum(F.bit_count("_mask")).cast("bigint").alias("n_users"))
        .orderBy("event_type")
    )


@declare(
    "q148_weighted_median_price",
    oracle="""
    WITH w AS (
        SELECT l_returnflag,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS price_cents,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem),
    g AS (SELECT l_returnflag, price_cents, SUM(qty) AS wsum
          FROM w GROUP BY l_returnflag, price_cents),
    c AS (SELECT l_returnflag, price_cents,
                 SUM(wsum) OVER (PARTITION BY l_returnflag
                                 ORDER BY price_cents
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cumw,
                 SUM(wsum) OVER (PARTITION BY l_returnflag) AS totw
          FROM g)
    SELECT l_returnflag,
           CAST(MIN(price_cents) AS BIGINT) AS wmedian_cents,
           CAST(MIN(totw) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cumw >= totw
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="WEIGHTED median unit price per return flag (weights = "
    "shipped quantity) — the quantity-weighted center a pricing "
    "report wants, which q53's unweighted percentiles can't express. "
    "Exact weighted set-selection: per (flag, price) the weights "
    "partial-agg first (shuffle = distinct prices per flag, not "
    "line items), then the smallest price whose cumulative weight "
    "reaches half the total — integer 2*cumw >= totw, no "
    "interpolation, no floats (quantities are integral, prices "
    "exact cents). The cumulative window runs over the aggregated "
    "price table only; at extreme price cardinality, bucket prices "
    "first (q136's bounded-table argument).",
    tags=("agg", "window", "tpch"),
)
def q148(spark: SparkSession, sf: str) -> DataFrame:
    from kaflow_spark.operators.curation import weighted_median

    l = load(spark, sf, "lineitem").select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    # r14: the inline (flag, price) grid rollup contracted nothing on
    # near-unique prices (594k grid rows / 600k inputs) and funneled
    # every row through 3 single-task windows; the shared operator's
    # bucket-parallel selector is value-identical (same percentile_disc
    # semantics) and measured ~2x faster — see weighted_median's
    # docstring for the A/B and the equivalence argument.
    wm = weighted_median(l, "l_returnflag", "price_cents", "qty")
    return (
        wm.select(
            "l_returnflag",
            F.col("wmedian").cast("bigint").alias("wmedian_cents"),
            F.col("total_weight").cast("bigint").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@declare(
    "q149_data_quality_report",
    oracle="""
    WITH base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(COUNT(*) FILTER (l_orderkey IS NULL) AS BIGINT)
                   AS null_ok,
               CAST(COUNT(*) FILTER (l_quantity IS NULL
                     OR l_quantity < 1 OR l_quantity > 50) AS BIGINT)
                   AS bad_qty,
               CAST(COUNT(*) FILTER (l_discount IS NULL
                     OR l_discount < 0 OR l_discount > 0.1) AS BIGINT)
                   AS bad_disc
        FROM lineitem),
    dupkey AS (
        SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS extra
        FROM (SELECT COUNT(*) AS n FROM lineitem
              GROUP BY l_orderkey, l_linenumber) WHERE n > 1),
    orphan AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
    SELECT rule, violations, total FROM (
        SELECT 'orderkey_not_null' AS rule, null_ok AS violations, total
        FROM base
        UNION ALL
        SELECT 'quantity_in_1_50', bad_qty, total FROM base
        UNION ALL
        SELECT 'discount_in_0_0.1', bad_disc, total FROM base
        UNION ALL
        SELECT 'orderkey_linenumber_unique', extra, total
        FROM dupkey, base
        UNION ALL
        SELECT 'orderkey_refs_orders', n, total FROM orphan, base)
    ORDER BY rule
    """,
    doc="Declarative data-quality expectations (the Deequ-style "
    "constraint suite a pipeline gates ingestion on): NOT NULL, "
    "range, composite-key uniqueness, and referential integrity — "
    "each reported as exact violation counts against the row total. "
    "Plan: the three scalar row checks share ONE conditional-agg "
    "scan (a rule per FILTER expression, no per-rule pass); "
    "uniqueness is a two-phase groupBy on the composite key "
    "(violations = sum of duplicates beyond the first); referential "
    "integrity is a LEFT ANTI join against the parent keys. Report "
    "assembly unions five 1-row frames — nothing wide moves twice.",
    tags=("agg", "join", "quality"),
)
def q149(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders").select("o_orderkey")
    base = l.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("null_ok"),
        F.count(
            F.when(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50),
                1,
            )
        ).alias("bad_qty"),
        F.count(
            F.when(
                F.col("l_discount").isNull()
                | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 0.1),
                1,
            )
        ).alias("bad_disc"),
    )
    dup = (
        l.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("extra"))
    )
    orphan = l.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti").agg(
        F.count(F.lit(1)).alias("n")
    )

    def row(rule: str, col: str, frame) -> DataFrame:
        return frame.crossJoin(F.broadcast(base.select("total"))).select(
            F.lit(rule).alias("rule"),
            F.col(col).cast("bigint").alias("violations"),
            F.col("total").cast("bigint").alias("total"),
        ) if frame is not base else base.select(
            F.lit(rule).alias("rule"),
            F.col(col).cast("bigint").alias("violations"),
            F.col("total").cast("bigint").alias("total"),
        )

    return (
        row("orderkey_not_null", "null_ok", base)
        .unionAll(row("quantity_in_1_50", "bad_qty", base))
        .unionAll(row("discount_in_0_0.1", "bad_disc", base))
        .unionAll(row("orderkey_linenumber_unique", "extra", dup))
        .unionAll(row("orderkey_refs_orders", "n", orphan))
        .orderBy("rule")
    )
