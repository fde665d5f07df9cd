"""Declared relational queries Q1-Q28 (SURVEY §2B).

Spark side is DataFrame-API-first so Catalyst gets a fully declarative
plan (pushdown, pruning, join selection, AQE all apply); spark.sql is
used where SQL is the natural surface (subqueries). Oracle strings are
DuckDB dialect over the same parquet tables (pre-registered views).

Scale notes are inline per query: which joins broadcast, where the
shuffle lands, and why the plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType
from pyspark.sql.window import Window as W

from kaflow_spark.catalog import load
from kaflow_spark.queries.base import dec, declare, ts_lit

# --------------------------------------------------------------- scans


@declare(
    "q01_scan_project",
    oracle="SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    doc="Parquet scan + projection; column pruning reaches the reader.",
    tags=("scan",),
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "region")
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
    )


# ------------------------------------------------- projection / filter


@declare(
    "q02_filter_project",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    ORDER BY o_orderkey
    """,
    doc="Conjunctive filter; predicates push into the parquet scan.",
    tags=("filter",),
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return (
        o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@declare(
    "q03_in_between_like",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 20
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="IN / BETWEEN / timestamp predicates, all pushdown-eligible.",
    tags=("filter",),
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    return (
        l.filter(
            F.col("l_returnflag").isin("A", "R")
            & F.col("l_quantity").between(10, 20)
            & (F.col("l_shipdate") >= ts_lit(l, "l_shipdate", "1995-01-01 00:00:00"))
        )
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@declare(
    "q04_case_coalesce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderstatus,'O'), 'open') AS st
    FROM orders ORDER BY o_orderkey
    """,
    doc="Conditional + null-handling scalar expressions.",
    tags=("filter",),
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "st"
        ),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------- joins


@declare(
    "q05_join_dim_chain",
    oracle="""
    SELECT c_custkey, n_name, r_name FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    ORDER BY c_custkey
    """,
    doc="3-way dim chain; both dims broadcast — zero shuffle of the fact.",
    tags=("join",),
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    # nation/region are tiny at any SF: broadcast so the (huge) customer
    # side never shuffles.
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
        .orderBy("c_custkey")
    )


@declare(
    "q06_left_outer_join",
    oracle="""
    SELECT c_custkey, o_orderkey FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    ORDER BY c_custkey, o_orderkey NULLS FIRST
    """,
    doc="Left outer join with visible null-extension.",
    tags=("join",),
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    # Fact-to-fact equi-join: shuffled hash / sort-merge on the key —
    # both sides partition by the join key, AQE handles skew.
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "o_orderkey")
        .orderBy(F.col("c_custkey"), F.col("o_orderkey").asc_nulls_first())
    )


@declare(
    "q48_right_full_outer",
    oracle="""
    SELECT 'right' AS side, c_custkey, o_orderkey
    FROM (SELECT * FROM customer WHERE c_custkey <= 50) c
    RIGHT JOIN orders o ON c_custkey = o_custkey
    UNION ALL
    SELECT 'full' AS side, c_custkey, o_orderkey
    FROM (SELECT * FROM customer WHERE c_custkey <= 50) c
    FULL JOIN orders o ON c_custkey = o_custkey
    ORDER BY side, c_custkey NULLS FIRST, o_orderkey NULLS FIRST
    """,
    doc="Right and full outer joins with unmatched rows on both sides "
    "(customer subset vs all orders).",
    tags=("join",),
)
def q48(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    c50 = load(spark, sf, "customer").filter(F.col("c_custkey") <= 50)
    right = c50.join(o, c50.c_custkey == o.o_custkey, "right").select(
        F.lit("right").alias("side"), "c_custkey", "o_orderkey"
    )
    full = c50.join(o, c50.c_custkey == o.o_custkey, "full").select(
        F.lit("full").alias("side"), "c_custkey", "o_orderkey"
    )
    return right.unionAll(full).orderBy(
        "side",
        F.col("c_custkey").asc_nulls_first(),
        F.col("o_orderkey").asc_nulls_first(),
    )


@declare(
    "q07_semi_join",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left semi join (EXISTS rewrite).",
    tags=("join",),
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@declare(
    "q08_anti_join",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    doc="Left anti join (NOT EXISTS rewrite).",
    tags=("join",),
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


@declare(
    "q09_cross_join",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
    doc="Bounded cross join (both sides small; broadcast NLJ).",
    tags=("join",),
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    r = load(spark, sf, "region")
    n = load(spark, sf, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name").orderBy(
        "r_name", "n_name"
    )


@declare(
    "q10_range_theta_join",
    oracle="""
    SELECT s_suppkey, p_partkey FROM supplier
    JOIN part ON p_retailprice BETWEEN s_acctbal - 10 AND s_acctbal + 10
    ORDER BY s_suppkey, p_partkey
    """,
    doc="Non-equi (range) join: broadcast the small side so the big "
    "side streams through a nested-loop probe without shuffling.",
    tags=("join",),
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    s = load(spark, sf, "supplier")
    p = load(spark, sf, "part")
    # supplier is the small side at every SF — broadcast it; part
    # (the larger scan) streams partition-local through the BNLJ.
    return (
        p.join(
            F.broadcast(s),
            F.col("p_retailprice").between(
                F.col("s_acctbal") - 10, F.col("s_acctbal") + 10
            ),
        )
        .select("s_suppkey", "p_partkey")
        .orderBy("s_suppkey", "p_partkey")
    )


@declare(
    "q11_asof_groupmax",
    oracle="""
    SELECT user_id, MAX(ts) AS last_ts FROM events
    WHERE ts <= TIMESTAMP '2024-06-01 00:00:00'
    GROUP BY user_id ORDER BY user_id
    """,
    doc="As-of analog: last event at-or-before a cutoff per user "
    "(group-max; a true as-of join lives in operators.asof).",
    tags=("join", "agg"),
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    # ts_max is the loose raw-nanos prefilter (parquet row-group
    # pruning); the exact filter below keeps the declared semantics.
    e = load(spark, sf, "events", ts_max="2024-06-01 00:00:00")
    return (
        e.filter(F.col("ts") <= ts_lit(e, "ts", "2024-06-01 00:00:00"))
        .groupBy("user_id")
        .agg(F.max("ts").alias("last_ts"))
        .orderBy("user_id")
    )


# -------------------------------------------------------- aggregations


@declare(
    "q12_tpch_q1_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           COUNT(*) AS cnt
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape. Decimal-cast before agg => exact, shuffle-order"
    "-independent sums; HashAggregate does partial+final automatically. "
    "Final values are cast DECIMAL->DOUBLE on BOTH sides (one correctly-"
    "rounded IEEE op on identical exact inputs) because pandas "
    "canonicalizers render engine decimals differently; avg is stated "
    "as exact-sum / count in double, never engine-native AVG(DECIMAL) "
    "(DuckDB computes that in double internally, Spark in decimal).",
    tags=("agg",),
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    one = F.lit(1).cast(DecimalType(18, 2))
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= ts_lit(l, "l_shipdate", "1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base"),
            F.sum(dec("l_extendedprice") * (one - dec("l_discount")))
            .cast("double")
            .alias("sum_disc"),
            (F.sum(dec("l_quantity")).cast("double") / n.cast("double")).alias(
                "avg_qty"
            ),
            n.alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@declare(
    "q13_global_agg_distinct",
    oracle="""
    SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS nc,
           MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
    FROM orders
    """,
    doc="Ungrouped agg + exact COUNT(DISTINCT) (expand+2-phase in Spark).",
    tags=("agg",),
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "orders").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_custkey").alias("nc"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
    )


@declare(
    "q14_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n FROM orders
    GROUP BY o_custkey HAVING COUNT(*) >= 5 ORDER BY o_custkey
    """,
    doc="HAVING = post-aggregation filter.",
    tags=("agg",),
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
        .orderBy("o_custkey")
    )


def _grouping_agg(df: DataFrame, grouped) -> DataFrame:
    return grouped.agg(
        F.grouping("o_orderstatus").cast("int").alias("g1"),
        F.grouping("o_orderpriority").cast("int").alias("g2"),
        F.count(F.lit(1)).alias("n"),
    ).orderBy(
        "g1",
        "g2",
        F.col("o_orderstatus").asc_nulls_first(),
        F.col("o_orderpriority").asc_nulls_first(),
    )


_GROUPING_ORACLE = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g1,
           CAST(GROUPING(o_orderpriority) AS INT) AS g2,
           COUNT(*) AS n
    FROM orders GROUP BY {sets}(o_orderstatus, o_orderpriority)
    ORDER BY g1, g2, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@declare(
    "q15_rollup",
    oracle=_GROUPING_ORACLE.format(sets="ROLLUP"),
    doc="ROLLUP with GROUPING() disambiguation (Expand under the hood).",
    tags=("agg",),
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return _grouping_agg(o, o.rollup("o_orderstatus", "o_orderpriority"))


@declare(
    "q16_cube",
    oracle=_GROUPING_ORACLE.format(sets="CUBE"),
    doc="CUBE over the same shape as q15.",
    tags=("agg",),
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    return _grouping_agg(o, o.cube("o_orderstatus", "o_orderpriority"))


@declare(
    "q17_group_max",
    oracle="""
    SELECT c_mktsegment, MAX(c_acctbal) AS top_bal FROM customer
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Per-group max (MAX on double is order-independent — safe).",
    tags=("agg",),
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "customer")
        .groupBy("c_mktsegment")
        .agg(F.max("c_acctbal").alias("top_bal"))
        .orderBy("c_mktsegment")
    )


# ------------------------------------------------------------- windows


@declare(
    "q18_rank_rownumber",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
           CAST(NTILE(4) OVER w AS BIGINT) AS nt
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, rn
    """,
    doc="Ranking window fns; unique-key tie-break for determinism. One "
    "shuffle on the partition key, sort within partitions.",
    tags=("window",),
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        load(spark, sf, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rk"),
            F.dense_rank().over(w).cast("bigint").alias("drk"),
            F.ntile(4).over(w).cast("bigint").alias("nt"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@declare(
    "q19_lag",
    oracle="""
    SELECT event_id, user_id,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    doc="Analytic lag/lead/first_value/last_value with unique tie-break"
    " (last_value over the full-partition frame).",
    tags=("window",),
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w_full).alias("final_type"),
        )
        .orderBy("user_id", "event_id")
    )


@declare(
    "q20_moving_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS mv
    FROM events ORDER BY user_id, event_id
    """,
    doc="Moving sum over a ROWS frame, decimal-cast for exactness; the "
    "final DECIMAL->DOUBLE cast (both sides) avoids engine-specific "
    "decimal rendering in pandas canonicalizers.",
    tags=("window",),
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            "user_id",
            F.sum(dec("value", 18, 4)).over(w).cast("double").alias("mv"),
        )
        .orderBy("user_id", "event_id")
    )


# ----------------------------------------------------- sort/limit/topk


@declare(
    "q21_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Top-k: ORDER BY+LIMIT plans as TakeOrderedAndProject (per-"
    "partition heaps, no global sort — O(k) driver transfer).",
    tags=("sort",),
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# ------------------------------------------------------------- set ops


@declare(
    "q22_set_ops",
    oracle="""
    SELECT 'union' AS op, x FROM (
        SELECT n_regionkey AS x FROM nation UNION SELECT r_regionkey AS x FROM region)
    UNION ALL
    SELECT 'intersect' AS op, x FROM (
        SELECT n_nationkey AS x FROM nation WHERE n_nationkey < 15
        INTERSECT
        SELECT n_nationkey AS x FROM nation WHERE n_nationkey >= 5)
    UNION ALL
    SELECT 'except' AS op, x FROM (
        SELECT n_nationkey AS x FROM nation
        EXCEPT
        SELECT n_nationkey AS x FROM nation WHERE n_nationkey >= 10)
    ORDER BY op, x
    """,
    doc="UNION(distinct) / INTERSECT / EXCEPT, tagged into one result.",
    tags=("setop",),
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    u = (
        n.select(F.col("n_regionkey").alias("x"))
        .union(r.select(F.col("r_regionkey").alias("x")))
        .distinct()
        .select(F.lit("union").alias("op"), "x")
    )
    i = (
        n.filter(F.col("n_nationkey") < 15)
        .select(F.col("n_nationkey").alias("x"))
        .intersect(n.filter(F.col("n_nationkey") >= 5).select(F.col("n_nationkey").alias("x")))
        .select(F.lit("intersect").alias("op"), "x")
    )
    e = (
        n.select(F.col("n_nationkey").alias("x"))
        .exceptAll(
            n.filter(F.col("n_nationkey") >= 10).select(F.col("n_nationkey").alias("x"))
        )
        .distinct()
        .select(F.lit("except").alias("op"), "x")
    )
    return u.unionAll(i).unionAll(e).orderBy("op", "x")


# ---------------------------------------------------- scalar functions


@declare(
    "q23_string_funcs",
    oracle="""
    SELECT p_partkey, UPPER(p_brand) AS b, LOWER(p_type) AS lo,
           CAST(LENGTH(p_name) AS INT) AS ln,
           SUBSTRING(p_type, 1, 5) AS t5, REPLACE(p_name, ' ', '_') AS nm,
           TRIM(CONCAT(' ', p_name, ' ')) AS tr,
           LPAD(p_brand, 12, '*') AS lp,
           CONCAT(p_brand, '#', p_type) AS cc,
           CAST(INSTR(p_name, 'green') AS INT) AS ix
    FROM part WHERE p_name LIKE '%green%' ORDER BY p_partkey
    """,
    doc="String function family over a LIKE-filtered scan.",
    tags=("scalar",),
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "part")
        .filter(F.col("p_name").like("%green%"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("b"),
            F.lower("p_type").alias("lo"),
            F.length("p_name").cast("int").alias("ln"),
            F.substring("p_type", 1, 5).alias("t5"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("nm"),
            F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("tr"),
            F.lpad("p_brand", 12, "*").alias("lp"),
            F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("cc"),
            F.instr(F.col("p_name"), "green").cast("int").alias("ix"),
        )
        .orderBy("p_partkey")
    )


@declare(
    "q24_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mth,
           CAST(o_orderdate AS DATE) AS dt,
           CAST(epoch_us(o_orderdate) // 1000000 AS BIGINT) AS ep
    FROM orders ORDER BY o_orderkey
    """,
    doc="Date/time extraction + truncation + to_date + epoch seconds "
    "(month-truncate as DATE — both dialects agree at the day grain; "
    "epoch via exact integer micros, session TZ is UTC).",
    tags=("scalar",),
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
            F.dayofmonth("o_orderdate").cast("int").alias("d"),
            F.trunc(F.col("o_orderdate"), "month").alias("mth"),
            F.to_date("o_orderdate").alias("dt"),
            F.unix_timestamp(F.col("o_orderdate")).alias("ep"),
        )
        .orderBy("o_orderkey")
    )


@declare(
    "q25_math_funcs",
    oracle="""
    SELECT p_partkey,
           CAST(ABS(p_size - 25) AS INT) AS a,
           CAST(CEIL(p_retailprice) AS BIGINT) AS c,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS f,
           CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS r,
           CAST(POW(2, p_size % 10) AS BIGINT) AS p,
           SQRT(p_retailprice) AS sq
    FROM part ORDER BY p_partkey
    """,
    doc="Math family. ROUND goes through DECIMAL so half-up semantics "
    "are identical across engines (double rounding is repr-dependent), "
    "then casts DOUBLE for canonicalizer-stable output; SQRT is "
    "IEEE-correctly-rounded in both engines so it needs no rounding.",
    tags=("scalar",),
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "part")
        .select(
            "p_partkey",
            F.abs(F.col("p_size") - 25).cast("int").alias("a"),
            F.ceil("p_retailprice").cast("bigint").alias("c"),
            F.floor("p_retailprice").cast("bigint").alias("f"),
            F.round(dec("p_retailprice"), 1).cast("double").alias("r"),
            F.pow(F.lit(2), F.col("p_size") % 10).cast("bigint").alias("p"),
            F.sqrt("p_retailprice").alias("sq"),
        )
        .orderBy("p_partkey")
    )


@declare(
    "q26_array_funcs",
    oracle="""
    SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(list_aggregate(embedding[1:3], 'min') AS DOUBLE) AS m3,
           list_contains(embedding, 0.0) AS z
    FROM embeddings ORDER BY vec_id
    """,
    doc="Array functions over array<float> embeddings (1-based "
    "element_at, slice+sort-min, membership in both dialects). "
    "float->double widening is exact, so raw values hash identically "
    "with no rounding.",
    tags=("scalar", "array"),
)
def q26(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "embeddings")
        .select(
            "vec_id",
            F.size("embedding").cast("int").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("e1"),
            F.array_min(F.slice("embedding", 1, 3)).cast("double").alias("m3"),
            F.array_contains("embedding", F.lit(0.0).cast("float")).alias("z"),
        )
        .orderBy("vec_id")
    )


@declare(
    "q27_json_funcs",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.device') AS device,
           json_extract_string(props, '$.k') AS kstr
    FROM events ORDER BY event_id
    """,
    doc="JSON point extraction from a string column (present and "
    "missing paths).",
    tags=("scalar", "json"),
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    # json_tuple parses the document ONCE for both paths (two
    # get_json_object calls would parse twice)
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            F.json_tuple(F.col("props"), "device", "k").alias("device", "kstr"),
        )
        .orderBy("event_id")
    )


@declare(
    "q45_json_typed_struct",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events ORDER BY event_id
    """,
    doc="Schema-typed JSON decode (from_json with a declared struct — "
    "the engine's serde fast path) vs point extraction + cast.",
    tags=("scalar", "json"),
)
def q45(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            F.from_json(F.col("props"), "k INT")["k"].alias("k"),
        )
        .orderBy("event_id")
    )


# ----------------------------------------------------------- subquery


_Q49_SQL = """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 2 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE)
        FROM orders)
    ORDER BY o_orderkey
"""


@declare(
    "q49_scalar_subquery",
    oracle=_Q49_SQL,
    doc="Uncorrelated scalar subquery: the global average computes "
    "once and broadcasts into the filter (no per-row work). The avg "
    "is stated as exact-decimal-sum / count in double — engine-native "
    "AVG(DECIMAL) accumulates differently across engines, which could "
    "flip rows sitting exactly at the threshold.",
    tags=("subquery",),
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q49_SQL)


@declare(
    "q28_correlated_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_orderkey
    """,
    doc="Correlated scalar subquery — Catalyst decorrelates to an "
    "aggregate+join; no per-row re-execution. Avg stated as exact-sum "
    "/ count in double for cross-engine threshold determinism.",
    tags=("subquery",),
)
def q28(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o_totalprice > (
            SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE)
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey
        """
    )
