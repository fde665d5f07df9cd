"""Declared TPC-H classic multi-join queries q101-q117, q123, q128
(SURVEY §2B).

Adapted TPC-H Q3/Q4/Q5/Q6/Q7/Q8/Q9/Q10/Q12/Q13/Q14/Q15/Q16/Q17/Q18/
Q19/Q20/Q21/Q22 over the TPC-H-ish
synthetic tables (columns the fixture lacks — o_shippriority,
l_commitdate, partsupp — are omitted or re-expressed; constants are
re-picked for the fixture's 1995-2001 date range and NATION_n names).
These exercise the join-planning surface the single-table queries
can't: multi-fact shuffle joins, broadcast dim chains, semi-join
subqueries, and conditional-aggregate market-share division.

Scale notes inline per query. Determinism follows q12's discipline:
DECIMAL(18,2) casts before SUM so partial aggregation is exact and
shuffle-order-independent, one final DECIMAL->DOUBLE cast on BOTH
engines, unique-key ORDER BY tie-breaks before every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from kaflow_spark.catalog import load
from kaflow_spark.queries.base import dec, declare, ts_lit

# Exact order-independent revenue term: DECIMAL(18,2) price x (1 - DECIMAL
# discount); the product widens identically in both engines. Built lazily
# (Column construction needs an active SparkContext).


def _one() -> F.Column:
    return F.lit(1).cast(DecimalType(18, 2))


def _revenue() -> F.Column:
    return F.sum(dec("l_extendedprice") * (_one() - dec("l_discount"))).cast("double")


_REV_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)


@declare(
    "q101_tpch_q3_shipping",
    oracle=f"""
    SELECT l_orderkey, {_REV_SQL} AS revenue, o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping-priority shape. Orders x customer shuffle on "
    "custkey (both sides pre-filtered at the scan), then x lineitem on "
    "orderkey; the groupBy key equals the second join key so the final "
    "aggregate reuses that exchange (no extra shuffle). Top-10 runs as "
    "TakeOrderedAndProject — per-partition heaps, no global sort.",
    tags=("join", "agg", "tpch"),
)
def q101(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    l = load(spark, sf, "lineitem")
    cut_o = ts_lit(o, "o_orderdate", "1997-03-15 00:00:00")
    cut_l = ts_lit(l, "l_shipdate", "1997-03-15 00:00:00")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .join(
            o.filter(F.col("o_orderdate") < cut_o).select(
                "o_orderkey", "o_custkey", "o_orderdate"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            l.filter(F.col("l_shipdate") > cut_l).select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_revenue().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@declare(
    "q102_tpch_q5_local_supplier",
    oracle=f"""
    SELECT n_name, {_REV_SQL} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 local-supplier-volume shape. nation x region broadcast "
    "into supplier (region filter prunes suppliers to one region before "
    "any fact shuffles); lineitem x orders shuffle on orderkey, then "
    "customer on custkey; the c_nationkey = s_nationkey co-location "
    "predicate rides the supplier join. Final |nations|-row aggregate is "
    "partial-agg'd map-side.",
    tags=("join", "agg", "tpch"),
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = (
        load(spark, sf, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        load(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = load(spark, sf, "orders")
    lo = ts_lit(o, "o_orderdate", "1996-01-01 00:00:00")
    hi = ts_lit(o, "o_orderdate", "1998-01-01 00:00:00")
    o = o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)).select(
        "o_orderkey", "o_custkey"
    )
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    l = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@declare(
    "q103_tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
           {_REV_SQL} AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1998-12-31 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 volume-shipping shape: bilateral nation-pair trade by "
    "ship year. Both nation copies broadcast (supplier- and customer-"
    "side); the pair disjunction is applied after both dims attach, so "
    "Catalyst pushes each half into its broadcast-join build side. "
    "Fact-fact shuffles: lineitem x orders on orderkey, x customer on "
    "custkey — the minimum for this query graph.",
    tags=("join", "agg", "tpch"),
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    nat = load(spark, sf, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf, "lineitem")
    lo = ts_lit(l, "l_shipdate", "1996-01-01 00:00:00")
    hi = ts_lit(l, "l_shipdate", "1998-12-31 00:00:00")
    l = l.filter(F.col("l_shipdate").between(lo, hi)).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_revenue().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@declare(
    "q104_tpch_q8_market_share",
    oracle=f"""
    WITH all_nations AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1998-12-31 00:00:00')
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                AS DOUBLE) / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_nations GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 national-market-share shape. Part filter broadcasts "
    "into lineitem (biggest fact pruned first); customer-side nation x "
    "region broadcast restricts to one region; share = conditional "
    "exact-decimal SUM / total SUM, both cast to double for ONE "
    "correctly-rounded IEEE division per year on identical inputs. "
    "ELSE 0 (not NULL-skip) so a year without the target nation yields "
    "0.0 in both engines.",
    tags=("join", "agg", "tpch"),
)
def q104(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").filter(F.col("p_type") == "STANDARD").select("p_partkey")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf, "nation")
    r = load(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    n1 = (
        nat.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("n1_key"))
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    o = load(spark, sf, "orders")
    lo = ts_lit(o, "o_orderdate", "1996-01-01 00:00:00")
    hi = ts_lit(o, "o_orderdate", "1998-12-31 00:00:00")
    o = o.filter(F.col("o_orderdate").between(lo, hi)).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    l = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = dec("l_extendedprice") * (_one() - dec("l_discount"))
    zero = F.lit(0).cast(DecimalType(18, 2))
    all_n = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"), "inner")
        .join(
            F.broadcast(s.join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    return (
        all_n.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@declare(
    "q105_tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {_REV_SQL} AS revenue, c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item-reporting shape. Returnflag + date "
    "predicates push into both fact scans; nation broadcasts onto the "
    "customer side; group key starts with c_custkey so the customer-"
    "join exchange is reused by the aggregate. Top-20 via "
    "TakeOrderedAndProject with the unique c_custkey tie-break.",
    tags=("join", "agg", "tpch"),
)
def q105(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf, "orders")
    lo = ts_lit(o, "o_orderdate", "1997-01-01 00:00:00")
    hi = ts_lit(o, "o_orderdate", "1997-07-01 00:00:00")
    o = o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)).select(
        "o_orderkey", "o_custkey"
    )
    l = (
        load(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@declare(
    "q106_tpch_q18_big_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 280) big
      ON o_orderkey = big.l_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 large-volume-customer shape. The IN-subquery is "
    "expressed as a reusable aggregate: lineitem partial-aggs map-side "
    "to |orders| rows, HAVING prunes to the big tail, and that tiny "
    "result joins orders (AQE broadcasts it) — no second pass over "
    "lineitem, unlike the literal IN + re-aggregation plan.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q106(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > F.lit(280).cast(DecimalType(18, 2)))
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("sum_qty"))
    )
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@declare(
    "q107_tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 order-priority shape (l_commitdate is absent in the "
    "fixture, so 'late' = shipped >60 days after order date). The "
    "correlated EXISTS compiles to a LEFT SEMI shuffle join on "
    "orderkey; the non-equi ship-lag predicate evaluates inside the "
    "semi join (no explode, at most one match probe per order). "
    "|priorities|-row aggregate partial-aggs map-side.",
    tags=("join", "subquery", "tpch"),
)
def q107(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    lo = ts_lit(o, "o_orderdate", "1997-01-01 00:00:00")
    hi = ts_lit(o, "o_orderdate", "1997-04-01 00:00:00")
    o = o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@declare(
    "q108_tpch_q13_cust_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) cc
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 customer-distribution shape (the comment-LIKE filter "
    "is re-expressed on o_orderpriority). Outer join with the predicate "
    "ON the join (not WHERE — that would turn it inner); COUNT(col) "
    "counts matches only. Two aggregates: per-customer on the join key "
    "(exchange reuse), then the tiny histogram groupBy.",
    tags=("join", "agg", "tpch"),
)
def q108(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select("c_custkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@declare(
    "q109_tpch_q14_promo_share",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         * 100 AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
    """,
    doc="TPC-H Q14 promotion-effect shape. Part (the only dim) "
    "broadcasts into the date-pruned lineitem scan; both sums are exact "
    "decimal, the share is ONE double division + ONE multiplication on "
    "identical inputs in both engines — order-independent end to end.",
    tags=("join", "agg", "tpch"),
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").select("p_partkey", "p_type")
    l = load(spark, sf, "lineitem")
    lo = ts_lit(l, "l_shipdate", "1997-01-01 00:00:00")
    hi = ts_lit(l, "l_shipdate", "1997-02-01 00:00:00")
    l = l.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)).select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    vol = dec("l_extendedprice") * (_one() - dec("l_discount"))
    zero = F.lit(0).cast(DecimalType(18, 2))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(vol).cast("double")
                * 100
            ).alias("promo_share")
        )
    )


@declare(
    "q110_tpch_q17_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    doc="TPC-H Q17 small-quantity-order shape. The correlated AVG "
    "decorrelates to a per-part aggregate of the WHOLE lineitem table "
    "joined back on partkey; quantities are small integers in double "
    "(exact < 2^53), so sum/count and the 0.5x threshold are bit-equal "
    "across engines. Brand filter broadcasts; the per-part avg is "
    "partial-agg'd map-side before its one |parts|-row shuffle.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q110(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = (
        load(spark, sf, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    avg_qty = (
        l.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((F.lit(0.5) * F.avg("l_quantity")).alias("half_avg"))
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(avg_qty), F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@declare(
    "q111_tpch_q19_disjunctive",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 disjunctive-predicate shape. Catalyst extracts the "
    "common l_quantity range [1,40] and the brand IN-list as conjunctive "
    "pushdowns below the join (CNF conversion), so both scans prune "
    "before the broadcast join; the full disjunction re-evaluates above.",
    tags=("join", "agg", "tpch"),
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    l = load(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(_revenue().alias("revenue"))
    )


@declare(
    "q112_tpch_q22_global_sales_opportunity",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM (SELECT c_nationkey % 10 AS cntrycode, c_acctbal
          FROM customer
          WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                             WHERE c_acctbal > 0)
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderstatus = 'O')) x
    GROUP BY cntrycode ORDER BY cntrycode
    """,
    doc="TPC-H Q22 sales-opportunity shape (cntrycode = nationkey mod "
    "10; 'no orders' = no OPEN orders so the fixture yields rows). The "
    "scalar AVG subquery is a 1-row broadcast; NOT EXISTS plans as a "
    "LEFT ANTI shuffle join against the status-pruned orders scan. "
    "acctbal means: threshold AVG is double (exact 2-decimal inputs), "
    "final sums decimal-exact.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    o = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    thr = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("thr"))
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select(
            (F.col("c_nationkey") % 10).alias("cntrycode"), "c_acctbal"
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@declare(
    "q113_tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecasting-revenue-change shape: the pure-scan "
    "aggregate. All three predicates push into the parquet reader "
    "(range + two numeric bounds); the whole query is one "
    "WholeStageCodegen span ending in a 1-row partial+final agg — "
    "the best case Spark has, and the shape that proves predicate "
    "pushdown carries the query at 100 TB.",
    tags=("agg", "tpch"),
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    lo = ts_lit(l, "l_shipdate", "1997-01-01 00:00:00")
    hi = ts_lit(l, "l_shipdate", "1998-01-01 00:00:00")
    return (
        l.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


@declare(
    "q114_tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS tr
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE tr = (SELECT MAX(tr) FROM rev)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 top-supplier shape (the revenue VIEW becomes a CTE). "
    "The max-equality test runs on EXACT decimal totals — safe where a "
    "double comparison would be engine-dependent. The rev aggregate's "
    "exchange is shared by the max branch (ReusedExchange), and the "
    "1-row max broadcasts back; supplier joins the few-row winners "
    "list, also broadcast.",
    tags=("agg", "subquery", "tpch"),
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    lo = ts_lit(l, "l_shipdate", "1997-01-01 00:00:00")
    hi = ts_lit(l, "l_shipdate", "1997-04-01 00:00:00")
    # The explicit isNotNull(l_suppkey) is load-bearing: the supplier
    # equi-join infers it onto the join branch only, which would
    # de-canonicalize the two rev subtrees and defeat ReusedExchange
    # (lineitem scanned + aggregated twice). In the shared subtree it
    # costs nothing (cheap column test, subsumed by the inference) and
    # keeps both branches identical.
    rev = (
        l.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_extendedprice") * (_one() - dec("l_discount"))).alias("tr"))
    )
    mx = rev.agg(F.max("tr").alias("mx"))
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        # Null-safe equality on purpose (q100's lesson): a bare == lets
        # the optimizer infer isnotnull(tr) on this branch only, which
        # de-canonicalizes the two rev subtrees and defeats
        # ReusedExchange — lineitem then scans and aggregates twice.
        # tr and mx are never null (non-empty groups), so <=> is
        # result-identical to the oracle's =.
        .filter(F.col("tr").eqNullSafe(F.col("mx")))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("tr").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@declare(
    "q115_tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 product-type-profit shape (no partsupp table in the "
    "fixture, so profit omits supplycost). The p_name LIKE filter "
    "broadcasts the surviving part keys into the lineitem scan FIRST "
    "(biggest fact pruned before the orders shuffle); supplier+nation "
    "broadcast; one fact-fact shuffle on orderkey. Output is "
    "|nations| x |years| rows from a partial-agg'd groupBy.",
    tags=("join", "agg", "tpch"),
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    p = (
        load(spark, sf, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    l = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(_revenue().alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@declare(
    "q116_tpch_q21_waiting_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o2.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 suppliers-who-kept-orders-waiting shape ('late' = "
    "shipped >90 days after order date; l_commitdate/receiptdate are "
    "absent). r14 rewrite: the EXISTS/NOT-EXISTS pair is evaluated as "
    "per-order supplier counts off ONE lineitem pass — contract to "
    "(orderkey, suppkey, late-line count, any-late), then a window "
    "over the orderkey partition (which REUSES the contraction's "
    "exchange) reads off n_suppliers and n_late_suppliers; a late "
    "row qualifies iff n_suppliers >= 2 (the EXISTS: someone else in "
    "the order) and n_late_suppliers == 1 (the NOT EXISTS: nobody "
    "else late). numwait = sum of qualifying late-line counts per "
    "supplier. The decorrelated semi+anti form scanned lineitem 3x "
    "and orders 2x with a SortMergeJoin (7 scans); this is 4 scans "
    "(one per table), the F-filtered orders projection broadcasts, "
    "and lineitem's only exchange is the contraction (interleaved "
    "best-of-5: 1.40/1.54 -> 1.23/1.01 s). Top-10 with unique "
    "s_name tie-break.",
    tags=("join", "subquery", "tpch", "window"),
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    nations = [
        "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5",
    ]
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    su = load(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    na = (
        load(spark, sf, "nation")
        .filter(F.col("n_name").isin(nations))
        .select("n_nationkey")
    )
    j = li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("_late"),
    )
    per = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(F.col("_late").cast("long")).alias("_n_late_lines"),
        F.max(F.col("_late")).alias("_any_late"),
    )
    wo = Window.partitionBy("l_orderkey")
    per2 = per.select(
        "l_orderkey",
        "l_suppkey",
        "_n_late_lines",
        "_any_late",
        F.count(F.lit(1)).over(wo).alias("_n_supp"),
        F.sum(F.col("_any_late").cast("long")).over(wo).alias("_n_late_supp"),
    )
    qual = per2.filter(
        F.col("_any_late")
        & (F.col("_n_supp") >= 2)
        & (F.col("_n_late_supp") == 1)
    )
    sup = su.join(
        F.broadcast(na), su["s_nationkey"] == na["n_nationkey"]
    ).select("s_suppkey", "s_name")
    return (
        qual.join(F.broadcast(sup), qual["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.sum("_n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@declare(
    "q117_tpch_q12_priority_lines",
    oracle="""
    -- CAST: DuckDB SUM over int is HUGEINT, which pandas renders as
    -- float64 ("770.0") and the driver's stringified hash mismatches
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 shipping-modes-and-priority shape (no l_shipmode "
    "column: lines group by returnflag, lateness = shipped >60 days "
    "after order). One shuffle join on orderkey with the non-equi "
    "lateness predicate evaluated inside it; the priority splits are "
    "conditional integer counters, partial-agg'd to |returnflag| rows.",
    tags=("join", "agg", "tpch"),
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    lo = ts_lit(o, "o_orderdate", "1997-01-01 00:00:00")
    hi = ts_lit(o, "o_orderdate", "1998-01-01 00:00:00")
    o = o.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@declare(
    "q123_tpch_q16_supplier_cnt",
    oracle="""
    WITH partsupp AS (
        SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem),
    excluded AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 parts/supplier relationship shape. The fixture has "
    "no partsupp table, so the part-supplier relation is DERIVED from "
    "the (l_partkey, l_suppkey) pairs actually traded — the same "
    "relation Q16 interrogates; the complaints exclusion becomes "
    "an acctbal threshold (the fixture has no s_comment). Plan (r15): "
    "COUNT(DISTINCT supplier) is duplicate-invariant, so the explicit "
    "pair-derivation DISTINCT (a full 16-byte-pair exchange) is "
    "dropped; part broadcasts with brand/type/size predicates pushed "
    "to its scan and the NOT-IN (non-null key) decorrelates to a "
    "broadcast LEFT ANTI, BOTH below the first exchange, so only "
    "part-matching rows shuffle, map-side partially deduplicated by "
    "Spark's two-phase distinct-aggregate expansion — no "
    "single-partition stage anywhere.",
    tags=("join", "agg", "tpch"),
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    # r15: the (partkey, suppkey) DISTINCT derivation was redundant —
    # COUNT(DISTINCT suppkey) is duplicate-invariant, so raw lineitem
    # rows feed the distinct-aggregate directly and the derivation's
    # full-pair exchange disappears. The part predicate (broadcast
    # inner join, 1:1 on partkey) and the supplier exclusion
    # (broadcast anti) both apply BEFORE the first exchange, so only
    # matching rows shuffle, map-side partially deduplicated on
    # (brand, type, size, suppkey) (guide §2.3/§2.4). Exchanges over
    # lineitem-derived rows: 3 -> 2, and the first is part-filtered.
    ps = load(spark, sf, "lineitem").select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    )
    p = (
        load(spark, sf, "part")
        .filter(
            (F.col("p_brand") != "Brand#13")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = (
        load(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 500)
        .select(F.col("s_suppkey").alias("ps_suppkey"))
    )
    return (
        ps.join(F.broadcast(excluded), "ps_suppkey", "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@declare(
    "q128_tpch_q20_dominant_supplier",
    oracle="""
    WITH pq AS (
        SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey),
    tot AS (SELECT l_partkey, SUM(sq) AS tq FROM pq GROUP BY l_partkey),
    dominant AS (
        SELECT DISTINCT pq.l_suppkey
        FROM pq
        JOIN tot USING (l_partkey)
        JOIN part ON p_partkey = pq.l_partkey
        WHERE p_name LIKE '%widget%' AND 2 * pq.sq > tot.tq)
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 potential-part-promotion shape, fixture-adapted: "
    "the fixture has no ps_availqty, so 'excess stock' becomes "
    "'dominant supplier' — suppliers shipping MORE THAN HALF of a "
    "widget-part's 1997 volume (same double-nested-aggregate + "
    "semi-join-chain shape). Determinism: quantities are integers in "
    "double, so sums and the 2*sq > tq test are exact. Plan: the "
    "per-(part,supp) aggregate feeds BOTH the per-part total and the "
    "dominance join — a diamond whose shared exchange must be reused "
    "(q114's lesson applied from the start: explicit isNotNull on the "
    "join keys in the shared subtree so inferred constraints cannot "
    "de-canonicalize the branches); part broadcasts with the LIKE "
    "pushed; the winners list reaches supplier as a broadcast LEFT "
    "SEMI; nation broadcasts.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q128(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    lo = ts_lit(l, "l_shipdate", "1997-01-01 00:00:00")
    hi = ts_lit(l, "l_shipdate", "1998-01-01 00:00:00")
    pq = (
        l.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & F.col("l_partkey").isNotNull()
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    tot = pq.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    widget = (
        load(spark, sf, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    dominant = (
        pq.join(tot, "l_partkey")
        .join(F.broadcast(widget), F.col("p_partkey") == F.col("l_partkey"))
        .filter(2 * F.col("sq") > F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        s.join(
            F.broadcast(dominant),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@declare(
    "q129_tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey),
    eu AS (
        SELECT ps_partkey, ps_cost, s_acctbal, s_name, n_name
        FROM ps
        JOIN part ON p_partkey = ps_partkey AND p_type = 'LARGE'
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
    mn AS (SELECT ps_partkey, MIN(ps_cost) AS min_cost
           FROM eu GROUP BY ps_partkey)
    SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
           CAST(ps_cost AS DOUBLE) AS supply_cost
    FROM eu
    JOIN mn USING (ps_partkey)
    WHERE ps_cost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 minimum-cost-supplier shape, fixture-adapted: the "
    "fixture has no partsupp, so supply cost is derived as the minimum "
    "unit price each supplier ever charged for the part "
    "(MIN(l_extendedprice) per (partkey, suppkey) — exact DECIMAL, "
    "order-independent). The correlated MIN subquery becomes a self "
    "diamond over the derived relation: per-part MIN on one branch, the "
    "row branch equi-joined on (partkey, cost = min_cost). Plan (r15): "
    "part (LIKE-free type filter) and the region-pruned supplier key "
    "set push BELOW the aggregate as broadcast LEFT SEMI joins — both "
    "predicates are on group keys, so values are untouched while the "
    "per-(part,supp) aggregate's lineitem shuffle carries only "
    "LARGE-part EUROPE-supplier rows; the shuffle is built once and "
    "ReusedExchange feeds both branches (the branches re-run only the "
    "cheap agg above it). The cost equality is null-safe (coalesce) so "
    "InferFiltersFromConstraints cannot add isnotnull(ps_cost) to one "
    "branch and de-canonicalize the diamond (q114's lesson); the join "
    "keys carry explicit isNotNull at the lineitem scan. Top-100 = "
    "TakeOrderedAndProject, no global sort. At extreme SF the supplier "
    "broadcast flips to a shuffle join — the hint is advisory, the "
    "plan shape otherwise unchanged.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q129(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    large = (
        load(spark, sf, "part")
        .filter(F.col("p_type") == "LARGE")
        .select("p_partkey")
    )
    sup = (
        load(spark, sf, "supplier")
        .join(
            F.broadcast(
                load(spark, sf, "nation")
                .join(
                    F.broadcast(
                        load(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    # r15 (guide §2.3 — shuffle fewer bytes): both predicates are on
    # the GROUP KEYS (partkey / suppkey), so pushing them below the
    # per-(part,supp) MIN as broadcast LEFT SEMI joins is
    # value-preserving — the aggregate's lineitem exchange now carries
    # only LARGE-part, EUROPE-supplier rows instead of the full table.
    # Both semi-joins live in the SHARED subtree (the mn branch and
    # the row branch read the same ps), so the diamond's
    # ReusedExchange is untouched.
    ps = (
        l.filter(F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull())
        .join(
            F.broadcast(large),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            F.broadcast(sup.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(dec("l_extendedprice")).alias("ps_cost"))
    )
    eu = (
        ps.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            "ps_cost",
            "s_acctbal",
            "s_name",
            "n_name",
        )
    )
    mn = eu.groupBy("ps_partkey").agg(F.min("ps_cost").alias("min_cost"))
    neg = F.lit(-1).cast(DecimalType(18, 2))
    return (
        eu.withColumnRenamed("ps_partkey", "p_partkey")
        .join(
            mn,
            (F.col("p_partkey") == F.col("ps_partkey"))
            # Null-safe on purpose: ps_cost is never null (MIN over a
            # non-null cast), and a bare equality would let
            # InferFiltersFromConstraints push isnotnull(ps_cost) into
            # the row branch only, splitting the diamond (see q100).
            & (F.coalesce(F.col("ps_cost"), neg) == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("ps_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@declare(
    "q130_tpch_q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY l_partkey),
    cents AS (
        SELECT l_partkey, part_value,
               CAST(part_value * 100 AS BIGINT) AS pv_cents
        FROM val),
    tot AS (SELECT COUNT(*) AS cnt, SUM(pv_cents) AS total_cents FROM cents)
    SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM cents, tot
    WHERE 2 * CAST(pv_cents AS DECIMAL(38,0)) * cnt
          > 3 * CAST(total_cents AS DECIMAL(38,0))
    ORDER BY part_value DESC, l_partkey
    """,
    doc="TPC-H Q11 important-stock shape, fixture-adapted: part 'value' "
    "is the summed extended price shipped by EUROPE suppliers (no "
    "ps_availqty in the fixture), and the TPC-H scale-dependent "
    "FRACTION becomes a scale-invariant 'above 1.5x the mean part "
    "value' gate so one declared SQL holds at every SF. The comparison "
    "is exact integer algebra — cents x counts in DECIMAL(38,0), "
    "2*pv*cnt > 3*total, no IEEE division — so the boundary cannot "
    "flip between engines. Plan: the per-part aggregate's exchange is "
    "the diamond root; the global (cnt, total) scalar reduces it to "
    "ONE row, broadcast back as a cross join, and the null-safe "
    "coalesce on the filter keeps both branches canonically identical "
    "(ReusedExchange, single lineitem scan). The region-pruned "
    "supplier dim broadcasts into the scan-side join, so lineitem "
    "shuffles once, on l_partkey only.",
    tags=("join", "agg", "subquery", "tpch"),
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    sup = (
        load(spark, sf, "supplier")
        .join(
            F.broadcast(
                load(spark, sf, "nation")
                .join(
                    F.broadcast(
                        load(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    cents = (
        l.filter(F.col("l_partkey").isNotNull() & F.col("l_suppkey").isNotNull())
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("part_value"))
        .withColumn("pv_cents", (F.col("part_value") * 100).cast("long"))
    )
    tot = cents.agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pv_cents").alias("total_cents")
    )
    big = DecimalType(38, 0)
    neg = F.lit(-(10**18)).cast(big)
    return (
        cents.crossJoin(F.broadcast(tot))
        # Null-safe on purpose — same ReusedExchange discipline as q100:
        # pv_cents is never null, the sentinel only exists to stop
        # isnotnull inference from de-canonicalizing the shared subtree.
        .filter(
            2 * F.coalesce(F.col("pv_cents").cast(big), neg) * F.col("cnt")
            > 3 * F.col("total_cents").cast(big)
        )
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@declare(
    "q144_yoy_revenue_growth",
    oracle="""
    WITH rev AS (
        SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS BIGINT) AS cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, EXTRACT(year FROM o_orderdate))
    SELECT cur.n_name, cur.yr, cur.cents,
           ((cur.cents - prev.cents) * 10000) // prev.cents AS growth_bp
    FROM rev cur
    JOIN rev prev ON cur.n_name = prev.n_name AND cur.yr = prev.yr + 1
    ORDER BY cur.n_name, cur.yr
    """,
    doc="Year-over-year revenue growth per nation — the shifted-key "
    "SELF-JOIN of an aggregate (prev-period comparison) no other "
    "declared query exercises: the same (nation, year) revenue "
    "aggregate is joined to itself on (nation, year-1). Plan: the "
    "aggregate's exchange is built once and ReusedExchange feeds "
    "both sides (identical subtrees; the +1 shift happens in the "
    "join key ABOVE the shared aggregate). Growth is exact-cents "
    "TRUNCATING integer division via Spark's `div`, which matches "
    "DuckDB's integer `//` exactly INCLUDING negative numerators — "
    "both truncate toward zero (measured: -7 // 2 = -3 in DuckDB, "
    "NOT a floor; a pmod-based floor emulation diverged by one bp "
    "on every shrinking year). Pure bigint arithmetic, no 2^53 "
    "bound.",
    tags=("join", "agg", "window", "tpch"),
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    rev = (
        o.filter(F.col("o_custkey").isNotNull())
        .select(
            "o_custkey",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            (dec("o_totalprice") * 100).cast("long").alias("_cents"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "yr")
        .agg(F.sum("_cents").cast("bigint").alias("cents"))
    )
    # Null-safe year keys on BOTH sides (distinct sentinels so a null
    # year can never spuriously match): a bare `yr == p_yr + 1` lets
    # InferFiltersFromConstraints push isnotnull(yr) into one branch
    # and isnotnull(yr + 1) into the other — asymmetric filters below
    # the shared aggregate, de-canonicalized diamond, orders scanned
    # twice (observed). Coalesced keys are provably non-null, nothing
    # is inferred, and the aggregate's exchange is reused.
    prev = rev.select(
        F.col("n_name").alias("p_name"),
        (F.coalesce(F.col("yr"), F.lit(-(10**6))) + 1).alias("p_yr"),
        F.col("cents").alias("p_cents"),
    )
    return (
        rev.join(
            prev,
            (F.col("n_name") == F.col("p_name"))
            & (F.coalesce(F.col("yr"), F.lit(-999983)) == F.col("p_yr")),
        )
        .withColumn("_num", (F.col("cents") - F.col("p_cents")) * 10000)
        # `div` = exact bigint division truncating toward zero — the
        # semantics DuckDB's integer `//` actually has (measured:
        # -7 // 2 = -3, NOT a floor; a pmod-based floor emulation
        # diverged by one bp on every shrinking year).
        .select(
            "n_name",
            "yr",
            "cents",
            F.expr("_num div p_cents").alias("growth_bp"),
        )
        .orderBy("n_name", "yr")
    )


@declare(
    "q145_basket_affinity",
    oracle="""
    WITH dp AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    pairs AS (
        SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS n_both
        FROM dp a JOIN dp b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p),
    sup AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM dp GROUP BY p),
    tot AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM dp)
    SELECT p1, p2, n_both,
           (n_both * n_orders * 10000) // (s1.n * s2.n) AS lift_bp
    FROM pairs
    JOIN sup s1 ON p1 = s1.p
    JOIN sup s2 ON p2 = s2.p
    CROSS JOIN tot
    WHERE n_both >= 3
    ORDER BY lift_bp DESC, p1, p2
    LIMIT 20
    """,
    doc="Market-basket affinity: part pairs co-occurring in the same "
    "order, ranked by exact integer lift (observed co-rate over the "
    "independence expectation, x10000) — the association-rules / "
    "co-occurrence family (frequently-bought-together, co-citation) "
    "no other declared query exercises. Shape: distinct (order, part) "
    "pairs self-join ON THE ORDER KEY — co-partitioned, so the pair "
    "enumeration is per-order local and bounded by basket size "
    "squared (TPC-H baskets are ~4-7 lines; a pathological basket "
    "would need a per-order cap, the q41 max_bucket pattern); "
    "supports and the 1-row order total join back onto the "
    "already-aggregated pair table, never the raw pairs. Lift stays "
    "bigint-exact (n_both * n_orders * 10^4 ~ 10^12 at sf0.1), "
    "truncating div == DuckDB integer //; n_both >= 3 prunes noise "
    "pairs before the support joins.",
    tags=("join", "agg", "tpch", "curation"),
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    # r14: ONE (order, part) contraction feeds every branch — the old
    # shape built it twice (basket_pairs' internal distinct + the
    # query-local one for supports) and count_distinct(o) collapsed
    # into a third scan (trap 15b distinct-of-distinct). The
    # contraction is a groupBy with a load-bearing count: least(_m,1)
    # rides into the pair products, supports, and the order total so
    # aggregate-function pruning cannot demote any branch's copy to
    # keys-only (q195 discipline). Static plan: 2 scans -> 1, four
    # ReusedExchange; local timing a wash (2.15/2.03 best-of-5) — the
    # win is one fewer full lineitem pass at scale.
    dp = (
        l.filter(F.col("l_orderkey").isNotNull() & F.col("l_partkey").isNotNull())
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o", "p")
        .agg(F.count(F.lit(1)).alias("_m"))
    )
    lb = F.least(F.col("_m"), F.lit(1))
    pa = dp.select("o", F.col("p").alias("p1"), lb.alias("_ma"))
    pb = dp.select("o", F.col("p").alias("p2"), lb.alias("_mb"))
    pairs = (
        pa.join(pb, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.sum(F.col("_ma") * F.col("_mb")).alias("n_both"))
        .filter(F.col("n_both") >= 3)
    )
    sup = dp.groupBy("p").agg(F.sum(lb).alias("n"))
    ords = dp.groupBy("o").agg(F.max(lb).alias("_x"))
    tot = ords.agg(F.sum("_x").alias("n_orders"))
    return (
        pairs.join(
            sup.select(F.col("p").alias("p1"), F.col("n").alias("_n1")), "p1"
        )
        .join(sup.select(F.col("p").alias("p2"), F.col("n").alias("_n2")), "p2")
        .crossJoin(F.broadcast(tot))
        .withColumn("_num", F.col("n_both") * F.col("n_orders") * 10000)
        .withColumn("_den", F.col("_n1") * F.col("_n2"))
        .select(
            "p1",
            "p2",
            "n_both",
            F.expr("_num div _den").alias("lift_bp"),
        )
        .orderBy(F.desc("lift_bp"), "p1", "p2")
        .limit(20)
    )


_RFM_BUCKET_CTE = """
    {name} AS (
        SELECT v, LEAST(5, 1 + (5 * (cum - cnt)) // n) AS b
        FROM (SELECT v, cnt,
                     SUM(cnt) OVER (ORDER BY v
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum,
                     SUM(cnt) OVER () AS n
              FROM (SELECT {expr} AS v, CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM rfm GROUP BY {expr})))"""


def _rfm_oracle() -> str:
    cte = "".join(
        "," + _RFM_BUCKET_CTE.format(name=n, expr=e)
        for n, e in (("rb", "r_days"), ("fb", "f_orders"), ("mb", "m_dollars"))
    )
    return f"""
    WITH rfm AS (
        SELECT o_custkey,
               CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                              DATE '2002-01-01') AS BIGINT) AS r_days,
               CAST(COUNT(*) AS BIGINT) AS f_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                    AS BIGINT) // 100 AS m_dollars
        FROM orders GROUP BY o_custkey){cte}
    -- explicit BIGINT cast: b descends from a windowed SUM, which is
    -- HUGEINT in DuckDB; uncast, pandas renders segment as float64
    -- ("111.0") and the driver's stringified hash mismatches.
    SELECT CAST((6 - rb.b) * 100 + fb.b * 10 + mb.b AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM rfm
    JOIN rb ON rfm.r_days = rb.v
    JOIN fb ON rfm.f_orders = fb.v
    JOIN mb ON rfm.m_dollars = mb.v
    GROUP BY (6 - rb.b) * 100 + fb.b * 10 + mb.b
    ORDER BY segment
    """


@declare(
    "q153_rfm_segments",
    oracle=_rfm_oracle(),
    doc="RFM segmentation — the classic retail scoring deliverable, "
    "composed from THREE exact quintile selectors (q136's bounded "
    "count-table idiom, once per metric): recency (days before a "
    "fixed anchor, inverted so 5 = most recent), frequency (order "
    "count), monetary (whole dollars: cents div 100 — quantized "
    "BEFORE bucketing so the count table stays bounded by the dollar "
    "grid, not by customers; cent-grain values are near-unique per "
    "customer and would single-task the cumulative window at "
    "scale). segment = R*100 + F*10 + M with quintile = "
    "least(5, 1 + 5*cum_below // n), all integer. Plan: one orders "
    "scan aggregates to the per-customer RFM frame; each metric's "
    "value-count table is bounded (days / order counts / dollar "
    "grid), the three tiny bucket maps broadcast back, and the "
    "segment rollup is a |segments|-row aggregate.",
    tags=("agg", "window", "tpch", "curation"),
)
def q153(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.max(F.col("o_orderdate").cast("date"))
        )
        .cast("bigint")
        .alias("r_days"),
        F.count(F.lit(1)).cast("bigint").alias("f_orders"),
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)"
            " div 100"
        ).alias("m_dollars"),
    )

    def bucket(col: str, alias: str):
        w_cum = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_all = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        counts = rfm.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        pre = counts.select(
            "v",
            (F.sum("cnt").over(w_cum) - F.col("cnt")).alias("cume"),
            F.sum("cnt").over(w_all).alias("n"),
        )
        return pre.select(
            F.col("v").alias(f"{alias}_v"),
            F.least(F.lit(5), F.lit(1) + F.expr("(5 * cume) div n"))
            .cast("bigint")
            .alias(f"{alias}_b"),
        )

    out = (
        rfm.join(F.broadcast(bucket("r_days", "r")), F.col("r_days") == F.col("r_v"))
        .join(F.broadcast(bucket("f_orders", "f")), F.col("f_orders") == F.col("f_v"))
        .join(
            F.broadcast(bucket("m_dollars", "m")), F.col("m_dollars") == F.col("m_v")
        )
        .select(
            (
                (F.lit(6) - F.col("r_b")) * 100
                + F.col("f_b") * 10
                + F.col("m_b")
            ).alias("segment")
        )
        .groupBy("segment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("segment")
    )
    return out
