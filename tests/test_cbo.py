"""Cost-based-optimizer posture: with external-table stats collected
(catalog.register_tables_with_stats) and CBO enabled,
CostBasedJoinReorder rewrites a worst-first inner-join chain into the
dim-reducing order — demonstrating that SURVEY §4.2's "join
reordering is free" claim actually fires on this build, rather than
assuming it."""

from __future__ import annotations

import pytest

from kaflow_spark.catalog import register_tables_with_stats

_Q = """
SELECT n_name, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
FROM lineitem_st
JOIN orders_st   ON l_orderkey = o_orderkey
JOIN customer_st ON c_custkey = o_custkey
JOIN nation_st   ON n_nationkey = c_nationkey
JOIN region_st   ON r_regionkey = n_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def _join_lines(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return [ln.strip() for ln in plan.splitlines() if "Join Inner" in ln]


@pytest.fixture()
def cbo(spark, sf_dir):
    register_tables_with_stats(
        spark,
        sf_dir,
        ("region", "nation", "customer", "supplier", "orders", "lineitem", "part"),
    )
    keep = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    yield spark
    for k, v in keep.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_stats_driven_join_reorder(cbo):
    spark = cbo
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    baseline = _join_lines(spark.sql(_Q))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    reordered = _join_lines(spark.sql(_Q))

    # without CBO the user's worst-first order survives: the top join
    # closes the dim chain (region last), the fact join sits at the
    # bottom of the tree
    assert "r_regionkey" in baseline[0]
    assert "l_orderkey" in baseline[-1]
    # with stats, the chain inverts: the fact join is applied LAST
    # (top of the tree) after the selective dims reduced the build side
    assert "l_orderkey" in reordered[0]
    assert "r_regionkey" in reordered[-1]
    # and both plans still agree on the answer
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    # DECIMAL aggregation: join order must not change the answer (a
    # float SUM here DID differ in the last ulp between the two plans
    # — the repo-wide DECIMAL-before-float discipline, measured again)
    a = {(r["n_name"], r["rev"]) for r in spark.sql(_Q).collect()}
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    b = {(r["n_name"], r["rev"]) for r in spark.sql(_Q).collect()}
    assert a == b


_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
FROM lineitem_st
JOIN orders_st   ON l_orderkey = o_orderkey
JOIN customer_st ON c_custkey = o_custkey
JOIN supplier_st ON s_suppkey = l_suppkey
JOIN nation_st n1 ON s_nationkey = n1.n_nationkey
JOIN nation_st n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY supp_nation, cust_nation, l_year
"""


@pytest.fixture()
def cbo001(spark):
    """CBO fixture pinned to sf0.001: the chosen join order is
    statistics-dependent BY DESIGN (different SFs produce different
    optimal orders — observed: q115's part join moves at sf0.001 but
    stays topmost at sf0.01 where its relative selectivity differs),
    so the strict structural asserts pin the SF they were measured
    at; each test also asserts the SF-independent fact that stats
    CHANGED the order."""
    register_tables_with_stats(
        spark,
        "/root/testdata/sf0.001",
        ("region", "nation", "customer", "supplier", "orders", "lineitem", "part"),
    )
    keep = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    yield spark
    for k, v in keep.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _strip_ids(lines):
    import re

    return [re.sub(r"#\d+L?", "", ln) for ln in lines]


def test_cbo_reorders_q103_shape(cbo001):
    """The q103 (TPC-H Q7) join graph written worst-first: without
    stats the text order survives (nation-pair filter attaches at the
    TOP, after both fact-fact shuffles already ran unpruned); with
    stats CostBasedJoinReorder sinks the selective nation-pair
    product to the BOTTOM of the tree and applies the fact-fact join
    conditions LAST over already-reduced sides."""
    spark = cbo001
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    baseline = _join_lines(spark.sql(_Q7))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    reordered = _join_lines(spark.sql(_Q7))

    assert _strip_ids(baseline) != _strip_ids(reordered)  # stats moved joins
    # no stats: top join closes the customer-side nation (pair filter
    # evaluated last), bottom join is the raw lineitem x orders
    assert "c_nationkey" in baseline[0]
    assert "l_orderkey" in baseline[-1]
    # stats: the fact join moves to the TOP (its inputs now pruned),
    # and the pair disjunction lands at the BOTTOM of the dim chain
    assert "l_orderkey" in reordered[0]
    assert any("NATION_3" in ln for ln in reordered[-2:])


_Q9 = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS profit
FROM lineitem_st
JOIN orders_st ON o_orderkey = l_orderkey
JOIN supplier_st ON s_suppkey = l_suppkey
JOIN nation_st ON s_nationkey = n_nationkey
JOIN part_st ON p_partkey = l_partkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
"""


def test_cbo_reorders_q115_shape(cbo001):
    """The q115 (TPC-H Q9) join graph with the selective part filter
    written LAST: without stats the part join sits at the top (every
    upstream join ran on the unfiltered fact); with stats the
    LIKE-filtered part sinks below the supplier join, pruning
    lineitem before the wider joins run — the same
    prune-the-fact-first staging the declared q115 hand-encodes with
    broadcast hints, now derived from statistics alone."""
    spark = cbo001
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    baseline = _join_lines(spark.sql(_Q9))
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    reordered = _join_lines(spark.sql(_Q9))

    assert _strip_ids(baseline) != _strip_ids(reordered)  # stats moved joins
    assert "p_partkey" in baseline[0]  # part attaches dead last
    # with stats the part join is no longer at the top...
    assert "p_partkey" not in reordered[0]
    # ...it moved below the supplier attach, directly pruning the fact
    i_part = next(i for i, ln in enumerate(reordered) if "p_partkey" in ln)
    i_supp = next(i for i, ln in enumerate(reordered) if "s_suppkey" in ln)
    assert i_part > i_supp
