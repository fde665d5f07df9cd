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
        spark, sf_dir, ("region", "nation", "customer", "orders", "lineitem")
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
