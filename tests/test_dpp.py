"""Dynamic partition pruning: the storage-layout half of the 100 TB
read contract. A month-partitioned fact joined to a quarter-filtered
month dimension must (a) plan a DynamicPruningExpression into the fact
scan's PartitionFilters and (b) actually read only the quarter's
partitions at runtime — both asserted here, not assumed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kaflow_spark.plans import scan_partition_metrics
from kaflow_spark.plans.explain import explain_str
from kaflow_spark.sources.layout import (
    month_dim,
    star_join_quarter_revenue,
    write_month_partitioned,
)

QUARTER = "1996Q2"


@pytest.fixture(scope="module")
def orders_layout(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "orders_by_month")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_month_partitioned(orders, path, "o_orderdate", month_col="month")
    fact = spark.read.parquet(path)
    n_months = fact.select("month").distinct().count()
    lo, hi = fact.agg(F.min("month"), F.max("month")).first()
    dim = month_dim(spark, lo, hi, month_col="month")
    return fact, dim, n_months


def test_dpp_in_static_plan(spark, orders_layout):
    """The static planner (AQE off, per CLAUDE.md trap 9) must insert a
    dynamicpruningexpression into the fact scan's PartitionFilters —
    the quarter filter lives on a dim attribute, so nothing else can
    prune the fact scan."""
    fact, dim, _ = orders_layout
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        q = star_join_quarter_revenue(fact, dim, QUARTER)
        txt = explain_str(q)
        assert "dynamicpruningexpression" in txt.lower()
        # and it reuses the broadcast, not a duplicate dim subquery
        assert "SubqueryBroadcast" in txt or "dynamicpruning" in txt.lower()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_dpp_prunes_partitions_at_runtime(spark, orders_layout):
    """Runtime proof: scan metrics after execution show only the
    quarter's months were listed/read — numPartitions == 3 out of the
    full month range. This is the measurement that distinguishes DPP
    firing from DPP merely planned."""
    fact, dim, n_months = orders_layout
    assert n_months > 12  # layout is genuinely multi-partition
    q = star_join_quarter_revenue(fact, dim, QUARTER)
    rows = q.collect()
    assert [r["month"] for r in rows] == ["1996-04", "1996-05", "1996-06"]
    scans = [m for m in scan_partition_metrics(q) if "numPartitions" in m]
    assert scans, "no partitioned scan metrics found"
    fact_scan = max(scans, key=lambda m: m.get("numOutputRows", 0))
    assert fact_scan["numPartitions"] == 3, fact_scan
    assert fact_scan["numFiles"] <= 3 * 4  # no file explosion per partition


def test_dpp_result_matches_unpartitioned(spark, sf_dir, orders_layout):
    """Pruning must not change the answer: the partitioned star join
    equals the same aggregate computed directly on the flat fixture."""
    fact, dim, _ = orders_layout
    got = {
        r["month"]: (r["revenue"], r["n_orders"])
        for r in star_join_quarter_revenue(fact, dim, QUARTER).collect()
    }
    flat = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("month", F.date_format("o_orderdate", "yyyy-MM"))
        .filter(F.col("month").isin("1996-04", "1996-05", "1996-06"))
        .groupBy("month")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    want = {r["month"]: (r["revenue"], r["n_orders"]) for r in flat.collect()}
    assert got == want


def test_static_partition_pruning(spark, orders_layout):
    """The free half: a literal predicate on the partition column reads
    exactly one directory (numPartitions == 1), no dim join needed."""
    fact, _, n_months = orders_layout
    q = fact.filter(F.col("month") == "1996-04").agg(
        F.count(F.lit(1)).alias("n")
    )
    # collect(), not first(): first() spawns a separate limited
    # execution, leaving THIS plan's metrics empty
    [(n,)] = q.collect()
    assert n > 0
    scans = [m for m in scan_partition_metrics(q) if "numPartitions" in m]
    assert scans and scans[0]["numPartitions"] == 1 < n_months
