"""Partitioned storage layout + dynamic partition pruning (DPP).

The 100 TB read story has two halves. PushedFilters/ReadSchema (plan
contracts in tests/test_plans.py) cover the flat-file half: row-group
skipping and column pruning inside each file. This module covers the
LAYOUT half: a fact table written as ``month=YYYY-MM/`` directories is
pruned at the *directory* level — a query that touches one quarter
lists and reads 3 of ~1200 partitions at 100-TB scale, never opening
the rest.

Static pruning (``WHERE month = 'x'``) is free once the layout exists.
The interesting mechanism is **dynamic** partition pruning: the filter
lives on a *dimension* attribute (``quarter = '1996Q2'``), not the
partition column, so no static filter can prune the fact scan. At
planning time Catalyst inserts a ``DynamicPruningExpression`` into the
fact scan's PartitionFilters; at runtime it executes the (broadcast)
dim side first, collects the surviving join keys, and prunes fact
partitions before the fact scan starts — TPC-DS's date_dim pattern.
tests/test_dpp.py asserts both the plan node and the measured
partition-count reduction (scan metrics), and PLANS.md §"dpp" shows
the plan.

The reference has no storage layout at all (Kafka in/out only,
kaflow/applications.py:278-343); this is pure engine scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kaflow_spark.sources.files import write_partitioned


def with_month(df: DataFrame, ts_col: str, month_col: str = "month") -> DataFrame:
    """Add a ``YYYY-MM`` month string derived from a timestamp column —
    the canonical partition key for time-series facts (day granularity
    over-partitions small-file-wise at sane fact sizes; year
    under-prunes)."""
    return df.withColumn(month_col, F.date_format(ts_col, "yyyy-MM"))


def write_month_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    month_col: str = "month",
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as a month-partitioned parquet layout
    (``month=YYYY-MM/`` directories). Downstream reads prune statically
    on ``month`` predicates and dynamically through joins against a
    filtered month dimension (see :func:`month_dim`)."""
    write_partitioned(
        with_month(df, ts_col, month_col),
        path,
        partition_by=[month_col],
        max_records_per_file=max_records_per_file,
    )


def month_dim(
    spark: SparkSession, start: str, end: str, month_col: str = "month"
) -> DataFrame:
    """Calendar month dimension ``(month, year, quarter)`` covering
    [start, end] (YYYY-MM strings, inclusive). Tiny by construction
    (~12 rows/year — broadcast always), which is exactly what makes
    DPP cheap: the dim side executes first and its surviving keys
    prune the fact scan."""
    start_d = F.to_date(F.lit(start + "-01"))
    end_d = F.to_date(F.lit(end + "-01"))
    months = spark.range(1).select(
        F.explode(F.sequence(start_d, end_d, F.expr("interval 1 month"))).alias("_d")
    )
    return months.select(
        F.date_format("_d", "yyyy-MM").alias(month_col),
        F.year("_d").alias("year"),
        F.concat(
            F.year("_d").cast("string"), F.lit("Q"), F.quarter("_d").cast("string")
        ).alias("quarter"),
    )


def star_join_quarter_revenue(
    fact: DataFrame,
    dim: DataFrame,
    quarter: str,
    month_col: str = "month",
    price_col: str = "o_totalprice",
) -> DataFrame:
    """q101-shaped star join hosted on the partitioned layout: filter
    the month dimension to one quarter (an attribute the fact layout
    knows nothing about), join the fact on the partition column, and
    aggregate revenue per month.

    Plan contract (asserted in tests/test_dpp.py): the dim side
    broadcasts; the fact scan's PartitionFilters carry a
    ``dynamicpruningexpression(month IN dynamicpruning#N)`` that reuses
    the broadcast exchange, so at runtime only the quarter's ~3
    partitions are listed and read — scan metrics report
    numPartitions == 3 regardless of how many months the fact holds.
    """
    return (
        fact.join(F.broadcast(dim.filter(F.col("quarter") == quarter)), month_col)
        .groupBy(month_col)
        .agg(
            F.sum(F.col(price_col).cast("decimal(18,2)")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(month_col)
    )
