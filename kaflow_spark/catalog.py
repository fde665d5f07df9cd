"""Table catalog over the driver-materialized parquet test data.

``load`` returns a plain DataFrame per table (scan + Catalyst pushdown
do the rest); ``register_views`` exposes the same tables as temp views
for SQL-expressed queries (subqueries, grouping sets, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Column pruning / predicate pushdown happen in
    Catalyst — callers just select/filter declaratively."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) which Spark reads as
        # INT64 nanos (legacy.parquet.nanosAsLong); truncate to micros
        # exactly like DuckDB's python fetch does.
        #
        # Scale caveat: predicates on the converted column cannot reach
        # the parquet row-group stats (the scan sees only the raw
        # int64). A production events table should be WRITTEN with
        # micros precision — this conversion exists only because the
        # driver-generated fixture uses nanos. Filters still prune
        # post-scan and the conversion is a free codegen projection.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (idempotent) for spark.sql."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
