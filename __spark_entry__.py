"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are generated from the engine's declared-
query registry (kaflow_spark.queries.REGISTRY — SURVEY §2B Q1-Q33 plus
LLM-pipeline operators). Each registry entry carries both the Spark
builder and the DuckDB oracle SQL; the two are kept adjacent in source
so names/types stay aligned (the hash compare sorts columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kaflow_spark.queries import REGISTRY

_FLAGSHIP = "q12_tpch_q1_agg"
_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on sf0.001."""
    return REGISTRY[_FLAGSHIP].spark(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
