"""Declared-query registry (SURVEY §2B).

Each declared query is a pair: a Spark-side builder (DataFrame API or
spark.sql — both are Catalyst-planned) and an equivalent DuckDB SQL
string the oracle harness runs on the same parquet tables. Determinism
rules (SURVEY §2B): total ORDER BY, decimal-cast before SUM/AVG, no
approximate/nondeterministic functions, unique-key window tie-breaks,
and *identical output column names and types* on both sides.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB dialect; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, DeclaredQuery] = {}


def declare(
    name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a declared query under ``name``."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query {name!r}")

        @functools.wraps(fn)
        def run(spark: SparkSession, sf: str) -> DataFrame:
            # Harness sessions may not set a timezone; timestamp
            # literals / truncs / windows are tz-dependent, so pin UTC
            # (matches the DuckDB oracle's naive-UTC semantics).
            try:
                spark.conf.set("spark.sql.session.timeZone", "UTC")
            except Exception:
                pass
            return fn(spark, sf)

        REGISTRY[name] = DeclaredQuery(name, run, oracle, doc or (fn.__doc__ or ""), tags)
        return run

    return wrap


# ---- shared expression helpers (determinism discipline) ----------------


def dec(col: Column | str, prec: int = 18, scale: int = 2) -> Column:
    """Cast to DECIMAL before aggregation: decimal agg is exact and
    order-independent, unlike DOUBLE under shuffled partial aggs."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DecimalType(prec, scale))


def ts_lit(df: DataFrame, column: str, value: str) -> Column:
    """Timestamp literal cast to the *column's own* timestamp flavor
    (TIMESTAMP vs TIMESTAMP_NTZ) so comparisons never cross flavors."""
    return F.lit(value).cast(df.schema[column].dataType)
