"""Table catalog over the driver-materialized parquet test data.

``load`` returns a plain DataFrame per table (scan + Catalyst pushdown
do the rest); ``register_views`` exposes the same tables as temp views
for SQL-expressed queries (subqueries, grouping sets, ...).
"""

from __future__ import annotations

import datetime as _dt

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

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

# Per-session DataFrame cache: a load() is ~70-100 ms of driver-side
# footer/schema reads, and a full bench pass issues hundreds of them
# over the same immutable fixture tables — ~20 s/pass of pure setup.
# DataFrames are immutable lazy plans, so handing every caller the
# same object is semantically identical; the key is the session
# OBJECT (weak), so a stopped/replaced session can never serve a
# stale JVM handle. Values reference their key session, which keeps
# an entry alive until interpreter exit — bounded by tables x
# sessions per process (tiny) and accepted. The fixture tables are
# immutable by contract; anything that rewrites a path it already
# loaded must call clear_load_cache() first.
import weakref

_LOAD_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def clear_load_cache() -> None:
    """Drop every cached table plan (needed only if a fixture parquet
    path is rewritten mid-session)."""
    _LOAD_CACHE.clear()


def _utc_micros(ts: str) -> int:
    """Naive-UTC timestamp string -> epoch microseconds (pure python,
    no float round-trip)."""
    d = _dt.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S").replace(
        tzinfo=_dt.timezone.utc
    )
    return int(d.timestamp()) * 1_000_000


def load(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    *,
    ts_min: str | None = None,
    ts_max: str | None = None,
) -> DataFrame:
    """Scan one table. Column pruning / predicate pushdown happen in
    Catalyst — callers just select/filter declaratively.

    ``ts_min``/``ts_max`` (events only, ``"YYYY-MM-DD HH:MM:SS"``) are
    *loose* bounds applied on the raw scan column so parquet row-group
    stats can prune; callers keep their exact post-conversion filter.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    key = (sf_dir.rstrip("/"), name, ts_min, ts_max)
    per_session = _LOAD_CACHE.setdefault(spark, {})
    hit = per_session.get(key)
    if hit is not None:
        return hit
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        df = spark.read.parquet(path)
        per_session[key] = df
        return df

    # events.ts is parquet TIMESTAMP(NANOS), which Spark refuses to read
    # unless legacy.parquet.nanosAsLong is set. That is a runtime SQL
    # conf, and the harness that calls us may have built its own session
    # without it — set it here, not only at session build, so load() is
    # session-portable.
    try:
        spark.conf.set(_NANOS_CONF, "true")
    except Exception:
        pass  # ancient sessions without the conf: fall through to read
    try:
        # The whole events surface (and its DuckDB oracles, which use
        # naive timestamps) is defined against UTC wall clocks; pin the
        # runtime conf so a harness-built session agrees with ours.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # Raw int64 nanos. Time bounds are applied HERE, pre-conversion,
        # as plain long comparisons — pushdown-eligible, so row-group
        # stats prune at scale. Bounds are loosened to the enclosing
        # nanosecond range of the micros truncation (ns div 1000 == us
        # iff ns in [us*1000, us*1000+999]) so they can never drop a row
        # the caller's exact filter would keep.
        if ts_min is not None:
            df = df.filter(F.col("ts") >= F.lit(_utc_micros(ts_min) * 1000))
        if ts_max is not None:
            df = df.filter(
                F.col("ts") <= F.lit((_utc_micros(ts_max) + 1) * 1000 - 1)
            )
        # Truncate to micros exactly like DuckDB's python fetch does. A
        # production events table should be WRITTEN with micros
        # precision — this conversion exists only because the
        # driver-generated fixture uses nanos.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # Session (or future fixture) already yields a timestamp column:
        # bounds are ordinary timestamp predicates, natively pushed down
        # (applied BEFORE any dtype normalization so parquet row-group
        # stats prune on the scan column).
        if ts_min is not None:
            df = df.filter(F.col("ts") >= F.lit(ts_min).cast(dict(df.dtypes)["ts"]))
        if ts_max is not None:
            df = df.filter(F.col("ts") <= F.lit(ts_max).cast(dict(df.dtypes)["ts"]))
        if dict(df.dtypes).get("ts") == "timestamp_ntz":
            # Parquet TIMESTAMP(isAdjustedToUTC=false) infers as
            # TIMESTAMP_NTZ, which ANSI mode refuses to cast to numeric
            # (epoch math in the window/session queries needs that).
            # The engine pins session TZ to UTC, so casting to the
            # session-local TIMESTAMP preserves every instant exactly
            # and restores the dtype the whole query surface is built on.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    per_session[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (idempotent) for spark.sql."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


# the relational TPC-H tables: safe to expose as external parquet
# tables verbatim. events is deliberately absent — its parquet
# timestamp flavor varies by fixture generation (TIMESTAMP(NANOS)-as-
# long vs TIMESTAMP_NTZ) and must go through load()'s normalization,
# which a bare external table would bypass.
STATS_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)


def register_tables_with_stats(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] | None = None,
    *,
    suffix: str = "_st",
) -> None:
    """Catalog posture for the cost-based optimizer: expose each
    parquet table as an EXTERNAL table (no data copy — the table
    points at the existing files) and run ``ANALYZE TABLE ... COMPUTE
    STATISTICS FOR ALL COLUMNS``, so row counts, ndv, and min/max land
    in the metastore. With ``spark.sql.cbo.enabled`` and
    ``spark.sql.cbo.joinReorder.enabled`` set, CostBasedJoinReorder
    then re-orders inner-join chains by estimated cost — measured on
    this build: a worst-first-written TPC-H star join (lineitem
    leading) is rewritten to reduce through the selective dims first
    (region -> nation -> customer -> orders -> lineitem), exactly the
    plan a human would stage (tests/test_cbo.py locks it in).

    At 100 TB this is the difference between shuffling a fact table
    into a dim chain and broadcasting dims into one fact pass; stats
    collection is a metadata-only scan per table and is amortized
    across every query in the session/metastore lifetime."""
    for name in tables or STATS_TABLES:
        t = f"{name}{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(
            f"CREATE TABLE {t} USING parquet LOCATION '{sf_dir}/{name}.parquet'"
        )
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
