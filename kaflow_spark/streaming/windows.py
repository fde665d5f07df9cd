"""Streaming window aggregations (SURVEY §2B streaming surface).

Thin declarative builders over Spark's native ``window`` /
``session_window`` — the engine adds the watermark discipline (every
stateful streaming agg REQUIRES a watermark or state grows without
bound at 100 TB/day ingest) and consistent output column shapes
matching the batch analogs (q30/q31).

These run identically on batch DataFrames (windows collapse to
ordinary expressions), which is how the oracle checks their semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Late-data bound: events older than max(event time) - delay are
    dropped from stateful operators and their state evicted."""
    return df.withWatermark(ts_col, delay)


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows, e.g. tumbling(df,'ts','1 hour')."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    agged = df.groupBy(F.window(ts_col, duration).alias("win"), *(keys or [])).agg(*aggs)
    return _flatten_window(agged, "window_start", "window_end")


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    agged = df.groupBy(F.window(ts_col, duration, slide).alias("win"), *(keys or [])).agg(*aggs)
    return _flatten_window(agged, "window_start", "window_end")


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Data-driven session windows (30-min-gap semantics of q31); the
    streaming twin of the gaps-and-islands batch composition."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    agged = df.groupBy(F.session_window(ts_col, gap).alias("win"), *(keys or [])).agg(*aggs)
    return _flatten_window(agged, "session_start", "session_end")


def _flatten_window(agged: DataFrame, start_name: str, end_name: str) -> DataFrame:
    """Flatten the window struct into start/end columns, keeping every
    other output column in place."""
    others = [c for c in agged.columns if c != "win"]
    return agged.select(
        F.col("win.start").alias(start_name),
        F.col("win.end").alias(end_name),
        *others,
    )


def ohlc_aggs(
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> list[Column]:
    """OHLC bar aggregates (the streaming twin of batch q121): open and
    close pick the value at the earliest/latest (ts, id) — the unique
    id makes the pick deterministic under any arrival order, which is
    exactly what a streaming agg needs (state merges are
    order-insensitive: min_by/max_by over a lexicographic struct key
    are commutative). Use with tumbling()/sliding():

        tumbling(stream, "ts", "1 hour", keys=["event_type"],
                 aggs=ohlc_aggs(), watermark="10 minutes")
    """
    key = F.struct(F.col(ts_col), F.col(id_col))
    return [
        F.min_by(value_col, key).alias("open_v"),
        F.max(value_col).alias("high_v"),
        F.min(value_col).alias("low_v"),
        F.max_by(value_col, key).alias("close_v"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    ]
