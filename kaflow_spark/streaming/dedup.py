"""Streaming deduplication (SURVEY §2B streaming surface).

Two state-bounded flavors:

- ``dedup_within_watermark``: drop re-deliveries of the same key while
  its state lives inside the watermark horizon — the right default for
  at-least-once sources (Kafka redelivery), O(keys-in-horizon) state.
- ``dedup_exact_keys``: classic dropDuplicates on keys (+ event-time
  column so the watermark bounds state).

Both are no-ops semantically on batch frames (dropDuplicates), which
keeps the TestClient path usable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_exact_keys(
    df: DataFrame, keys: list[str], ts_col: str | None = None, watermark: str = "10 minutes"
) -> DataFrame:
    """Drop duplicate deliveries of the same row.

    Without ``ts_col``: keep the first delivery per key (state is
    unbounded — batch or short-lived streams only). With ``ts_col``
    the dedup key becomes ``(keys, ts_col)`` so the watermark can
    bound state — the same key arriving with a DIFFERENT event
    timestamp is kept (that is what makes eviction sound; Spark
    cannot evict per-key state it might still need). Callers needing
    true per-key suppression with bounded state want
    ``dedup_within_watermark`` instead."""
    if df.isStreaming and ts_col is not None:
        df = df.withWatermark(ts_col, watermark)
        return df.dropDuplicates([*keys, ts_col])
    return df.dropDuplicates(keys)


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Drop duplicate keys arriving within the watermark horizon;
    state for a key is evicted once the watermark passes it
    (dropDuplicatesWithinWatermark, Spark 3.5+)."""
    df = df.withWatermark(ts_col, watermark)
    if df.isStreaming:
        return df.dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
