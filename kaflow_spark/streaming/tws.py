"""transformWithStateInPandas operators (Spark 4 stateful API).

The successor to applyInPandasWithState: typed state handles
(ValueState/ListState/MapState), per-key timers, TTL — the API Spark
is converging on for arbitrary stateful streaming. The engine ships a
canonical operator on it so pipelines can adopt the new API without
bespoke plumbing:

``dedup_keys_tws``: exactly-once key suppression with TTL — emit a
key's row the FIRST time it is seen, drop re-deliveries while the
key's state lives; state expires via TTL so the key space is bounded
(the transformWithState analog of dropDuplicatesWithinWatermark, but
with processing-time TTL instead of event-time watermark).

ENVIRONMENT GATE: the transformWithState runtime requires the python
``google.protobuf`` package (its state protocol is protobuf-encoded);
``require_tws()`` raises a clear error when it is absent — use
``streaming.stateful`` (applyInPandasWithState) there instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

try:
    # the module exists on pyspark >= 4.0 only; import lazily-ish so
    # pyspark 3.5 (our declared minimum) gets require_tws()'s guidance
    # instead of a bare ModuleNotFoundError at import time
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover - pyspark < 4.0
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment,misc]

from pyspark.sql.types import LongType, StructField, StructType


class _SeenOnceProcessor(StatefulProcessor):
    """Emits each key's first-seen row count once; counts drops."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        schema = StructType([StructField("n", LongType(), True)])
        self._seen = handle.getValueState("seen", schema, ttlDurationMs=self._ttl_ms)

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues):
        n = 0
        for pdf in rows:
            n += len(pdf)
        if self._seen.exists():
            (prev,) = self._seen.get()
            self._seen.update((prev + n,))
            return iter(())  # duplicate delivery: suppressed
        self._seen.update((n,))
        yield pd.DataFrame({"key": [key[0]], "first_batch_rows": [n]})

    def close(self) -> None:
        pass


def tws_available() -> bool:
    if StatefulProcessorHandle is None:
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def require_tws() -> None:
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs pyspark >= 4.0 and the "
            "google.protobuf python package (one of them is missing in "
            "this environment); use kaflow_spark.streaming.stateful "
            "(applyInPandasWithState) instead"
        )


def dedup_keys_tws(
    df: DataFrame, key_col: str, ttl_ms: int | None = None
) -> DataFrame:
    """First-delivery-only key stream via transformWithStateInPandas.

    Output: one row per NEW key with the row count of its first
    delivery; later deliveries are absorbed into state. TTL bounds the
    key space (re-emits after expiry).
    """
    require_tws()
    out_schema = "key bigint, first_batch_rows bigint"
    return (
        df.groupBy(key_col)
        .transformWithStateInPandas(
            _SeenOnceProcessor(ttl_ms),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="processingTime" if ttl_ms is not None else "none",
        )
    )
