"""Arbitrary stateful streaming operators via applyInPandasWithState.

The escape hatch for semantics the built-in windows can't express —
the streaming analog of the reference's arbitrary per-record handler
(kaflow A7) but with explicit, watermark-bounded state.

``running_aggregate`` is the canonical example: per-key running
count/sum maintained across micro-batches with a processing-timeout
eviction. State lives in the state store (RocksDB-backed in the
session posture), sized by distinct keys — bounded by the timeout.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_aggregate(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum, max) across micro-batches.

    Output one row per key per batch with the updated running values.
    On batch frames falls back to a plain groupBy aggregate with the
    same output schema (so the same pipeline runs in tests).
    """
    out_schema = f"{key_col} bigint, run_count bigint, run_sum double, run_max double"
    state_schema = "run_count bigint, run_sum double, run_max double"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        cnt, sm, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            vals = pdf[value_col].astype("float64")
            cnt += len(vals)
            sm += float(vals.sum())
            if len(vals):
                mx = max(mx, float(vals.max()))
        state.update((cnt, sm, mx))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [{key_col: key[0], "run_count": cnt, "run_sum": sm, "run_max": mx}]
        )

    if not df.isStreaming:
        from pyspark.sql import functions as F

        return df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("run_count"),
            F.sum(F.col(value_col).cast("double")).alias("run_sum"),
            F.max(F.col(value_col).cast("double")).alias("run_max"),
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )
