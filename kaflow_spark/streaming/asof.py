"""Streaming as-of join (latest right row at-or-before each left
event, within a tolerance horizon).

The batch twin is ``operators/asof.py``; streams can't sort-merge, so
this composes the two stateful operators Structured Streaming gives
us (supported chained since Spark 3.5):

1. a **time-interval stream-stream join** — right rows with
   ``right_ts ∈ [left_ts - tolerance, left_ts]`` join the left row;
   both sides keep watermark-bounded state, and the tolerance bound
   is what lets Spark evict right-side state (an unbounded "any
   earlier row" as-of cannot stream — its state never expires);
2. a **max_by aggregation** keyed on the left row (every groupable
   left column, so the left payload passes through like the batch
   twin; map-typed columns can't be grouping keys and ride along via
   ``first`` instead) — of the candidates within the horizon, keep
   the one with the greatest ``right_ts``. Labels, not windows: the
   group key includes the watermarked event-time column itself, so
   state for a left row is dropped once the watermark passes it.

Output-mode semantics (append, the only mode a downstream sink can
consume incrementally): a result row for left event time ``t`` is
emitted ONLY when the watermark advances past ``t`` — i.e. after
``max(event time seen) - delay > t`` on BOTH inputs. Until then the
row is in-flight state; a terminated stream therefore holds back its
last ``delay`` of results (standard watermark semantics — tests push
a final watermark-advancing row to flush). Left events with NO right
row in the horizon are dropped (inner join): a streaming left-outer
interval join emits null-padded rows only at state eviction, with
the same delay — exposed via ``how="leftOuter"``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    *,
    tolerance: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join between two WATERMARKED streams.

    For every left row, attach the ``value_cols`` of the latest right
    row with ``right_ts <= left_ts`` and within ``tolerance``. Output
    columns: EVERY left column (keys, ``left_ts``, payload — the
    aggregation groups on all of them, so the left side passes through
    like the batch twin in operators/asof.py), each value column
    (aliased unchanged), and ``right_ts`` (the matched row's time).
    Documented delta vs batch: left rows identical in ALL columns
    collapse to one output row (a streaming aggregation key must be a
    set of columns; carry a unique event id to keep true duplicates).

    ``how``: ``"inner"`` drops left rows with no right match in the
    horizon; ``"leftOuter"`` keeps them with null value columns — the
    null-padded row materializes only when the left row's state
    evicts (watermark past ``left_ts`` + tolerance), the standard
    outer-interval-join delay.

    Both inputs MUST already carry ``withWatermark`` (the interval
    join and the aggregation each require it); ``tolerance`` bounds
    right-side state — at 100 TB/day the state store holds only
    ``tolerance`` worth of the right stream per key, not its history.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (left[k] == right[k])
    cond = (
        cond
        & (right[right_ts] <= left[left_ts])
        & (right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {tolerance}"))
    )
    joined = left.join(right, cond, how)
    # map-typed columns are not valid grouping expressions; they ride
    # along via first() (all rows of a group share the same left row
    # identity, so any value is THE value — modulo distinct left rows
    # that differ only in a map column, which collapse)
    from pyspark.sql.types import MapType

    group_cols, map_cols = [], []
    for f in left.schema.fields:
        (map_cols if isinstance(f.dataType, MapType) else group_cols).append(
            f.name
        )
    return joined.groupBy(*[left[c] for c in group_cols]).agg(
        *[F.first(left[c]).alias(c) for c in map_cols],
        *[F.max_by(c, right[right_ts]).alias(c) for c in value_cols],
        F.max(right[right_ts]).alias(right_ts),
    )


__all__ = ["asof_join_stream"]
