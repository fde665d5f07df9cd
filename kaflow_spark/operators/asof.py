"""As-of (point-in-time) join — an operator Spark lacks natively.

Implemented as the union-and-window composition (no range explosion,
no nested-loop): tag both sides, union on (key, ts), and carry the
most recent right-side row forward with ``last(..., ignorenulls)``
over (key, ts, side). One shuffle on the join key; O(n log n) within
partitions; immune to the unbounded fan-out a range join would have.

At 100 TB both inputs shuffle once by key — the same cost as any
equi-join of the two tables, with no risk of a skewed time-range
blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    *,
    direction: str = "backward",
    suffix: str = "_right",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts (direction='backward'; 'forward' mirrors).

    ``value_cols``: right-side columns to carry (default: all except
    keys/ts). Right rows sort before left rows at equal timestamps,
    so an exactly-simultaneous right row IS matched (inclusive).

    ``tolerance`` (pandas merge_asof parity): maximum allowed
    |left.ts - matched right.ts| — an INTERVAL string (``'2 hours'``)
    for timestamp columns or a number for numeric ones. Matches
    outside the bound null out (the row still emits, like merge_asof).
    At scale the tolerance is also the state bound the STREAMING twin
    (streaming/asof.py) enforces on its interval join — declaring it
    in batch keeps the two paths semantically aligned.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, right_ts)]

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    if direction == "nearest":
        return _asof_nearest(
            left, right, keys, left_ts, right_ts, value_cols,
            suffix=suffix, tolerance=tolerance,
        )

    ts = "_asof_ts"
    side = "_asof_side"
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias(ts),
        F.lit(1).alias(side),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        *(
            [F.lit(None).cast(right.schema[right_ts].dataType).alias("_asof_rts_right")]
            if tolerance is not None
            else []
        ),
    )
    rts = "_asof_rts"
    carry = list(value_cols)
    if tolerance is not None:
        carry.append(rts)
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(side),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *([F.col(right_ts).alias(f"{rts}{suffix}")] if tolerance is not None else []),
    )
    unioned = l_tag.unionByName(r_tag)

    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts).asc(), F.col(side).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = {
            c: F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
            for c in carry
        }
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts).asc(), F.col(side).desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = {
            c: F.first(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
            for c in carry
        }

    filled = unioned.select(
        *[c for c in unioned.columns if not c.endswith(suffix)],
        *[expr.alias(f"{c}{suffix}") for c, expr in fill.items()],
    )
    out = filled.filter(F.col(side) == 1)
    if tolerance is not None:
        tol = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        matched = F.col(f"{rts}{suffix}")
        if direction == "backward":
            ok = matched.isNotNull() & ((F.col(ts) - matched) <= tol)
        else:
            ok = matched.isNotNull() & ((matched - F.col(ts)) <= tol)
        out = out.select(
            *[c for c in out.columns if not c.endswith(suffix)],
            *[
                F.when(ok, F.col(f"{c}{suffix}"))
                .otherwise(F.lit(None))
                .alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
    return out.drop(ts, side, f"{rts}{suffix}")


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    *,
    suffix: str = "_right",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """``direction='nearest'`` (pandas merge_asof parity): attach the
    right row minimizing |left.ts - right.ts|; exact-distance ties
    take the BACKWARD (earlier) match — deterministic and documented,
    matching the tie every bitemporal store picks.

    Same one-shuffle union-and-window composition as the directional
    paths: ONE exchange on the join key feeds two local window sorts
    over the identical (ts, side) prefix — the backward carry-forward
    and the forward carry-backward — then a row-local comparison picks
    the closer candidate. No range explosion, no second shuffle."""
    ts, side = "_asof_ts", "_asof_side"
    rts = "_asof_rts"
    carry = [*value_cols, rts]
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias(ts),
        F.lit(1).alias(side),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{rts}{suffix}"),
    )
    r_tag = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys
        ],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(ts),
        F.lit(0).alias(side),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(right_ts).alias(f"{rts}{suffix}"),
    )
    unioned = l_tag.unionByName(r_tag)
    w_b = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col(side).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col(side).desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    both = unioned.select(
        *[c for c in unioned.columns if not c.endswith(suffix)],
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w_b)
            .alias(f"_b_{c}")
            for c in carry
        ],
        *[
            F.first(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w_f)
            .alias(f"_f_{c}")
            for c in carry
        ],
    ).filter(F.col(side) == 1)
    b_rts, f_rts = F.col(f"_b_{rts}"), F.col(f"_f_{rts}")
    # backward wins when forward is absent, or both exist and the
    # backward distance is <= the forward one (ties -> backward)
    use_b = b_rts.isNotNull() & (
        f_rts.isNull() | ((F.col(ts) - b_rts) <= (f_rts - F.col(ts)))
    )
    if tolerance is not None:
        tol = (
            F.expr(f"INTERVAL {tolerance}")
            if isinstance(tolerance, str)
            else F.lit(tolerance)
        )
        chosen_rts = F.when(use_b, b_rts).otherwise(f_rts)
        delta = F.when(use_b, F.col(ts) - b_rts).otherwise(chosen_rts - F.col(ts))
        in_tol = chosen_rts.isNotNull() & (delta <= tol)
    else:
        in_tol = F.lit(True)
    picked = [
        F.when(in_tol & use_b, F.col(f"_b_{c}"))
        .when(in_tol & ~use_b, F.col(f"_f_{c}"))
        .otherwise(F.lit(None))
        .alias(f"{c}{suffix}")
        for c in value_cols
    ]
    keep = [
        c
        for c in both.columns
        if not (c.startswith("_b_") or c.startswith("_f_") or c in (ts, side))
    ]
    return both.select(*[F.col(c) for c in keep], *picked)
