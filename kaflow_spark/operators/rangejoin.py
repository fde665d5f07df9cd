"""Binned range join — the scalable large×large complement to the
broadcast nested-loop range join (q10).

A range join ``left.v BETWEEN right.lo AND right.hi`` has no equi-key,
so Spark plans BroadcastNestedLoopJoin (fine when one side broadcasts)
or a cartesian product (never fine). When BOTH sides are large, the
standard rewrite bins the value domain: a right interval [lo, hi]
lands in every bin it overlaps, a left value lands in exactly one bin,
and the join becomes an equi-join on bin id + a residual predicate.

Shuffle volume: |left| + Σ interval_width/bin_width — tunable via
``bin_width`` against the interval-length distribution. Skewed bins
(popular value ranges) fall to AQE skew splitting like any equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``left`` to rows of ``right`` whose
    [right_lo, right_hi] interval contains ``left_val``.

    Both inputs may be arbitrarily large: the pairing is an equi-join
    on bin id. Intervals spanning many bins replicate across them —
    choose ``bin_width`` near the typical interval length.
    """
    if how != "inner":
        raise ValueError("binned_range_join supports inner joins")
    lbin = F.floor(F.col(left_val) / bin_width).cast("long")
    l_tag = left.withColumn("_bin", lbin)
    lo_bin = F.floor(F.col(right_lo) / bin_width).cast("long")
    hi_bin = F.floor(F.col(right_hi) / bin_width).cast("long")
    r_tag = right.withColumn(
        "_bin", F.explode(F.sequence(lo_bin, hi_bin))
    )
    return (
        l_tag.join(r_tag, "_bin")
        .filter(
            F.col(left_val).between(F.col(right_lo), F.col(right_hi))
        )
        .drop("_bin")
    )
