"""Event-sequence analytics over an events stream at rest: retention
cohorts and transition matrices — the behavioral reports an event
pipeline serves next to its windowed aggregates.

Scale shape: both operators reduce the raw event stream to narrow
keys before anything wide moves. Cohorts shuffle distinct
(user, day) pairs (partial-agg'd); transitions shuffle once on the
user id for the lag window and then aggregate a (type, type) matrix
that is tiny by construction (|event types|²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def retention_cohorts(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Classic retention cohort matrix: users are cohorted by their
    first active day; for each (cohort_day, offset_days) report how
    many of that cohort's users were active offset_days later. Emits
    ``(cohort_day, offset_days, n_users)``.

    Shape at scale: events collapse to DISTINCT (user, day) pairs
    first — partial-agg'd, so each partition emits at most
    users × days rows regardless of event volume. The cohort lookup
    is a self-aggregate joined back on the user id (same
    partitioning, AQE-reusable), and the final matrix groupBy
    produces cohorts × horizon rows — dashboard-sized."""
    days = df.select(
        F.col(user_col).alias("_u"), F.to_date(F.col(ts_col)).alias("_d")
    ).distinct()
    cohort = days.groupBy("_u").agg(F.min("_d").alias("cohort_day"))
    return (
        days.join(cohort, "_u")
        # (_u, _d) is distinct, so count(*) counts distinct users
        .groupBy(
            "cohort_day",
            F.datediff(F.col("_d"), F.col("cohort_day"))
            .cast("bigint")
            .alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def transition_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-user event-type transition matrix (first-order Markov
    counts): for each consecutive pair of events in a user's timeline
    — ordered by (ts, tiebreak) so ties are deterministic — count
    ``prev_type -> event_type`` occurrences and the per-prev_type
    transition share in integer basis points. Emits
    ``(prev_type, next_type, n, p_bp)``.

    Shape at scale: ONE shuffle (lag window on the user id); the
    matrix groupBy and the per-row denominator window both run over
    |event types|² rows — negligible. No floats: p_bp is exact
    integer division, so the result hash-matches any engine."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    )
    pairs = (
        df.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(type_col).alias("next_type"),
        )
        .withColumn("prev_type", F.lag("next_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.expr("(n * 10000) div sum(n) over (partition by prev_type)").alias(
            "p_bp"
        ),
    )


__all__ = ["retention_cohorts", "transition_counts"]
