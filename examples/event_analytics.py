"""Event-stream analytics on kaflow_spark.

The behavioral/observability half of the engine over an event table at
rest: retention cohorts, Markov transitions, session paths, OHLC bars,
gap-filled hourly series, metric drift (OLS trend), and two outlier
quarantines (z-score and robust MAD) — every report an exact-integer
declarative plan, so the same numbers come out of any engine and any
partitioning.

    PYTHONPATH=/root/repo python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.operators.events import (
    mad_outliers,
    retention_cohorts,
    transition_counts,
    value_trend,
    zscore_anomalies,
)
from kaflow_spark.queries import REGISTRY


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("event-analytics", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    e = load(spark, sf_dir, "events")
    n0 = e.count()

    # 1. retention: cohort users by first-seen day, track comebacks
    cohorts = retention_cohorts(e, "user_id", "ts")
    day1 = (
        cohorts.filter(F.col("offset_days") == 1)
        .agg(F.sum("n_users").alias("n"))
        .first()["n"]
    )

    # 2. behavior: first-order Markov transition matrix
    trans = transition_counts(e, "user_id", "ts", "event_type", "event_id")
    top_t = trans.orderBy(F.col("n").desc()).first()

    # 3. metric drift: per-type OLS slope in exact integer statistics
    trend = {r["event_type"]: r for r in value_trend(e, "event_type").collect()}
    steepest = max(trend.values(), key=lambda r: abs(r["slope_cents_per_day"] or 0))

    # 4. quarantine: mean-based and median-based outlier sets
    z = zscore_anomalies(e, "event_type").count()
    m = mad_outliers(e, "event_type").count()

    # 5. time series: gap-filled hourly bars (LOCF)
    filled = REGISTRY["q139_gapfill_locf"].spark(spark, sf_dir)
    gaps = filled.filter(F.col("is_gap")).count()
    cells = filled.count()

    # 6. history + sequence: SCD2 validity intervals and the ordered
    #    view->click->purchase funnel
    scd2 = REGISTRY["q141_scd2_intervals"].spark(spark, sf_dir)
    n_runs = scd2.count()
    funnel = {
        r["step"]: r for r in
        REGISTRY["q143_ordered_funnel"].spark(spark, sf_dir).collect()
    }

    print(f"events:                  {n0}")
    print(f"day-1 returners:         {day1}")
    print(
        f"top transition:          {top_t['prev_type']} -> {top_t['next_type']} "
        f"(n={top_t['n']}, {top_t['p_bp'] / 100:.0f}% of departures)"
    )
    print(
        f"steepest drift:          {steepest['event_type']} "
        f"{steepest['slope_cents_per_day']:+.1f} cents/day over n={steepest['n']}"
    )
    print(f"outliers (3-sigma):      {z}")
    print(f"outliers (3-MAD):        {m}  (robust to the extremes themselves)")
    print(f"hourly series:           {cells} cells, {gaps} gap-filled by LOCF")
    print(f"SCD2 history rows:       {n_runs} validity intervals")
    print(
        "ordered funnel:          "
        + " -> ".join(
            f"step{st} {funnel[st]['n_users']} ({funnel[st]['conv_bp'] / 100:.0f}%)"
            for st in sorted(funnel)
        )
    )

    # 8. data-health monitor: CUSUM level shifts on daily volume
    from kaflow_spark.operators.events import cusum_shifts

    ser = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias(
                "cents"
            ),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("day_cents"))
    )
    shifts = cusum_shifts(ser, "event_type", "day", "day_cents", pct=10)
    n_flag = shifts.filter(F.col("shift_flag")).count()
    worst = shifts.orderBy(F.col("cusum_pos").desc()).first()
    print(
        f"CUSUM monitor:           {n_flag} flagged days; peak drift "
        f"{worst['event_type']} @ {worst['day']}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
