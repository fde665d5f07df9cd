"""Event-sequence operator semantics (oracle parity for q93/q94 is in
test_oracle.py)."""

from __future__ import annotations

import datetime as dt

from kaflow_spark.operators.events import (
    retention_cohorts,
    transition_counts,
)


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_retention_cohorts_matrix(spark):
    df = spark.createDataFrame(
        [
            # user 1: first day 1, returns day 2 and 4 (twice on day 2)
            (1, _ts(1)), (1, _ts(2)), (1, _ts(2, 5)), (1, _ts(4)),
            # user 2: first day 1 only
            (2, _ts(1)),
            # user 3: first day 2, returns day 4
            (3, _ts(2)), (3, _ts(4)),
        ],
        "user_id long, ts timestamp",
    )
    out = {(str(r["cohort_day"]), r["offset_days"]): r["n_users"]
           for r in retention_cohorts(df, "user_id", "ts").collect()}
    assert out[("2024-01-01", 0)] == 2          # users 1 and 2
    assert out[("2024-01-01", 1)] == 1          # user 1 (dup day deduped)
    assert out[("2024-01-01", 3)] == 1          # user 1
    assert out[("2024-01-02", 0)] == 1          # user 3
    assert out[("2024-01-02", 2)] == 1          # user 3
    assert len(out) == 5


def test_transition_counts_and_shares(spark):
    df = spark.createDataFrame(
        [
            # user 1 timeline: a -> b -> a  (same ts for 2nd/3rd:
            # event_id breaks the tie deterministically)
            (1, _ts(1), 10, "a"), (1, _ts(2), 11, "b"), (1, _ts(2), 12, "a"),
            # user 2 timeline: a -> c
            (2, _ts(1), 20, "a"), (2, _ts(3), 21, "c"),
        ],
        "user_id long, ts timestamp, event_id long, event_type string",
    )
    out = {(r["prev_type"], r["next_type"]): (r["n"], r["p_bp"])
           for r in transition_counts(
               df, "user_id", "ts", "event_type", "event_id").collect()}
    # from 'a': one a->b, one a->c -> 5000 bp each
    assert out[("a", "b")] == (1, 5000)
    assert out[("a", "c")] == (1, 5000)
    # from 'b': only b->a -> 10000 bp
    assert out[("b", "a")] == (1, 10000)
    assert len(out) == 3


def test_value_trend_exact_slope(spark, sf_dir):
    """OLS slope on a hand-built frame: y = 100 + 50x cents exactly."""
    from kaflow_spark.operators.events import value_trend

    rows = [("a", f"2024-01-{d+1:02d} 00:00:00", (100 + 50 * d) / 100.0) for d in range(5)]
    rows += [("b", "2024-01-01 00:00:00", 7.00)]  # degenerate x spread
    df = spark.createDataFrame(rows, "event_type string, ts string, value double")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = {r["event_type"]: r for r in value_trend(df, "event_type").collect()}
    assert out["a"]["slope_cents_per_day"] == 50.0
    assert out["a"]["n"] == 5
    assert out["b"]["slope_cents_per_day"] is None


def test_zscore_anomalies_flags_only_outlier(spark, sf_dir):
    """One wild value among near-constant ones is the only row out."""
    from kaflow_spark.operators.events import zscore_anomalies

    rows = [(i, "t", 10.00 + (i % 3) / 100.0) for i in range(50)]
    rows.append((99, "t", 500.00))
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
    out = zscore_anomalies(df, "event_type").collect()
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["value_cents"] == 50000


def test_mad_outliers_robust_to_contamination(spark, sf_dir):
    """A cluster of extreme values inflates sigma enough to hide from
    the z-score but not from the MAD rule (median unmoved)."""
    from kaflow_spark.operators.events import mad_outliers, zscore_anomalies

    rows = [(i, "t", 10.00 + (i % 5) / 100.0) for i in range(50)]
    rows += [(100 + i, "t", 400.00 + i) for i in range(6)]  # 6 extremes
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
    mad_ids = {r["event_id"] for r in mad_outliers(df, "event_type").collect()}
    z_ids = {r["event_id"] for r in zscore_anomalies(df, "event_type").collect()}
    assert {100 + i for i in range(6)} <= mad_ids  # MAD flags all extremes
    assert len(mad_ids) == 6  # and nothing else
    # the extreme cluster inflates sigma: z-score misses some of them
    assert len(z_ids) < 6


def test_mad_lower_median_even_group(spark):
    """Even-sized group: lower median (2*cum >= n) — deterministic."""
    from kaflow_spark.operators.events import mad_outliers

    rows = [(1, "t", 1.00), (2, "t", 2.00), (3, "t", 3.00), (4, "t", 40.00)]
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
    # med = 2.00 (lower), devs = [100,0,100,3800] cents, mad = 100
    out = {r["event_id"] for r in mad_outliers(df, "event_type").collect()}
    assert out == {4}


def test_interval_coverage_merges_swallowed_intervals(spark):
    """q152 semantics: an early long interval swallows later short
    ones; a true gap starts a new island."""
    from kaflow_spark.queries import REGISTRY  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    # user 1: [0,100) swallows [10,20) and [50,150)->extends to 150;
    # then gap; [200,210). covered = 150 + 10 = 160, 2 intervals.
    rows = [
        (1, 1, 0, 100),
        (2, 1, 10, 20),
        (3, 1, 50, 150),
        (4, 1, 200, 210),
    ]
    iv = spark.createDataFrame(rows, "event_id bigint, user_id bigint, s bigint, e bigint")
    w_prev = W.partitionBy("user_id").orderBy("s", "e", "event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    w_cum = W.partitionBy("user_id").orderBy("s", "e", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    flagged = iv.select(
        "user_id", "s", "e", "event_id",
        F.when(F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-(2**63))), 1)
        .otherwise(0).alias("brk"),
    )
    merged = (
        flagged.withColumn("grp", F.sum("brk").over(w_cum))
        .groupBy("user_id", "grp")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
    )
    out = merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("me") - F.col("ms")).alias("cov")
    ).collect()[0]
    assert out["n"] == 2 and out["cov"] == 160


def test_longest_streak_prefers_earliest_on_tie(spark, sf_dir):
    """q151 tie-break: two equal-length streaks -> the earlier wins."""
    import datetime as dt
    from kaflow_spark.queries import REGISTRY

    # fabricate via the registry function's logic on a tiny frame:
    # days 0,1  and  5,6 -> two 2-day streaks; expect start_day 0
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    days = spark.createDataFrame(
        [(7, d) for d in (0, 1, 5, 6)], "user_id bigint, d bigint"
    )
    w = W.partitionBy("user_id").orderBy("d")
    runs = (
        days.withColumn("grp", F.col("d") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"), F.min("d").alias("start_d"))
    )
    w_best = W.partitionBy("user_id").orderBy(F.desc("len"), "start_d")
    best = (
        runs.withColumn("rn", F.row_number().over(w_best))
        .filter("rn = 1")
        .collect()[0]
    )
    assert best["len"] == 2 and best["start_d"] == 0


def test_basket_lift_hand_case(spark):
    """basket_lift: N=4 baskets, n_a=n_b=3, n_c=1; (a,b) co-occurs
    twice -> 2*4/(3*3) = 0.888 = 8888 bp; (a,c) once -> 4/3 =
    13333 bp."""
    from pyspark.sql import functions as F

    from kaflow_spark.operators.events import basket_lift

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"), (2, "b"),  # duplicate item collapses
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "bid bigint, item string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["lift_bp"])
        for r in basket_lift(df, ["bid"], "item").collect()
    }
    assert got == {
        ("a", "b"): (2, 8888),
        ("a", "c"): (1, 13333),
    }
