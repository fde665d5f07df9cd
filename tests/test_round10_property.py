"""Independent-reference property tests for the round-10 growth
suite: the accounting identity and a brute-force python reference for
growth accounting, a pandas reference for stickiness, and the
correlation kernel against numpy on random integer series."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kaflow_spark.queries import REGISTRY


def _mini_events(spark, seed=10, n=400, types=3, users=12, days=20):
    rng = random.Random(seed)
    rows = [
        (
            i,
            f"2024-03-{1 + rng.randrange(days):02d} "
            f"{rng.randrange(24):02d}:{rng.randrange(60):02d}:00",
            rng.randrange(users),
            f"t{rng.randrange(types)}",
            round(rng.uniform(-50, 200), 2),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts_s string, user_id bigint, "
        "event_type string, value double"
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        F.lit(None).cast("string").alias("props"),
    )


def test_growth_accounting_identity_and_reference(spark, tmp_path):
    """new + retained + resurrected == active on every emitted row,
    and all five counts match a brute-force python reference."""
    df = _mini_events(spark)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    out = REGISTRY["q209_growth_accounting"].spark(spark, str(tmp_path))
    rows = out.collect()
    assert rows, "fixture must produce growth rows"
    for r in rows:
        assert r["n_new"] + r["n_retained"] + r["n_resurrected"] == r[
            "n_active"
        ], r

    act = {
        (x["event_type"], x["user_id"], x["d"])
        for x in df.select(
            "event_type", "user_id", F.to_date("ts").alias("d")
        ).collect()
    }
    first = {}
    for t, u, d in act:
        k = (t, u)
        first[k] = min(first.get(k, d), d)
    by_day = {}
    for t, u, d in act:
        by_day.setdefault((t, d), set()).add(u)
    want = {}
    for (t, d), users in sorted(by_day.items()):
        import datetime

        prev = by_day.get((t, d - datetime.timedelta(days=1)), set())
        want[(t, d)] = (
            len(users),
            sum(1 for u in users if first[(t, u)] == d),
            len(users & prev),
            sum(
                1
                for u in users
                if u not in prev and first[(t, u)] < d
            ),
            len(prev - users),
        )
    got = {
        (r["event_type"], r["day"]): (
            r["n_active"], r["n_new"], r["n_retained"],
            r["n_resurrected"], r["n_churned"],
        )
        for r in rows
    }
    # churned-only days (active yesterday, nobody today) are not
    # emitted (n_active = 0): compare on emitted days only, and check
    # the reference agrees about which those are
    assert set(got) == {k for k, v in want.items() if v[0] > 0}
    for k in got:
        assert got[k] == want[k], (k, got[k], want[k])


def test_stickiness_bounds_and_window_membership(spark, tmp_path):
    """dau <= mau, 0 < stickiness_bp <= 10000, and mau equals the
    28-day distinct-union reference on every emitted day."""
    df = _mini_events(spark, seed=11)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    out = REGISTRY["q210_dau_mau_stickiness"].spark(spark, str(tmp_path))
    rows = out.collect()
    assert rows
    act = {}
    for x in df.select(
        "event_type", "user_id", F.to_date("ts").alias("d")
    ).collect():
        act.setdefault((x["event_type"], x["d"]), set()).add(x["user_id"])
    import datetime

    for r in rows:
        assert 1 <= r["dau"] <= r["mau"], r
        assert 0 < r["stickiness_bp"] <= 10000, r
        window_users = set()
        for off in range(28):
            window_users |= act.get(
                (r["event_type"], r["day"] - datetime.timedelta(days=off)),
                set(),
            )
        assert r["mau"] == len(window_users), r
        assert r["dau"] == len(act[(r["event_type"], r["day"])]), r


def test_cross_type_correlation_matches_numpy(spark, tmp_path):
    """q213's per-pair Pearson against numpy.corrcoef on the same
    aligned integer series (tolerance 1e-9 = the ROUND grain)."""
    import numpy as np

    df = _mini_events(spark, seed=12, n=800, types=3, users=20, days=25)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    out = REGISTRY["q213_cross_type_correlation"].spark(spark, str(tmp_path))
    got = {
        (r["type_a"], r["type_b"]): (r["n"], r["corr_r"]) for r in out.collect()
    }
    assert got

    ser = {}
    for x in (
        df.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.to_date("ts").alias("d"),
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").alias("v"))
        .collect()
    ):
        ser.setdefault(x["event_type"], {})[x["d"]] = x["v"]
    types = sorted(ser)
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            days = sorted(set(ser[ta]) & set(ser[tb]))
            xs = np.array([ser[ta][d] for d in days], dtype=np.float64)
            ys = np.array([ser[tb][d] for d in days], dtype=np.float64)
            n, r = got[(ta, tb)]
            assert n == len(days)
            if xs.std() == 0 or ys.std() == 0:
                assert r is None
            else:
                assert abs(r - float(np.corrcoef(xs, ys)[0, 1])) < 1e-8, (
                    ta, tb, r,
                )


def test_round10_operators_handle_empty_inputs(spark):
    """Empty frames flow through the round-10 operators without
    errors; the IVF tuner raises a clear error instead of a numpy
    stack trace on an empty corpus."""
    import pytest

    from kaflow_spark.operators.events import (
        growth_accounting,
        returning_rate,
        rolling_wau,
    )
    from kaflow_spark.operators.graph import triangle_count
    from kaflow_spark.operators.similarity import ivf_tune_nprobe

    empty_a = spark.createDataFrame([], "g string, day bigint, user bigint")
    assert rolling_wau(empty_a, "g", "day", "user").count() == 0
    assert returning_rate(empty_a, "g", "day", "user").count() == 0
    assert growth_accounting(empty_a, "g", "day", "user").count() == 0

    empty_e = spark.createDataFrame([], "a bigint, b bigint")
    assert triangle_count(empty_e).collect()[0]["n_triangles"] == 0

    empty_v = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        ivf_tune_nprobe(
            empty_v, "embedding", "vec_id",
            centroids=[[1.0, 0.0], [0.0, 1.0]],
        )


def test_streaming_twin_batch_fallbacks(spark):
    """The round-10 streaming twins run the exact batch operator on
    non-streaming frames (the TestClient path), including the
    internal distinct."""
    from kaflow_spark.operators.events import growth_accounting
    from kaflow_spark.streaming.stateful import (
        streaming_growth,
        streaming_returning_rate,
        streaming_wau,
    )

    rows = [("t", 0, 1), ("t", 0, 1), ("t", 1, 1), ("t", 1, 2)]
    df = spark.createDataFrame(rows, "g string, day bigint, user bigint")
    wau = {
        (r["g"], r["day"]): r["wau"]
        for r in streaming_wau(df, "g", "day", "user").collect()
    }
    assert wau == {("t", 0): 1, ("t", 1): 2}
    rr = {
        (r["g"], r["day"]): (r["n_active"], r["n_returning"])
        for r in streaming_returning_rate(df, "g", "day", "user").collect()
    }
    assert rr == {("t", 0): (1, 0), ("t", 1): (2, 1)}
    want = {
        (r["g"], r["day"]): r["n_new"]
        for r in growth_accounting(
            df.distinct(), "g", "day", "user"
        ).collect()
    }
    got = {
        (r["g"], r["day"]): r["n_new"]
        for r in streaming_growth(df, "g", "day", "user").collect()
    }
    assert got == want and got[("t", 1)] == 1
