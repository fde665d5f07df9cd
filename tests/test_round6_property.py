"""Property tests for the round-6 operators against independent
references: pandas merge_asof for the nearest as-of (tie-free draws —
pandas' tie rule is unspecified), and a pure-python brute force for
the deletion-neighborhood edit-distance join on random short keys."""

from __future__ import annotations

import itertools
import random

import datetime as dt

import pandas as pd

from kaflow_spark.operators.asof import asof_join
from kaflow_spark.operators.resolution import edit_distance_pairs


def test_asof_nearest_matches_pandas_merge_asof(spark):
    rng = random.Random(42)
    # integer-second timestamps; distances made tie-free by parity:
    # left ts are even, right ts odd -> |l - r| is always odd and two
    # right rows at distance d and d' collide only if d == d' with
    # both odd — exclude by uniqueness of right ts per key
    rows_l, rows_r = [], []
    for k in range(8):
        lts = sorted(rng.sample(range(0, 20_000, 2), 40))
        rts = sorted(rng.sample(range(1, 20_001, 2), 25))
        rows_l += [(k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t)) for t in lts]
        rows_r += [
            (k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), f"v{k}_{t}")
            for t in rts
        ]
    # drop ties: a left ts exactly between two right ts (d == d')
    by_key: dict[int, list[dt.datetime]] = {}
    for k, t, _ in rows_r:
        by_key.setdefault(k, []).append(t)
    def tie_free(row):
        k, t = row
        ds = sorted(abs((t - rt).total_seconds()) for rt in by_key[k])
        return len(ds) < 2 or ds[0] != ds[1]
    rows_l = [r for r in rows_l if tie_free(r)]

    left = spark.createDataFrame(rows_l, ["k", "lts"])
    right = spark.createDataFrame(rows_r, ["k", "rts", "v"])
    got = {
        (r.k, r.lts): r.v_right
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            value_cols=["v"], direction="nearest",
        ).collect()
    }
    pl = pd.DataFrame(rows_l, columns=["k", "lts"]).sort_values("lts")
    pr = pd.DataFrame(rows_r, columns=["k", "rts", "v"]).sort_values("rts")
    want_df = pd.merge_asof(
        pl, pr, left_on="lts", right_on="rts", by="k", direction="nearest"
    )
    want = {
        (r.k, r.lts): (None if pd.isna(r.v) else r.v)
        for r in want_df.itertuples()
    }
    assert got == want


def test_edit_distance_pairs_random_keys(spark):
    rng = random.Random(7)
    alpha = "abc"
    keys = list(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(0, 5)))
            for _ in range(60)
        }
    )
    df = spark.createDataFrame(list(enumerate(keys)), ["id", "key"])
    got = {
        (r.id_a, r.id_b): r.lev
        for r in edit_distance_pairs(df, "id", "key").collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (i, j): lev(keys[i], keys[j])
        for i, j in itertools.combinations(range(len(keys)), 2)
        if lev(keys[i], keys[j]) <= 1
    }
    assert got == want
    assert want  # tiny alphabet guarantees distance-1 structure exists
