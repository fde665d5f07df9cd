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


def test_quantile_normalize_invariants(spark):
    """Random data invariants: the calibrated value is always an
    actually-occurring global value, lies within the global range, and
    is monotone non-decreasing in the source-local value within each
    group (a rank mapping cannot invert order)."""
    from kaflow_spark.operators.curation import quantile_normalize

    rng = random.Random(11)
    rows = [
        (f"s{i % 7}", rng.randint(0, 50)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = quantile_normalize(df, "g", "v").collect()
    values = {v for _, v in rows}
    lo, hi = min(values), max(values)
    by_group: dict[str, list] = {}
    for r in out:
        assert r.calib in values
        assert lo <= r.calib <= hi
        assert 0 <= r.src_pct_bp < 10000
        by_group.setdefault(r.g, []).append((r.v, r.calib))
    for g, pairs in by_group.items():
        pairs.sort()
        calibs = [c for _, c in pairs]
        assert calibs == sorted(calibs), g


def test_histogram_drift_l1_bounds_and_identity(spark):
    """Drift is 0 for a group that IS the global distribution (single
    source) and bounded by 20000 bp always."""
    from kaflow_spark.operators.curation import histogram_drift_l1

    rng = random.Random(5)
    one = spark.createDataFrame(
        [("only", rng.randint(0, 1000)) for _ in range(100)], ["g", "v"]
    )
    r = histogram_drift_l1(one, "g", "v", 64).head()
    assert r.l1_bp == 0
    two = spark.createDataFrame(
        [("a", 10)] * 50 + [("b", 900)] * 50, ["g", "v"]
    )
    for row in histogram_drift_l1(two, "g", "v", 64).collect():
        # each source holds half the mass of a fully disjoint mixture:
        # |10000-5000| + |0-5000| = 10000 exactly
        assert row.l1_bp == 10000
        assert 0 <= row.l1_bp <= 20000


def test_winsorized_stats_bounds(spark):
    """Winsorized mean always lies within [lo, hi] and [min, max]."""
    from kaflow_spark.operators.curation import winsorized_stats

    rng = random.Random(3)
    rows = [(f"g{i % 4}", rng.randint(-500, 500)) for i in range(300)]
    df = spark.createDataFrame(rows, ["g", "v"])
    for r in winsorized_stats(df, "g", "v", 5, 95).collect():
        assert r.lo <= r.hi
        assert r.lo * 100 <= r.wmean_c <= r.hi * 100
