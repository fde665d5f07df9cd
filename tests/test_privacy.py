"""k-anonymity audit + generalization ladder (q176/q177) hand cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaflow_spark.operators.curation import (
    anonymity_generalization,
    k_anonymity_cells,
)


def _pop(spark):
    # nation A / seg X: 12 people in band 0 (safe), 2 in band 1 (risky
    # at full grain, safe once band dropped: 14 >= 10 -> level 1)
    rows = [("A", "X", 0, 100 + i) for i in range(12)]
    rows += [("A", "X", 1, 200 + i) for i in range(2)]
    # nation A / seg Y: 3 people -> seg-level 15 >= 10 -> level 2
    rows += [("A", "Y", 0, 300 + i) for i in range(3)]
    # nation B: 4 people total -> nothing reaches 10 -> level 3
    rows += [("B", "X", 0, 400 + i) for i in range(4)]
    return spark.createDataFrame(
        rows, "nation string, seg string, band int, bal bigint"
    )


def test_k_anonymity_flags_small_cells_with_l_diversity(spark):
    cells = k_anonymity_cells(
        _pop(spark), ["nation", "seg", "band"], "bal", k=10
    ).collect()
    got = {(r["nation"], r["seg"], r["band"]): (r["n_people"], r["l_distinct"])
           for r in cells}
    assert got == {
        ("A", "X", 1): (2, 2),
        ("A", "Y", 0): (3, 3),
        ("B", "X", 0): (4, 4),
    }


def test_k_anonymity_l_diversity_counts_distinct_only(spark):
    df = spark.createDataFrame(
        [("A", "X", 0, 7)] * 5, "nation string, seg string, band int, bal bigint"
    )
    [cell] = k_anonymity_cells(df, ["nation", "seg", "band"], "bal", k=10).collect()
    assert cell["n_people"] == 5 and cell["l_distinct"] == 1  # leaks bal


def test_generalization_ladder_levels(spark):
    out = anonymity_generalization(
        _pop(spark), ["nation", "seg", "band"], k=10
    ).collect()
    lvl = {(r["nation"], r["seg"], r["band"]): r["anon_level"] for r in out}
    assert lvl == {
        ("A", "X", 0): 0,  # 12 at full grain
        ("A", "X", 1): 1,  # 14 once band dropped
        ("A", "Y", 0): 2,  # 17 once seg dropped
        ("B", "X", 0): 3,  # nation B never reaches 10
    }


def test_generalization_level_len_means_population_only(spark):
    # tiny population: even the whole dataset < k -> max level
    df = spark.createDataFrame(
        [("A", "X", 0, 1), ("B", "Y", 1, 2)],
        "nation string, seg string, band int, bal bigint",
    )
    out = anonymity_generalization(df, ["nation", "seg", "band"], k=10).collect()
    assert all(r["anon_level"] == 3 for r in out)


def _py_waterfill(items, B):
    """Independent reference: sequential waterfill over the
    ratio-sorted list (the textbook formulation the closed-form
    window version must match exactly)."""
    items = sorted(items, key=lambda x: (x[1] / x[2], x[0]))
    W = sum(w for _, _, w in items)
    pre = 0
    BK = WK = None
    out = {}
    for k, c, w in items:
        Bk = B - pre
        if c * W <= Bk * w:
            out[k] = c
            pre += c
            W -= w
        else:
            if BK is None:
                BK, WK = Bk, W
            out[k] = BK * w // WK
    return out


def test_waterfill_matches_sequential_reference(spark):
    import random

    from kaflow_spark.operators.curation import capped_waterfill

    rng = random.Random(5)
    for trial in range(4):
        items = [
            (f"s{i:02d}", rng.randint(1, 500), rng.randint(1, 9))
            for i in range(12)
        ]
        total_cap = sum(c for _, c, _ in items)
        B = total_cap * rng.choice([3, 6, 9, 11]) // 10  # incl. B > sum(cap)
        df = spark.createDataFrame(items, "k string, cap bigint, w bigint")
        got = {
            r["k"]: r["allocation"]
            for r in capped_waterfill(df, "k", "cap", "w", F.lit(B)).collect()
        }
        want = _py_waterfill(items, min(B, 10**18))
        assert got == want, (trial, B, got, want)


def test_waterfill_invariants(spark):
    from kaflow_spark.operators.curation import capped_waterfill

    items = [("a", 50, 1), ("b", 500, 2), ("c", 500, 2), ("d", 5, 3)]
    B = 600
    rows = capped_waterfill(
        spark.createDataFrame(items, "k string, cap bigint, w bigint"),
        "k", "cap", "w", F.lit(B),
    ).collect()
    caps = dict((k, c) for k, c, _ in items)
    assert all(r["allocation"] <= caps[r["k"]] for r in rows)
    alloc_total = sum(r["allocation"] for r in rows)
    n_uncapped = sum(not r["capped"] for r in rows)
    assert alloc_total <= B
    assert B - alloc_total < max(n_uncapped, 1)  # slack only from floors
    # over-budget: everything capped, allocation == capacity
    rows2 = capped_waterfill(
        spark.createDataFrame(items, "k string, cap bigint, w bigint"),
        "k", "cap", "w", F.lit(10_000),
    ).collect()
    assert all(r["capped"] and r["allocation"] == caps[r["k"]] for r in rows2)


def test_cusum_closed_form_matches_recursion(spark):
    import random

    from kaflow_spark.operators.events import cusum_shifts

    rng = random.Random(9)
    rows = []
    series = {}
    for g in ("a", "b"):
        xs = [rng.randint(50, 150) for _ in range(40)]
        if g == "a":
            xs = xs[:20] + [x + 200 for x in xs[20:]]  # planted level shift
        series[g] = xs
        rows += [(g, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, i int, x bigint")
    got = {
        (r["g"], r["i"]): (r["cusum_pos"], r["cusum_neg"], r["shift_flag"])
        for r in cusum_shifts(df, "g", "i", "x", pct=10).collect()
    }
    for g, xs in series.items():
        n, t = len(xs), sum(xs)
        cp = cn = 0
        for i, x in enumerate(xs):
            dev = x * n - t
            cp = max(0, cp + dev)   # textbook recursion
            cn = max(0, cn - dev)
            flag = cp * 100 > t * n * 10 or cn * 100 > t * n * 10
            assert got[(g, i)] == (cp, cn, flag), (g, i)
    # the shifted series must actually flag, the stationary one not
    assert any(got[("a", i)][2] for i in range(40))
    assert not any(got[("b", i)][2] for i in range(40))


def test_cusum_final_prefix_sum_is_zero(spark):
    # construction sanity: sum of scaled deviations over the whole
    # series is identically zero, so cusum_pos at the last row equals
    # the running -min exactly (never negative)
    from kaflow_spark.operators.events import cusum_shifts

    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate([5, 100, 5, 5])],
        "g string, i int, x bigint",
    )
    rows = {r["i"]: r for r in cusum_shifts(df, "g", "i", "x").collect()}
    assert all(rows[i]["cusum_pos"] >= 0 and rows[i]["cusum_neg"] >= 0
               for i in rows)


def test_benford_near_conforming_sample_scores_near_zero(spark):
    from kaflow_spark.operators.curation import BENFORD_BP, benford_deviation

    # counts proportional to the expectation (1000 amounts): shares in
    # bp are count*10, so the distance is only the constants' own
    # truncation residue = sum|10*round(bp/10)-bp| = 9
    counts = [301, 176, 125, 97, 79, 67, 58, 51, 46]
    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [("g", d * 100 + 7)] * c  # cents starting with digit d
    df = spark.createDataFrame(rows, "g string, cents bigint")
    [r] = benford_deviation(df, "g", "cents").collect()
    want = sum(abs(c * 10 - bp) for c, bp in zip(counts, BENFORD_BP))
    assert (r["n_amounts"], r["l1_bp"]) == (1000, want) and want == 9


def test_benford_missing_digits_count_fully(spark):
    from kaflow_spark.operators.curation import BENFORD_BP, benford_deviation

    # every amount starts with 1: digits 2-9 are absent but still
    # contribute their whole expected share to the distance
    df = spark.createDataFrame([("g", 1999)] * 8, "g string, cents bigint")
    [r] = benford_deviation(df, "g", "cents").collect()
    assert r["l1_bp"] == (10000 - BENFORD_BP[0]) + sum(BENFORD_BP[1:])
    # zero and negative amounts are excluded, not miscounted
    df2 = spark.createDataFrame(
        [("g", 1999), ("g", 0), ("g", -500)], "g string, cents bigint"
    )
    [r2] = benford_deviation(df2, "g", "cents").collect()
    assert r2["n_amounts"] == 1


def test_gini_known_values(spark):
    from kaflow_spark.operators.curation import gini_bp

    rows = [("eq", i, 10) for i in range(10)]            # equal -> 0
    rows += [("one", 0, 100)] + [("one", i, 0) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "g string, id int, v bigint")
    got = {r["g"]: r["gini_bp"] for r in gini_bp(df, "g", "id", "v").collect()}
    assert got["eq"] == 0
    # all mass on one member of n: G = (n-1)/n = 0.9 -> 9000 bp
    assert got["one"] == 9000


def test_gini_matches_pairwise_definition(spark):
    import random

    from kaflow_spark.operators.curation import gini_bp

    rng = random.Random(13)
    vals = [rng.randint(0, 500) for _ in range(30)]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], "g string, id int, v bigint"
    )
    [r] = gini_bp(df, "g", "id", "v").collect()
    n, t = len(vals), sum(vals)
    mad = sum(abs(a - b) for a in vals for b in vals)  # mean abs diff * n^2
    want = (mad * 10000) // (2 * n * t)  # G = MAD / (2*mean)
    assert r["gini_bp"] == want


def test_temporal_state_join_boundaries(spark):
    # purchase exactly ON a state boundary joins the NEW run (half-open
    # intervals); a purchase before any state run drops
    import datetime as dt

    from kaflow_spark.operators.events import scd2_intervals

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        (1, 10, ts(10), "view"),
        (1, 20, ts(20), "click"),
        (1, 15, ts(15), "purchase"),   # inside the view run
        (1, 21, ts(20), "purchase"),   # exact boundary ts -> click run
        (1, 5, ts(5), "purchase"),     # before any state run -> drops
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    states = scd2_intervals(
        df.filter(F.col("event_type") != "purchase"), "user_id", "event_type"
    ).drop("n_events")
    purch = df.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    j = (
        purch.join(states, "user_id")
        .filter(
            (F.col("valid_from") <= F.col("ts"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select("event_id", "event_type")
        .collect()
    )
    got = {r["event_id"]: r["event_type"] for r in j}
    assert got == {15: "view", 21: "click"}


def test_ks_matches_scipy_style_definition(spark):
    import random

    from kaflow_spark.operators.curation import ks_drift_bp

    rng = random.Random(21)
    a = [rng.randint(0, 60) for _ in range(80)]          # group "a"
    b = [rng.randint(20, 100) for _ in range(50)]        # shifted rest
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = {r["g"]: r for r in ks_drift_bp(df, "g", "v").collect()}

    def ks_bp(x, y):
        pts = sorted(set(x) | set(y))
        nx, ny = len(x), len(y)
        d = max(
            abs(sum(1 for e in x if e <= p) * ny
                - sum(1 for e in y if e <= p) * nx)
            for p in pts
        )
        return d * 10000 // (nx * ny)

    assert got["a"]["ks_bp"] == ks_bp(a, b)
    assert got["b"]["ks_bp"] == ks_bp(b, a)
    assert got["a"]["n_group"] == 80 and got["a"]["n_rest"] == 50


def test_ks_identical_distributions_zero(spark):
    from kaflow_spark.operators.curation import ks_drift_bp

    rows = [("a", v) for v in (1, 2, 3)] * 4 + [("b", v) for v in (1, 2, 3)] * 4
    df = spark.createDataFrame(rows, "g string, v bigint")
    assert all(r["ks_bp"] == 0 for r in ks_drift_bp(df, "g", "v").collect())


def test_ks_disjoint_supports_full(spark):
    from kaflow_spark.operators.curation import ks_drift_bp

    rows = [("a", v) for v in (1, 2)] + [("b", v) for v in (10, 11, 12)]
    df = spark.createDataFrame(rows, "g string, v bigint")
    assert all(
        r["ks_bp"] == 10000 for r in ks_drift_bp(df, "g", "v").collect()
    )


def test_rank_agreement_extremes_and_reference(spark):
    import random

    from kaflow_spark.queries.audits import q184  # noqa: F401  (query fn)
    from pyspark.sql.window import Window

    # drive the same rank/d2 algebra the query uses, via a small frame
    def rho_rows(pairs):
        df = spark.createDataFrame(
            [("g", i, a, b) for i, (a, b) in enumerate(pairs)],
            "source string, doc_id int, score bigint, bits_bp bigint",
        )
        r1 = F.row_number().over(
            Window.partitionBy("source").orderBy("score", "doc_id")
        )
        r2 = F.row_number().over(
            Window.partitionBy("source").orderBy("bits_bp", "doc_id")
        )
        out = (
            df.select("source", r1.alias("r1"), r2.alias("r2"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    (F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))
                ).alias("d2"),
            )
            .select(
                F.expr(
                    "10000 - (60000 * d2) div greatest(n * (n * n - 1), 1)"
                ).alias("rho")
            )
            .collect()
        )
        return out[0]["rho"]

    # perfectly agreeing ranks
    assert rho_rows([(i, i * 10) for i in range(12)]) == 10000
    # perfectly inverted ranks
    assert rho_rows([(i, -i) for i in range(12)]) == -10000
    # random, tie-free: match the textbook d^2 formula exactly
    rng = random.Random(31)
    xs = rng.sample(range(1000), 25)
    ys = rng.sample(range(1000), 25)
    pairs = list(zip(xs, ys))
    rx = {v: i + 1 for i, v in enumerate(sorted(xs))}
    ry = {v: i + 1 for i, v in enumerate(sorted(ys))}
    d2 = sum((rx[a] - ry[b]) ** 2 for a, b in pairs)
    n = 25
    want = 10000 - (60000 * d2) // (n * (n * n - 1))
    assert rho_rows(pairs) == want


def test_weighted_median_hand_cases(spark):
    from kaflow_spark.operators.curation import weighted_median

    # both execution shapes (r15: grid=True is the one-exchange
    # contracted-table selector for bounded value domains) must agree
    rows = [("g", 10, 1), ("g", 20, 1), ("g", 30, 8)]  # weight mass at 30
    df = spark.createDataFrame(rows, "g string, v bigint, w bigint")
    for use_grid in (False, True):
        [r] = weighted_median(df, "g", "v", "w", grid=use_grid).collect()
        assert (r["wmedian"], r["n_rows"], r["total_weight"]) == (30, 3, 10)
        # exact half boundary: cum(10)=5, 2*5 >= 10 -> the LOWER value wins
        rows2 = [("g", 10, 5), ("g", 20, 5)]
        df2 = spark.createDataFrame(rows2, "g string, v bigint, w bigint")
        [r2] = weighted_median(df2, "g", "v", "w", grid=use_grid).collect()
        assert r2["wmedian"] == 10
        # unweighted (all w=1) == percentile_disc(0.5)
        vals = [3, 1, 4, 1, 5, 9, 2, 6]
        df3 = spark.createDataFrame(
            [("g", v, 1) for v in vals], "g string, v bigint, w bigint"
        )
        [r3] = weighted_median(df3, "g", "v", "w", grid=use_grid).collect()
        assert r3["wmedian"] == sorted(vals)[(len(vals) - 1) // 2]


def test_twap_holds_by_duration_not_frequency(spark):
    import datetime as dt

    from kaflow_spark.operators.events import twap

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    # value 100 holds 90s, then a 10-tick burst at 200 over 10s:
    # plain mean is ~191, TWAP is (100*90 + 200*10)/100 = 110
    rows = [("g", 1, ts(0), 100)]
    rows += [("g", 10 + i, ts(90 + i), 200) for i in range(10)]
    df = spark.createDataFrame(
        rows, "g string, event_id bigint, ts timestamp, cents bigint"
    )
    [r] = twap(df, ["g"], "ts", "event_id", "cents").collect()
    assert not r["degenerate"]
    assert r["span_s"] == 99
    # num = 100*90 + 200*(1*9 + last 0) ... compute independently:
    durs = [90] + [1] * 9 + [0]
    vals = [100] + [200] * 10
    want = sum(v * d for v, d in zip(vals, durs)) // 99
    assert r["twap"] == want and r["twap"] < 150  # duration-dominated
    # degenerate: all in the same second -> plain mean fallback
    df2 = spark.createDataFrame(
        [("g", i, ts(0), v) for i, v in enumerate((10, 20, 30))],
        "g string, event_id bigint, ts timestamp, cents bigint",
    )
    [r2] = twap(df2, ["g"], "ts", "event_id", "cents").collect()
    assert r2["degenerate"] and r2["twap"] == 20


def test_deterministic_sample_k_properties(spark):
    from kaflow_spark.operators.curation import deterministic_sample_k

    rows = [("a", i) for i in range(40)] + [("b", i) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, id bigint")
    s1 = deterministic_sample_k(df, "g", "id", 5, salt="x").collect()
    s2 = deterministic_sample_k(df, "g", "id", 5, salt="x").collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))  # reproducible
    by_g = {}
    for r in s1:
        by_g.setdefault(r["g"], []).append(r["id"])
    assert len(by_g["a"]) == 5          # exactly k
    assert sorted(by_g["b"]) == [0, 1, 2]  # small group keeps all
    s3 = deterministic_sample_k(df, "g", "id", 5, salt="y").collect()
    assert sorted(map(tuple, s3)) != sorted(map(tuple, s1))  # salt redraws
