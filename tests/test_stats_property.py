"""Property-based checks for the exact-integer stats operators
(q131/q132/q138) against independent pure-Python references — the
operators' whole claim is engine-independent exactness, so a second,
structurally different implementation must agree bit-for-bit on
arbitrary inputs, not just the fixture."""

from __future__ import annotations

import datetime as dt
from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

import hypothesis.strategies as st
from hypothesis import given, settings

# two-decimal metric values in a realistic range, as exact doubles
values = st.decimals(
    min_value=Decimal("-500.00"),
    max_value=Decimal("500.00"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)
days = st.integers(min_value=0, max_value=29)
groups = st.sampled_from(["a", "b"])

rows = st.lists(
    st.tuples(groups, days, values), min_size=1, max_size=40
)


def _cents(v: Decimal) -> int:
    return int(v.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP) * 100)


@st.composite
def frames(draw):
    rs = draw(rows)
    return [
        (i, g, dt.datetime(2024, 1, 1 + d, 12, 0, 0), float(v))
        for i, (g, d, v) in enumerate(rs)
    ]


@given(frames())
@settings(max_examples=12, deadline=None)
def test_value_trend_matches_fraction_reference(spark, data):
    from kaflow_spark.operators.events import value_trend

    df = spark.createDataFrame(
        data, "event_id bigint, event_type string, ts timestamp, value double"
    )
    got = {
        r["event_type"]: (r["n"], r["slope_cents_per_day"])
        for r in value_trend(df, "event_type").collect()
    }
    by_g: dict[str, list[tuple[int, int]]] = {}
    for _i, g, ts, v in data:
        x = (ts.date() - dt.date(2024, 1, 1)).days
        by_g.setdefault(g, []).append((x, _cents(Decimal(repr(v)))))
    for g, pts in by_g.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        den = n * sxx - sx * sx
        want = None if den == 0 else float(n * sxy - sx * sy) / float(den)
        assert got[g][0] == n
        assert got[g][1] == want, (g, pts)


@given(frames())
@settings(max_examples=12, deadline=None)
def test_zscore_and_mad_match_integer_references(spark, data):
    from kaflow_spark.operators.events import mad_outliers, zscore_anomalies

    df = spark.createDataFrame(
        data, "event_id bigint, event_type string, ts timestamp, value double"
    )
    z_got = {r["event_id"] for r in zscore_anomalies(df, "event_type").collect()}
    m_got = {r["event_id"] for r in mad_outliers(df, "event_type").collect()}

    by_g: dict[str, list[tuple[int, int]]] = {}
    for i, g, _ts, v in data:
        by_g.setdefault(g, []).append((i, _cents(Decimal(repr(v)))))

    z_want, m_want = set(), set()
    for g, pts in by_g.items():
        n = len(pts)
        sy = sum(y for _, y in pts)
        syy = sum(y * y for _, y in pts)
        for i, y in pts:
            if (n * y - sy) ** 2 > 9 * (n * syy - sy * sy):
                z_want.add(i)
        ys = sorted(y for _, y in pts)
        # lower median: smallest value whose cumulative count reaches n/2
        med = ys[(n - 1) // 2] if n % 2 == 1 else ys[n // 2 - 1]
        devs = sorted(abs(y - med) for _, y in pts)
        mad = devs[(n - 1) // 2] if n % 2 == 1 else devs[n // 2 - 1]
        for i, y in pts:
            if abs(y - med) > 3 * mad:
                m_want.add(i)
    assert z_got == z_want
    assert m_got == m_want


import itertools

keys = st.text(alphabet="AB1", min_size=3, max_size=6)


@given(st.lists(keys, min_size=2, max_size=12, unique=True))
@settings(max_examples=10, deadline=None)
def test_hamming_pairs_recall_equals_brute_force(spark, ks):
    """Pigeonhole blocking must have recall 1 vs brute force on
    arbitrary keys (tiny alphabet maximizes collisions and near-miss
    pairs — the adversarial regime for blocking)."""
    from kaflow_spark.operators.dedup import hamming_pairs

    df = spark.createDataFrame(list(enumerate(ks)), "id bigint, key string")
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in
           hamming_pairs(df, "id", "key", max_dist=1).collect()}
    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(ks), 2):
        if len(a) == len(b):
            h = sum(x != y for x, y in zip(a, b))
            if h <= 1:
                want[(min(i, j), max(i, j))] = h
    assert got == want, (got, want)


@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 6)),  # (basket, item)
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None)
def test_basket_pairs_matches_brute_force(spark, rows_):
    from kaflow_spark.operators.curation import basket_pairs

    df = spark.createDataFrame(rows_, "o bigint, p bigint")
    got = {(r["p1"], r["p2"]): r["n_both"] for r in
           basket_pairs(df, "o", "p").collect()}
    baskets = {}
    for o, p in set(rows_):
        baskets.setdefault(o, set()).add(p)
    want = {}
    for items in baskets.values():
        for a, b in itertools.combinations(sorted(items), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.integers(1, 40),  # price cents (small domain forces ties)
            st.integers(1, 5),   # weight
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=8, deadline=None)
def test_weighted_median_selector_matches_reference(spark, rows_):
    """The 2*cumw >= totw selector == smallest value at or past half
    the total weight, on arbitrary weighted multisets."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows_, "g string, v bigint, w bigint")
    gagg = df.groupBy("g", "v").agg(F.sum("w").alias("ws"))
    w_cum = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy("g").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    got = {
        r["g"]: r["m"]
        for r in gagg.select(
            "g", "v",
            F.sum("ws").over(w_cum).alias("cw"),
            F.sum("ws").over(w_all).alias("tw"),
        )
        .filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("g")
        .agg(F.min("v").alias("m"))
        .collect()
    }
    by_g = {}
    for g, v, w in rows_:
        by_g.setdefault(g, []).append((v, w))
    for g, vw in by_g.items():
        tot = sum(w for _, w in vw)
        cum = 0
        want = None
        for v in sorted({v for v, _ in vw}):
            cum += sum(w for vv, w in vw if vv == v)
            if 2 * cum >= tot:
                want = v
                break
        assert got[g] == want, (g, vw)


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=8, deadline=None)
def test_scd2_intervals_match_run_length_reference(spark, evs):
    """q141's gaps-and-islands collapse == a straightforward per-user
    run-length encoding of the (ts, id)-ordered type sequence."""
    import datetime as dt
    from kaflow_spark.queries import REGISTRY  # noqa: F401 (registry import)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    rows = [
        (i, u, t, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i))
        for i, (u, t) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )
    # replicate the q141 pipeline over this frame
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_order.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = df.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(
            F.lag("event_type").over(w_order).isNull()
            | (F.lag("event_type").over(w_order) != F.col("event_type")),
            1,
        ).otherwise(0).alias("chg"),
    )
    runs = (
        flagged.withColumn("island", F.sum("chg").over(w_cum))
        .groupBy("user_id", "island")
        .agg(
            F.min("event_type").alias("t"),
            F.min("ts").alias("vf"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    got = sorted(
        (r["user_id"], r["t"], r["vf"], r["n"]) for r in runs.collect()
    )
    # reference: plain run-length encoding per user
    want = []
    by_u = {}
    for i, (u, t) in enumerate(evs):
        by_u.setdefault(u, []).append((i, t))
    for u, seq in by_u.items():
        run_t, run_start, run_n = None, None, 0
        for i, t in seq:  # already ts-ordered (ts == minutes(i))
            if t != run_t:
                if run_t is not None:
                    want.append((u, run_t, run_start, run_n))
                run_t, run_start, run_n = t, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 0
            run_n += 1
        want.append((u, run_t, run_start, run_n))
    assert got == sorted(want)
