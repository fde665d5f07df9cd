"""Brute-force property tests for the round-11 integer-selector math
(beyond the DuckDB hash gate: these check the CLAIMED invariants of
the exact arithmetic against naive Python recomputation)."""

from __future__ import annotations

from kaflow_spark.queries import REGISTRY


def test_q233_pareto_selector_vs_bruteforce(spark, sf_dir):
    """n_top80 equals the naive 'sort customers by revenue desc,
    count until cumulative >= 80% of total' answer per segment, and
    the invariants 1 <= n_top80 <= n_customers hold."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    truth = con.execute(
        """
        SELECT c.c_mktsegment AS segment, r.cents
        FROM (SELECT o_custkey,
                     CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                         * 100 AS BIGINT)) AS BIGINT) AS cents
              FROM orders GROUP BY 1) r
        JOIN customer c ON r.o_custkey = c.c_custkey
        """
    ).fetchall()
    by_seg: dict[str, list[int]] = {}
    for seg, cents in truth:
        by_seg.setdefault(seg, []).append(int(cents))
    expected = {}
    for seg, revs in by_seg.items():
        revs.sort(reverse=True)
        tot = sum(revs)
        cum = 0
        for i, v in enumerate(revs, start=1):
            cum += v
            if 5 * cum >= 4 * tot:
                expected[seg] = (i, len(revs), tot)
                break
    rows = REGISTRY["q233_pareto_coverage"].spark(spark, sf_dir).collect()
    got = {r["segment"]: r for r in rows}
    assert set(got) == set(expected)
    for seg, (n80, n, tot) in expected.items():
        r = got[seg]
        assert r["n_top80"] == n80, seg
        assert r["n_customers"] == n
        assert r["total_cents"] == tot
        assert 1 <= r["n_top80"] <= r["n_customers"]


def test_q234_silhouette_bounds_and_membership(spark, sf_dir):
    """Per-label silhouette means stay in [-10000, 10000], misplaced
    counts never exceed membership, and memberships sum to the
    vector count."""
    import pyarrow.parquet as pq

    rows = REGISTRY["q234_label_silhouette"].spark(spark, sf_dir).collect()
    n_vecs = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").metadata.num_rows
    assert sum(r["n"] for r in rows) == n_vecs
    for r in rows:
        assert -10000 <= r["mean_s_bp"] <= 10000
        assert 0 <= r["n_neg"] <= r["n"]


def test_q235_split_objective_is_argmax(spark, sf_dir):
    """The reported split day maximizes the quantized between-segment
    objective over every candidate split (recomputed naively from the
    daily dollar series), with the earliest-day tie-break."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    daily = con.execute(
        """
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100
                   AS BIGINT)) // 100 AS BIGINT) AS x
        FROM events
        WHERE event_type IS NOT NULL AND ts IS NOT NULL
          AND value IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[tuple[int, int]]] = {}
    for ty, d, x in daily:
        series.setdefault(ty, []).append((int(d), int(x)))
    rows = REGISTRY["q235_change_point"].spark(spark, sf_dir).collect()
    got = {r["event_type"]: r for r in rows}
    for ty, pts in series.items():
        if len(pts) < 2:
            assert ty not in got
            continue
        xs = [x for _, x in pts]
        n, s = len(xs), sum(xs)
        best = None
        sl = 0
        for j in range(1, n):
            sl += xs[j - 1]
            sr = s - sl
            k = (sl * sl * (n - j) + sr * sr * j) * 1000 // (j * (n - j))
            if best is None or k > best[0]:
                best = (k, pts[j - 1][0], j)
        r = got[ty]
        assert r["split_day"] == best[1], ty
        assert r["n_days"] == n


def test_round11_operators_handle_empty_inputs(spark):
    """The round-11 kernels return empty/identity results (never a
    stack trace) on empty inputs — the round-9/10 robustness
    discipline."""
    from kaflow_spark.operators.embeddings import squared_silhouette
    from kaflow_spark.operators.events import change_point_from_daily
    from kaflow_spark.streaming.curation import change_point_monitor

    empty_daily = spark.createDataFrame(
        [], "g string, day bigint, x bigint"
    )
    assert change_point_from_daily(empty_daily, "g", "day", "x").count() == 0
    # a single-day group has no valid split either
    one_day = spark.createDataFrame([("a", 1, 5)], "g string, day bigint, x bigint")
    assert change_point_from_daily(one_day, "g", "day", "x").count() == 0

    empty_v = spark.createDataFrame(
        [], "vec_id bigint, label bigint, embedding array<float>"
    )
    assert squared_silhouette(empty_v, "vec_id", "label", "embedding").count() == 0

    # monitor: empty first batch emits nothing and does not raise;
    # a later batch still produces the split
    calls = []
    handle = change_point_monitor(
        "g", "day", "cents", on_result=lambda b, r: calls.append((b, r))
    )
    empty_b = spark.createDataFrame([], "g string, day bigint, cents bigint")
    handle(empty_b, 0)
    assert calls == []
    handle(
        spark.createDataFrame(
            [("a", 1, 100), ("a", 2, 100), ("a", 3, 900)],
            "g string, day bigint, cents bigint",
        ),
        1,
    )
    assert len(calls) == 1 and calls[0][1][0]["split_day"] == 2


def test_change_point_overflow_guard_names_the_fix(spark):
    """Round-11 advice: the bigint objective key overflows once
    (sum|x|)^2 * n * 1000 exceeds 2^63. ANSI already errors loudly;
    the guard makes the failure NAME the remediation instead of
    surfacing as bare arithmetic overflow — and stays silent on
    in-bound series."""
    from kaflow_spark.operators.events import change_point_from_daily

    # in-bound: sums ~1e3, untouched result
    ok = spark.createDataFrame(
        [("a", d, 100 if d < 3 else 500) for d in range(6)],
        "g string, day bigint, x bigint",
    )
    row = change_point_from_daily(ok, "g", "day", "x").collect()[0]
    assert row["split_day"] == 2

    # out-of-bound: sum|x| ~ 4e9 over 4 days -> key ~ (4e9)^2*1000
    # >> 2^63; must fail with the guard's message, not raw overflow
    import pytest

    big = spark.createDataFrame(
        [("a", d, 10**9 + d) for d in range(4)],
        "g string, day bigint, x bigint",
    )
    with pytest.raises(Exception, match="DECIMAL\\(38,0\\)"):
        change_point_from_daily(big, "g", "day", "x").collect()


def test_change_point_monitor_max_days_evicts_per_group(spark):
    """Round-11 advice: max_days bounds the driver accumulator AND
    the re-fit cost. Contract: per-group sliding window — cells older
    than that group's max day - max_days + 1 are evicted after every
    merge, so the emission equals the batch operator on the WINDOWED
    series, and a late row past the horizon cannot resurrect an
    evicted day."""
    from kaflow_spark.operators.events import change_point_from_daily
    from kaflow_spark.streaming.curation import change_point_monitor

    calls = []
    handle = change_point_monitor(
        "g", "day", "cents",
        on_result=lambda b, r: calls.append(r),
        max_days=5,
    )
    # batch 0: days 0-5 (6 days; day 0 must evict: horizon is 1..5)
    handle(
        spark.createDataFrame(
            [("a", d, (1000 if d < 3 else 5000) + d) for d in range(6)],
            "g string, day bigint, cents bigint",
        ),
        0,
    )
    want = {
        r["split_day"]: r
        for r in change_point_from_daily(
            spark.createDataFrame(
                [("a", d, ((1000 if d < 3 else 5000) + d) // 100) for d in range(1, 6)],
                "g string, day bigint, x bigint",
            ),
            "g", "day", "x",
        ).collect()
    }
    got = calls[-1][0]
    assert got["n_days"] == 5  # day 0 evicted
    assert (got["split_day"], got["shift"]) in {
        (k, v["shift"]) for k, v in want.items()
    }

    # batch 1: a LATE row for the evicted day 0 — past the horizon,
    # must NOT resurrect it; a second group's window is independent
    handle(
        spark.createDataFrame(
            [("a", 0, 99900), ("b", 10, 100), ("b", 11, 900)],
            "g string, day bigint, cents bigint",
        ),
        1,
    )
    by_g = {r["g"]: r for r in calls[-1]}
    assert by_g["a"]["n_days"] == 5  # unchanged: late row evicted again
    assert by_g["a"]["split_day"] == got["split_day"]
    assert by_g["b"]["n_days"] == 2
