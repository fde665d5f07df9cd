"""bench.py noise machinery (round-12 verdict item 3 + ADVICE).

The shipped round-12 artifact was recorded at loadavg 7.5 and carried
2.7x co-tenant inflation (q133 5.02 s vs a 1.73 s quiet median) that
slipped under the fixed k=3 outlier threshold. These tests replay that
adjudication without Spark: the threshold scales with load so a noisy
run self-labels, and the trailing-median regex is scoped to the
`"queries"` object so `"reruns"` retry samples never bias the baseline.
"""

from __future__ import annotations

import json

from bench import _flag_suspects, _outlier_k, _queries_from_tail


def test_queries_from_tail_ignores_reruns_block():
    tail = json.dumps(
        {
            "metric": "declared_query_suite_seconds",
            "value": 10.0,
            "queries": {"q133_example": 1.73, "q206_other": 2.35},
            "sf": 0.1,
            "reruns": {"q133_example": 5.02, "q206_other": 39.0},
            "suspect": [],
        }
    )
    got = _queries_from_tail(tail)
    assert got == {"q133_example": 1.73, "q206_other": 2.35}


def test_queries_from_tail_handles_truncated_tail():
    # driver tails are TRUNCATED json — the queries object may be cut
    tail = '{"metric": "x", "value": 1, "queries": {"q01_scan": 0.11, "q02_f'
    assert _queries_from_tail(tail) == {}  # no closing brace: no absorb
    assert _queries_from_tail("no queries here") == {}


def test_outlier_k_scales_with_load():
    assert _outlier_k(0.36) == 3.0
    assert _outlier_k(7.5) == 2.0
    assert _outlier_k(2.01) == 2.0
    # explicit env always wins
    assert _outlier_k(7.5, "4") == 4.0


def test_noisy_round12_artifact_self_labels():
    """Replay of the exact round-12 miss: q133 ran 5.02 s against a
    1.73 s trailing quiet median (2.9x) and q134 3.33 vs 1.37 (2.4x);
    at the recorded loadavg 7.5 the scaled k=2 must flag BOTH, while
    the same timings under a quiet loadavg would only flag the >3x."""
    timings = {
        "q133_example": 5.02,
        "q134_example": 3.33,
        "q135_example": 2.51,  # at its median: never flagged
        "q01_scan": 0.08,  # sub-50ms median: jitter, never flagged
    }
    medians = {
        "q133_example": 1.73,
        "q134_example": 1.37,
        "q135_example": 2.51,
        "q01_scan": 0.03,
    }
    k_noisy = _outlier_k(7.5)
    assert _flag_suspects(timings, medians, k_noisy) == [
        "q133_example",
        "q134_example",
    ]
    # quiet machine, same numbers: only the k=3 breach would flag
    # (here none do — exactly why the shipped artifact missed them)
    assert _flag_suspects(timings, medians, _outlier_k(0.4)) == []


def test_flag_suspects_ignores_unknown_queries():
    assert _flag_suspects({"q999_new": 100.0}, {}, 2.0) == []


def test_run_suspect_flags_uniform_inflation():
    """Round-13 miss: a uniformly-loaded run (EVERY query ~2x) clears
    the per-query k threshold round-trip — the 1151.6 s r13 history
    run recorded ZERO suspects. The RUN-level check must catch it off
    the trailing quiet (per-query min) totals."""
    from bench import _run_suspect

    quiet = {f"q{i:03d}_x": 1.0 for i in range(40)}
    loaded = {q: 2.0 for q in quiet}  # uniform 2x: no per-query flag
    assert _flag_suspects(loaded, quiet, 2.0) == []  # the r13 miss
    suspect, got, ref = _run_suspect(loaded, quiet, load_at_start=0.5)
    assert suspect and got == 80.0 and ref == 40.0
    # quiet run at quiet load: clean
    suspect, got, ref = _run_suspect(dict(quiet), quiet, 0.5)
    assert not suspect
    # high load at run start stamps the run even if totals look fine
    assert _run_suspect(dict(quiet), quiet, 5.0)[0]


def test_run_suspect_excludes_new_queries_and_abstains_when_thin():
    from bench import _run_suspect

    quiet = {f"q{i:03d}_x": 1.0 for i in range(30)}
    timings = dict.fromkeys(quiet, 1.0)
    timings["q999_new"] = 50.0  # no history: excluded from both sides
    suspect, got, ref = _run_suspect(timings, quiet, 0.5)
    assert not suspect and got == 30.0 and ref == 30.0
    # under min_common overlapping queries the ratio test abstains
    # (load still decides)
    assert _run_suspect({"q1_a": 9.0}, {"q1_a": 1.0}, 0.5) == (
        False,
        None,
        None,
    )
    assert _run_suspect({"q1_a": 9.0}, {"q1_a": 1.0}, 9.0)[0]


def test_trailing_mins_vs_medians():
    """The quiet reference is the per-query MIN over history (median
    absorbs prior loaded rounds and drifts with the noise it
    adjudicates)."""
    import bench

    hist = {"q1_a": [1.0, 2.2, 2.4], "q2_b": [0.5]}
    orig = bench._bench_history
    bench._bench_history = lambda sf: hist
    try:
        assert bench._trailing_mins(0.1) == {"q1_a": 1.0, "q2_b": 0.5}
        assert bench._trailing_medians(0.1) == {"q1_a": 2.2, "q2_b": 0.5}
    finally:
        bench._bench_history = orig


def test_wait_for_quiet_bounded(monkeypatch):
    import bench

    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.0, 9.0, 9.0))
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", sleeps.append)
    waited = bench._wait_for_quiet(threshold=2.0, max_wait=30, poll=10)
    assert waited == 30 and len(sleeps) == 3
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (0.5, 1.0, 1.0))
    assert bench._wait_for_quiet() == 0.0
