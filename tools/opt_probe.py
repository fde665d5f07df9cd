"""Round-14 optimization probe: best-of-N noop-sink timings and
formatted-plan capture for named declared queries.

    python tools/opt_probe.py q148_weighted_median_price q185_weighted_median
    python tools/opt_probe.py --plans plans/r14 --suffix before q148_weighted_median_price
    python tools/opt_probe.py --n 3 --all-top 30   # top-N by trailing quiet cost

Runs on the bench session posture (get_spark, warmed workers, fixture
tables pre-registered) so numbers are comparable to bench.py entries.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaflow_spark.plans.explain import explain_str
from kaflow_spark.queries import REGISTRY
from kaflow_spark.session import get_spark, warm_python_workers


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory to write <q>_<suffix>.txt explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-time", action="store_true", help="plans only, skip timed runs")
    args = ap.parse_args()

    names = []
    for q in args.queries:
        matches = [n for n in sorted(REGISTRY) if n == q or n.startswith(q + "_") or n.split("_")[0] == q]
        if not matches:
            print(f"no query matches {q!r}", file=sys.stderr)
            return 2
        names.extend(matches)

    spark = get_spark("opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    run = lambda df: df.write.format("noop").mode("overwrite").save()
    # bench-comparable warmup
    run(REGISTRY["q01_scan_project"].spark(spark, args.sf_dir))
    warm_python_workers(spark)
    from kaflow_spark.catalog import TABLES, load

    for t in TABLES:
        load(spark, args.sf_dir, t)

    for name in names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = REGISTRY[name].spark(spark, args.sf_dir)
            path = os.path.join(args.plans, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(explain_str(df))
            print(f"plan -> {path}")
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        best, samples = float("inf"), []
        for _ in range(args.n):
            t0 = time.perf_counter()
            run(REGISTRY[name].spark(spark, args.sf_dir))
            dt = time.perf_counter() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        print(f"{name}: best {best:.3f}s  samples {samples}")
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
