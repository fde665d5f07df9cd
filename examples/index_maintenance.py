"""IVF index maintenance on kaflow_spark: the full drift-trigger loop,
APPEND-ONLY edition (round-13).

Round-11 wired the maintenance operators into the cycle a long-lived
ANN service runs; round-13 adds the 100 TB-honest append path — a
growing corpus must NOT rescan its base per append, so the rebuild
signal folds delta-only passes:

    build (+ baseline stats) -> serve -> appends arrive -> assign-only
    stats over EACH DELTA (ivf_corpus_stats, frozen centroids) folded
    into the running report (ivf_merge_stats, driver integers) ->
    cheap trigger reads err-growth/occupancy off the report
    (ivf_append_signal, zero jobs) -> on trip, the EXPENSIVE confirm
    (ivf_refresh: refit vs serving quantizer) decides rebuild ->
    re-tune nprobe -> serve again

Every stage is a bounded-driver distributed operator: the quantizer
fit is sampled k-means, per-delta stats are one partial-agg'd pass
over the delta alone, and the tuner reads the whole recall-vs-nprobe
curve off ONE corpus pass (Q*k ground-truth rows on the driver).

    PYTHONPATH=/root/repo python examples/index_maintenance.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.operators.similarity import (
    ivf_append_signal,
    ivf_corpus_stats,
    ivf_fit,
    ivf_list_stats,
    ivf_merge_stats,
    ivf_refresh,
    ivf_topk,
    ivf_tune_nprobe,
)

# maintenance policy: rebuild when a fresh fit REDUCES mean
# quantization error (cosine distance to the assigned centroid) by more
# than this, in basis points relative to the serving quantizer's error
# — ivf_refresh's drift_bp = (err_old - err_new) * 10000 / err_old.
# 1500 bp = "a refit would cut quantization error >15%", calibrated so
# sampling jitter on a stable corpus (~0-300 bp) never trips it while
# genuinely new mass (the drifted fixture measures >5000 bp) always
# does. (An earlier occupancy-shape L1 metric went blind when k-means++
# tiled evenly — see ivf_refresh's docstring.)
REBUILD_DRIFT_BP = 1500


def occupancy_skew_bp(stats_rows, n_lists: int) -> int:
    """Hot-list concentration in basis points (max share): the cheap
    always-on monitor a service reads per day — a fresh fit tiles the
    corpus near-evenly, so max-share creeping far above 10000/n_lists
    is the page that triggers the refresh decision below."""
    counts = {int(r["_ivf_list"]): int(r["n"]) for r in stats_rows}
    total = sum(counts.values()) or 1
    return max(counts.values(), default=0) * 10000 // total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("index-maintenance", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    base = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n0 = base.count()

    # ---- day 0: build + tune on the launch corpus -------------------
    cents0 = ivf_fit(base, "embedding", n_lists=16, seed=7)
    tune0 = ivf_tune_nprobe(
        base, "embedding", "vec_id", centroids=cents0, k=10, seed=7
    )
    skew0 = occupancy_skew_bp(
        ivf_list_stats(base, "embedding", cents0).collect(), 16
    )
    print(
        f"day 0:   {n0} vectors | nprobe {tune0['nprobe']} hits "
        f"recall {tune0['recall_bp'][tune0['nprobe']]} bp | "
        f"hottest list {skew0} bp"
    )

    # baseline report for the append-only signal: one pass at build
    # time, then the base corpus is NEVER rescanned by the monitor
    build_report = ivf_corpus_stats(base, "embedding", cents0)
    report = build_report

    # ---- append wave 1: same-distribution growth (a re-crawl) ------
    # assign-only stats over the DELTA alone, folded driver-side
    same = base.select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding"
    )
    report = ivf_merge_stats(
        report, ivf_corpus_stats(same, "embedding", cents0)
    )
    sig1 = ivf_append_signal(build_report, report)
    print(
        f"append1: +{sig1['added']} same-distribution vectors | "
        f"err growth {sig1['err_growth_bp']} bp -> "
        f"{'TRIP' if sig1['err_growth_bp'] > 500 else 'no action'}"
    )
    assert sig1["err_growth_bp"] <= 500  # a re-crawl must NOT trip

    # ---- append wave 2: new mass in a region the day-0 quantizer
    # never saw (a shifted+negated copy — the "new data source
    # onboarded" drift every serving index meets)
    drifted = base.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: F.lit(2.5) - x
        ).alias("embedding"),
    )
    report = ivf_merge_stats(
        report, ivf_corpus_stats(drifted, "embedding", cents0)
    )
    grown = base.unionByName(same).unionByName(drifted)
    n1 = report["n"]

    # ---- always-on monitors: the zero-job append signal + occupancy
    sig2 = ivf_append_signal(build_report, report)
    skew1 = max(report["occupancy"].values()) * 10000 // n1
    print(
        f"monitor: {n1} vectors | err growth {sig2['err_growth_bp']} bp, "
        f"hottest list {skew1} bp under the day-0 quantizer "
        f"({'TRIP' if sig2['err_growth_bp'] > 500 else 'ok'})"
    )
    assert sig2["err_growth_bp"] > 500  # the drifted wave must trip

    # ---- refresh decision: measured drift, not a guess --------------
    ref = ivf_refresh(grown, "embedding", cents0, seed=11)
    rebuild = ref["drift_bp"] > REBUILD_DRIFT_BP
    print(
        f"refresh: quantization-error drift {ref['drift_bp']} bp -> "
        f"{'REBUILD' if rebuild else 'keep serving fit'}"
    )
    cents1 = ref["centroids"] if rebuild else cents0

    # ---- re-tune nprobe on whichever quantizer survives --------------
    tune1 = ivf_tune_nprobe(
        grown, "embedding", "vec_id", centroids=cents1, k=10, seed=11
    )
    curve = ", ".join(
        f"{m}:{bp}" for m, bp in sorted(tune1["recall_bp"].items())[:6]
    )
    print(
        f"re-tune: nprobe {tune1['nprobe']} for >=9500 bp on the grown "
        f"corpus | curve head {{{curve}}}"
    )

    # ---- serve: one retrieval on the refreshed, re-tuned index ------
    q = [list(map(float, r["embedding"])) for r in base.limit(1).collect()][0]
    hits = ivf_topk(
        grown, "embedding", "vec_id", q,
        centroids=cents1, nprobe=tune1["nprobe"], k=5,
    ).collect()
    print(
        "serve:   top-5 for a day-0 query on the maintained index: "
        + ", ".join(f"{r['vec_id']}@{r['score']:.4f}" for r in hits)
    )

    # the loop's invariant: maintained index still meets the target
    assert tune1["recall_bp"][tune1["nprobe"]] >= 9500
    spark.stop()


if __name__ == "__main__":
    main()
