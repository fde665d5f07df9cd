"""IVF index maintenance on kaflow_spark: the full drift-trigger loop.

Round-11 wiring of the three maintenance operators into the cycle a
long-lived ANN service actually runs (round-10 built them; nothing
drove the loop end-to-end):

    build -> serve -> corpus grows/drifts -> occupancy monitor trips
    -> ivf_refresh (rebuild or keep, by measured drift) -> re-tune
    nprobe for the target recall -> serve again

Every stage is a bounded-driver distributed operator: the quantizer
fit is sampled k-means, occupancy/drift are one partial-agg'd pass
each, and the tuner reads the whole recall-vs-nprobe curve off ONE
corpus pass (Q*k ground-truth rows on the driver).

    PYTHONPATH=/root/repo python examples/index_maintenance.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.operators.similarity import (
    ivf_fit,
    ivf_list_stats,
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

    # ---- the corpus outgrows the fit: new mass arrives in a region
    # the day-0 quantizer never saw (a shifted+negated copy — the
    # "new data source onboarded" drift every serving index meets)
    drifted = base.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: F.lit(2.5) - x
        ).alias("embedding"),
    )
    grown = base.unionByName(drifted)
    n1 = grown.count()

    # ---- always-on monitor: occupancy under the SERVING quantizer --
    skew1 = occupancy_skew_bp(
        ivf_list_stats(grown, "embedding", cents0).collect(), 16
    )
    print(
        f"monitor: {n1} vectors | hottest list {skew1} bp under the "
        f"day-0 quantizer ({'TRIP' if skew1 > 2 * 10000 // 16 else 'ok'})"
    )

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
