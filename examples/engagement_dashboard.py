"""Engagement & provenance dashboard on kaflow_spark (round-10 suite).

The product-analytics layer a deployment runs on top of the round-9
volume monitors — who is arriving, staying, leaving; how sticky usage
is; whether two metrics co-move; and which provenance cell shipped the
odd vectors:

growth     — daily new/retained/resurrected/churned accounting per
             event type (q209; new + retained + resurrected = active
             by construction)
stickiness — DAU/MAU in basis points (q210)
timing     — inter-event gap digit histogram, the bot-vs-organic
             fingerprint (q211)
co-movement— pairwise Pearson between types' daily cent volumes over
             aligned days, exact moments (q213)
text       — per-source hapax share, the vocabulary-freshness signal
             for mixture weighting (q212)
vectors    — embedding norms by document provenance (q214)
live       — the rolling-WAU KPI as an always-on stream
             (streaming_wau: bounded state, batch-equal emissions)

    PYTHONPATH=/root/repo python examples/engagement_dashboard.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.queries import REGISTRY


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("engagement-dashboard", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- growth accounting: the DAU decomposition
    growth = REGISTRY["q209_growth_accounting"].spark(spark, sf_dir)
    worst = (
        growth.withColumn(
            "churn_bp",
            F.expr(
                "n_churned * 10000 div greatest(n_active + n_churned, 1)"
            ),
        )
        .orderBy(F.desc("churn_bp"))
        .limit(3)
        .collect()
    )
    print("growth accounting (worst churn days):")
    for r in worst:
        print(
            f"  {r.event_type:>10} {r.day} active={r.n_active}"
            f" new={r.n_new} retained={r.n_retained}"
            f" resurrected={r.n_resurrected} churned={r.n_churned}"
        )

    # ---- stickiness: DAU/MAU
    stick = REGISTRY["q210_dau_mau_stickiness"].spark(spark, sf_dir)
    by_type = (
        stick.groupBy("event_type")
        .agg(F.expr("sum(dau * 10000 div mau) div count(*)").alias("avg_bp"))
        .orderBy(F.desc("avg_bp"))
        .collect()
    )
    print("stickiness (avg DAU/MAU bp):")
    for r in by_type:
        print(f"  {r.event_type:>10} {r.avg_bp} bp")

    # ---- timing fingerprint: gap digit histogram
    gaps = REGISTRY["q211_interarrival_histogram"].spark(spark, sf_dir)
    print("inter-event gap digits (seconds magnitude):")
    for r in gaps.orderBy("event_type", "gap_digits").collect()[:8]:
        print(f"  {r.event_type:>10} ~1e{r.gap_digits - 1}s n={r.n}")

    # ---- co-movement: which metric pairs track each other
    corr = REGISTRY["q213_cross_type_correlation"].spark(spark, sf_dir)
    print("cross-type daily correlation:")
    for r in corr.collect():
        c = "None" if r.corr_r is None else f"{r.corr_r:+.3f}"
        print(f"  {r.type_a} ~ {r.type_b}: r={c} over {r.n} aligned days")

    # ---- text freshness + vector provenance
    hap = REGISTRY["q212_source_hapax_share"].spark(spark, sf_dir)
    print("per-source hapax share:")
    for r in hap.collect():
        print(
            f"  {r.source:>10} vocab={r.distinct_tokens}"
            f" hapax={r.hapax} ({r.hapax_bp} bp)"
        )
    vec = REGISTRY["q214_vector_provenance_audit"].spark(spark, sf_dir)
    print("vector norms by provenance (first 5 cells):")
    for r in vec.collect()[:5]:
        print(
            f"  {r.source}/{r.lang}: n={r.n_vecs}"
            f" norm_micro=[{r.min_norm}..{r.max_norm}] mean={r.mean_norm}"
        )

    # ---- live: the WAU KPI as an always-on stream, bounded state
    from kaflow_spark.operators.events import rolling_wau
    from kaflow_spark.streaming.stateful import streaming_wau

    act = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.expr("CAST(ts AS LONG) div 86400").alias("day_i"),
            "user_id",
        )
    )
    with tempfile.TemporaryDirectory() as td:
        act.coalesce(4).write.parquet(td, mode="overwrite")
        stream = (
            spark.readStream.schema(
                "event_type string, day_i bigint, user_id bigint"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(td)
        )
        latest = {}

        def sink(bdf, bid):
            for r in bdf.collect():
                latest[(r["event_type"], r["day_i"])] = r["wau"]

        q = (
            streaming_wau(stream, "event_type", "day_i", "user_id")
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        batch = {
            (r["event_type"], r["day_i"]): r["wau"]
            for r in rolling_wau(
                act.distinct(), "event_type", "day_i", "user_id"
            ).collect()
        }
        agree = sum(1 for k, v in latest.items() if batch.get(k) == v)
        print(
            f"live WAU monitor: {len(latest)} (type, day) points emitted,"
            f" {agree}/{len(latest)} equal to the batch operator"
            f" (trailing-horizon points; older days were emitted fresh)"
        )


if __name__ == "__main__":
    main()
