"""Seasonality & burst monitoring on kaflow_spark (round-9 suite).

The volume-health monitors an event pipeline runs per metric before
trusting day-over-day comparisons — each one an engine query/operator
emitting a small audit frame:

shape     — lag-1..7 autocorrelation says IF there is a weekly cycle
            (q198); the day-of-week profile says what it looks like
            (q199)
baseline  — trailing 7-day rolling exact median per type (q193), the
            robust baseline a single outlier day cannot drag
bursts    — spike-day audit vs the (current-day-excluding) trailing
            median (q200); sustained shifts via the streaming CUSUM
            twin with a RETENTION HORIZON, so an always-on monitor's
            state stays bounded (round-9 streaming_cusum(horizon=...))
behavior  — event-type co-occurrence lift over (user, day) baskets
            (q194 / operators.events.basket_lift)

    PYTHONPATH=/root/repo python examples/seasonality_monitoring.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.queries import REGISTRY


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("seasonality-monitoring", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- shape: is there a weekly cycle, and what does it look like?
    acf = REGISTRY["q198_volume_autocorrelation"].spark(spark, sf_dir)
    strongest = (
        acf.orderBy(F.desc(F.abs(F.col("acf")))).limit(3).collect()
    )
    print("autocorrelation (strongest lags):")
    for r in strongest:
        print(f"  {r.event_type:>10} lag={r.k} acf={r.acf:+.3f}")
    prof = REGISTRY["q199_weekday_profile"].spark(spark, sf_dir)
    peak = (
        prof.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy(
                    F.desc("share_bp"), "dow"
                )
            ),
        )
        .filter("rk = 1")
        .collect()
    )
    print("weekday peaks (0=Mon):")
    for r in sorted(peak, key=lambda r: r.event_type):
        print(f"  {r.event_type:>10} dow={r.dow} share={r.share_bp}bp")

    # ---- baseline + bursts -------------------------------------------
    med = REGISTRY["q193_rolling_median_7d"].spark(spark, sf_dir)
    spikes = REGISTRY["q200_spike_days"].spark(spark, sf_dir)
    n_spikes = spikes.filter("spike").count()
    print(
        f"rolling baseline: {med.count()} (type, day) bars; "
        f"spike days flagged: {n_spikes}"
    )

    # ---- sustained shifts: bounded-state streaming CUSUM -------------
    from kaflow_spark.streaming.stateful import streaming_cusum

    daily = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("CAST(ts AS LONG) div 86400").alias("day"),
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("day_cents"))
    )
    staged = tempfile.mkdtemp(prefix="season-")
    daily.repartition(4).write.mode("overwrite").parquet(staged)
    stream = (
        spark.readStream.schema("event_type string, day long, day_cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    latest = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            latest[(r["event_type"], r["day"])] = r

    horizon = 14
    out = streaming_cusum(
        stream, "event_type", "day", "day_cents", pct=10, horizon=horizon
    )
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    # bounded state: only the trailing `horizon` periods per type remain
    flagged = sum(1 for r in latest.values() if r["shift_flag"])
    print(
        f"windowed CUSUM (horizon={horizon}): {len(latest)} bars emitted "
        f"over the run (state itself holds <= {horizon} periods/type — "
        f"kernel-tested), {flagged} flagged"
    )
    batch_twin = streaming_cusum(
        daily, "event_type", "day", "day_cents", pct=10, horizon=horizon
    )
    stream_final = sorted(
        (t, d, r["cusum_pos"], r["cusum_neg"])
        for (t, d), r in latest.items()
        if d > max(dd for (tt, dd) in latest if tt == t) - horizon
    )
    batch_rows = sorted(
        (r["event_type"], r["day"], r["cusum_pos"], r["cusum_neg"])
        for r in batch_twin.collect()
    )
    assert stream_final == batch_rows, "stream != batch on trailing window"
    print("windowed CUSUM: closed stream == batch twin on the horizon")

    # ---- bursts, live: the streaming spike twin as a CHRONOLOGICAL
    # feed (unlike full-series CUSUM, the windowed statistic evicts
    # old periods, so it expects day-ordered arrival — the posture of
    # any real daily rollup feed; weekly chunks appended in order)
    from kaflow_spark.streaming.stateful import streaming_spike

    lo, hi = daily.agg(F.min("day"), F.max("day")).first()
    staged2 = tempfile.mkdtemp(prefix="season-ordered-")
    spark.createDataFrame([], daily.schema).write.mode("overwrite").parquet(
        staged2
    )
    stream2 = (
        spark.readStream.schema("event_type string, day long, day_cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged2)
    )
    spike_latest = {}

    def spike_sink(bdf, bid):
        for r in bdf.collect():
            spike_latest[(r["event_type"], r["day"])] = r

    q2 = (
        streaming_spike(stream2, "event_type", "day", "day_cents")
        .writeStream.outputMode("update")
        .foreachBatch(spike_sink)
        .start()
    )
    try:
        for start in range(lo, hi + 1, 7):
            daily.filter(
                (F.col("day") >= start) & (F.col("day") < start + 7)
            ).coalesce(1).write.mode("append").parquet(staged2)
            q2.processAllAvailable()
    finally:
        q2.stop()
    batch_spikes = {
        (r["event_type"], (r["day"] - __import__("datetime").date(1970, 1, 1)).days)
        for r in spikes.filter("spike").collect()
    }
    stream_spikes = {
        k for k, r in spike_latest.items() if r["spike"]
    }
    assert stream_spikes == batch_spikes, "stream spike set != batch q200"
    print(
        f"streaming spike monitor: {len(spike_latest)} bars scored live, "
        f"{len(stream_spikes)} spikes == batch q200's flag set "
        f"(state bounded at 15 periods/type by construction)"
    )


    # ---- live level-shift detection (round 11): the change-point ----
    # monitor re-fits the globally-optimal split per micro-batch on a
    # MERGEABLE (type, day, cents) accumulator, so late or re-ordered
    # deliveries converge to the same answer as the batch query
    from kaflow_spark.streaming.curation import change_point_monitor

    proj = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            "event_type",
            F.expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)").alias(
                "day_i"
            ),
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
    )
    staged3 = tempfile.mkdtemp(prefix="season-cp-")
    proj.repartition(3).write.mode("overwrite").parquet(staged3)
    emitted = {}
    handle = change_point_monitor(
        "event_type", "day_i", "cents",
        on_result=lambda bid, rows: emitted.__setitem__(bid, rows),
    )
    stream3 = (
        spark.readStream.schema(
            "event_type string, day_i bigint, cents bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(staged3)
    )
    q3 = stream3.writeStream.foreachBatch(handle).start()
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    final_cp = {r["event_type"]: r for r in emitted[max(emitted)]}
    batch_cp = {
        r["event_type"]: r
        for r in REGISTRY["q235_change_point"].spark(spark, sf_dir).collect()
    }
    assert set(final_cp) == set(batch_cp)
    for ty, b in batch_cp.items():
        m = final_cp[ty]
        assert (m["split_day"], m["shift"]) == (
            b["split_day"], b["shift_dollars"],
        ), ty
    big_ty, big = max(
        final_cp.items(), key=lambda kv: abs(kv[1]["shift"])
    )
    print(
        f"live change-point monitor: {len(emitted)} batches, final "
        f"split per type == batch q235 ({len(batch_cp)} types); "
        f"largest shift: {big_ty} {big['shift']}$/day at day "
        f"{big['split_day']}"
    )

    # ---- behavior: which event types travel together? ----------------
    lift = REGISTRY["q194_cooccurrence_lift"].spark(spark, sf_dir)
    top = lift.orderBy(F.desc("lift_bp"), "type_a", "type_b").limit(3)
    print("top co-occurrence lifts:")
    for r in top.collect():
        print(
            f"  {r.type_a} + {r.type_b}: n={r.n_ab} lift={r.lift_bp}bp"
        )


if __name__ == "__main__":
    main()
