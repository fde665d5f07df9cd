"""Incremental warehouse + live monitors on kaflow_spark (round-8 suite).

The operational loop a warehouse team runs every refresh cycle:

state       — each user's last (event_type, cents) as of a cutoff
              (q170's keeper window)
diff        — the insert/update/delete change-set between two cutoffs
              (operators.cdc.snapshot_diff; bounded by churn)
merge       — apply it to the partitioned parquet state table,
              rewriting ONLY touched partitions
              (operators.cdc.merge_into_parquet, staged-swap)
monitors    — the same feed watched live: exact-integer CUSUM
              level-shift detection carried across micro-batches
              (streaming.stateful.streaming_cusum == q179's operator
              on the closed stream) and an exact two-sample KS drift
              score per batch against a reference sample
              (streaming.curation.ks_monitor == q183's statistic)

    PYTHONPATH=/root/repo python examples/incremental_warehouse.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import uuid

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.operators.cdc import merge_into_parquet, snapshot_diff

CENTS = (
    "CAST(CASE WHEN value >= 0.0D THEN FLOOR(value * 100.0D + 0.5D)"
    " ELSE CEIL(value * 100.0D - 0.5D) END AS BIGINT)"
)


def state_as_of(events, cutoff: str):
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.filter(
            F.col("ts") <= F.lit(cutoff).cast(events.schema["ts"].dataType)
        )
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            F.concat(F.lit("s"), F.pmod("user_id", F.lit(16))).alias("seg"),
            "event_type",
            F.expr(CENTS).alias("cents"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("incremental-warehouse", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="warehouse-")

    events = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )

    # ---- 1. materialize the day-15 state, partitioned by segment ----
    t1 = state_as_of(events, "2024-01-15 00:00:00")
    path = f"{work}/user_state"
    t1.write.partitionBy("seg").parquet(path)
    n1 = spark.read.parquet(path).count()

    # ---- 2. diff against the next refresh cutoff, apply the churn ----
    t2 = state_as_of(events, "2024-01-15 01:00:00")
    diff = snapshot_diff(t1, t2, ["user_id"])
    by_kind = {
        r["_change"]: r["n"]
        for r in diff.groupBy("_change").agg(F.count("*").alias("n")).collect()
    }
    stats = merge_into_parquet(
        spark, path, diff, ["user_id"], partition_col="seg"
    )
    merged = spark.read.parquet(path)
    n2, want = merged.count(), t2.count()
    assert n2 == want, (n2, want)
    print(
        f"state merge:    {n1} -> {n2} rows | "
        f"+{by_kind.get('insert', 0)} ~{by_kind.get('update', 0)} "
        f"-{by_kind.get('delete', 0)} | partitions rewritten: "
        f"{len(stats['partitions_rewritten'])}/16"
    )

    # ---- 3. live CUSUM monitor over the same feed --------------------
    from kaflow_spark.operators.events import cusum_shifts
    from kaflow_spark.streaming.stateful import streaming_cusum

    ser = (
        events.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01")).alias("day"),
            F.expr(CENTS).alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("day_cents"))
    )
    feed = f"{work}/feed"
    halves = ser.randomSplit([0.5, 0.5], seed=7)
    halves[0].coalesce(1).write.mode("append").parquet(feed)
    stream = (
        spark.readStream.schema(ser.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    emissions = {}
    q = (
        streaming_cusum(stream, "event_type", "day", "day_cents", pct=10)
        .writeStream.outputMode("update")
        .foreachBatch(lambda bdf, bid: emissions.__setitem__(bid, bdf.collect()))
        .start()
    )
    try:
        q.processAllAvailable()
        halves[1].coalesce(1).write.mode("append").parquet(feed)
        q.processAllAvailable()
    finally:
        q.stop()
    final = sorted(tuple(r) for r in emissions[max(emissions)])
    batch = sorted(
        tuple(r)
        for r in cusum_shifts(ser, "event_type", "day", "day_cents", pct=10)
        .select(
            "event_type", "day", "day_cents", "cusum_pos", "cusum_neg",
            "shift_flag",
        )
        .collect()
    )
    assert final == batch, "closed stream != batch CUSUM"
    n_shift = sum(1 for r in final if r[5])
    print(
        f"CUSUM monitor:  closed stream == batch q179 operator "
        f"({len(final)} series rows, {n_shift} flagged)"
    )

    # ---- 4. KS drift score per micro-batch vs a reference sample ----
    from kaflow_spark.streaming.curation import ks_monitor

    ref = events.filter(F.col("user_id") % 10 == 0).select(
        F.expr(CENTS).alias("cents")
    )
    scores = {}
    handle = ks_monitor(
        ref, "cents", on_result=lambda bid, row: scores.__setitem__(bid, row)
    )
    live_dir = f"{work}/live-{uuid.uuid4().hex[:6]}"
    events.filter(F.col("user_id") % 10 == 1).select(
        F.expr(CENTS).alias("cents")
    ).coalesce(1).write.parquet(live_dir)
    lq = (
        spark.readStream.schema("cents bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(live_dir)
        .writeStream.foreachBatch(handle)
        .start()
    )
    try:
        lq.processAllAvailable()
    finally:
        lq.stop()
    row = scores[0]
    print(
        f"KS monitor:     batch vs reference ks_bp={row.ks_bp} "
        f"(n={row.n_group} vs ref {row.n_rest})"
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
