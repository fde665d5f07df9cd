"""SparkSession factory with the engine's scale-oriented config posture.

The defaults below are the "100 TB posture" from SURVEY §4.2: AQE on
(runtime re-planning, partition coalescing, skew-join splitting),
Arrow for any pandas-UDF exchange, UTC session timezone (determinism
vs. the DuckDB oracle), and shuffle partitioning that AQE can shrink.

On a real cluster the same factory is used with ``master=None`` so
spark-submit / the cluster manager decides; ``local[*]`` is only the
test default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for scale-out correctness + performance; every one of
# these is a stock Spark knob (no custom plugins required).
ENGINE_CONF: dict[str, str] = {
    # --- Adaptive Query Execution: runtime re-plan, coalesce, skew ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # --- Shuffle sizing: a starting point AQE will coalesce down;
    #     on a 1000-executor cluster this is set to ~2-3x total cores.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # --- Arrow: vectorized python<->JVM exchange for pandas UDFs ---
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # --- Determinism: timestamps interpreted in UTC everywhere so the
    #     engine and the DuckDB oracle agree on literals and extracts.
    "spark.sql.session.timeZone": "UTC",
    # --- Parquet: vectorized reader + aggregate pushdown ---
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Read parquet TIMESTAMP(isAdjustedToUTC=false) as TIMESTAMP_NTZ so
    # wall-clock semantics match DuckDB exactly.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # TIMESTAMP(NANOS) columns (events.ts) surface as raw INT64 nanos;
    # catalog.load converts them to microsecond timestamps on scan.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # --- Broadcast threshold: dims up to 64 MiB go broadcast ---
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # --- Runtime bloom filters: inject a bloom of the selective join
    #     side into the other side's scan (shuffle-join analog of DPP;
    #     size-thresholded so it only fires on genuinely large scans).
    #     NB: semiJoinReduction deliberately NOT enabled — measured to
    #     add a subquery + shuffle to every join, a large regression at
    #     small-to-mid scale for a marginal big-scan win.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Python DataSource v2 filter pushdown (kafka_segment skips whole
    # archive files on topic-equality filters).
    "spark.sql.python.filterPushdown.enabled": "true",
    # Quiet progress bars in test output.
    "spark.ui.showConsoleProgress": "false",
    # Local mode is driver-only: driver memory is the only memory knob
    # that matters (ignored under a cluster manager's spark-submit).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
    # RocksDB state store: bounded-memory streaming state at scale.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def get_spark(
    app_name: str = "kaflow_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine posture applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when not running
    under a cluster manager, mirroring the driver harness.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


def warm_python_workers(spark: SparkSession) -> None:
    """Pay the first-Arrow-stage cost up front: the first pandas-UDF
    stage in a session spawns the python worker pool and imports its
    modules (~2-3 s), which otherwise gets billed to whichever
    Arrow-kernel query happens to run first (CLAUDE.md trap #5).
    Harnesses that time queries should call this after JVM warm-up."""
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1000).select(_warm(F.col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()
