"""Scan-parallelism guard for heavy per-row projections.

A Spark scan's task count comes from the FILE layout (splits of
``spark.sql.files.maxPartitionBytes``), not from the cost of the
expressions stacked above it. That is the right default — until a
small-on-disk input feeds an expensive projection: a 600 KB parquet
corpus is ONE split, so gram-hashing / shingling / vector math above
it runs on ONE core while 31 idle (measured: q68's contamination scan
was 3.4 s single-task, 0.7 s fanned out — the whole gap was
parallelism, not work).

:func:`fan_out` is the conditional fix: repartition ONLY when the
input is small enough that the scan would open with fewer splits than
the session has cores. At cluster scale a 100 TB corpus arrives as
thousands of splits, the condition never fires, and the plan keeps
its zero-shuffle shape; on a small input the added Exchange moves the
small input — cheap by construction (the condition firing IS the
proof the data is small).

The smallness probe is Catalyst's optimized-plan size estimate —
driver-only, no job. It must NOT be ``df.rdd.getNumPartitions()``:
under AQE, ``toRdd`` materializes upstream query stages, and those
jobs run OUTSIDE a SQL execution scope, so session runtime confs
(e.g. the LAST_WIN mapKeyDedupPolicy the shingle-pair maps rely on)
do not propagate to executors — a probe on a frame whose lineage
contains ``char_shingle_pairs128`` threw DUPLICATED_MAP_KEY from
inside the probe (measured; examples/llm_data_pipeline.py step 10).

Plan-contract note: operators that call this gain one Exchange in
their fixture-scale plans. The shuffle carries the RAW input (before
the expensive projection), so per-row width is the input row, not the
exploded intermediate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes for the optimized plan. Driver-side
    analysis + optimization only — never launches a job. For file
    sources this is the file footprint; joins upstream inflate it
    (conservative: an over-estimate just means no fan-out)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def fan_out(
    df: DataFrame,
    *keys: Column | str,
    min_parts: int | None = None,
) -> DataFrame:
    """Repartition ``df`` to ``min_parts`` (default: the session's
    default parallelism) if — and only if — Catalyst estimates the
    input small enough that its scan would yield fewer splits than
    that (estimated bytes < min_parts x files.maxPartitionBytes).
    Pass ``keys`` (any unique-ish column, e.g. the doc id) to
    hash-partition deterministically; without keys Spark's
    round-robin repartition locally sorts rows first (its determinism
    guard), which is wasted work on wide text rows — and NEVER pass a
    low-cardinality key (hashing |labels| values collapses the
    fan-out to |labels| live partitions).

    Call sites are operators' INPUT frames, ahead of a heavy per-row
    projection (gram explode, window hashing). Where measured NOT to
    pay — persisted multi-consumer frames (shingle_frame) and vector
    pipelines whose next stage is already an exchange
    (_quantized_dims, embedding_near_dups) — the operators
    deliberately skip it; see their docstrings for the A/B numbers.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    target = min_parts if min_parts is not None else sc.defaultParallelism
    max_split = int(
        sc._jvm.org.apache.spark.util.Utils.byteStringAsBytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
    )
    if _estimated_bytes(df) >= target * max_split:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)
