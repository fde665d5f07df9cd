"""Streaming dataset curation.

The scrubbing/filtering stages (PII scrub, quality gates, hash split,
quota-free sampling) are stateless projections and work on streaming
DataFrames as-is — this module adds the one curation stage that needs
a design choice in streaming: benchmark decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kaflow_spark.operators.dedup import char_shingles


def streaming_contamination_flags(
    stream_docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    *,
    k: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Flag streaming documents that share >= ``min_overlap`` distinct
    ``k``-grams with any item of a STATIC benchmark suite, emitting
    ``(id, bench_id, overlap)`` in append mode.

    Design: completely STATELESS. The batch operator
    (operators.curation.contamination_overlaps) counts shared grams
    via an inverted-index join + groupBy — but a streaming groupBy
    needs watermarked state. Instead the static side is reduced to
    per-benchmark gram ARRAYS (small by definition: a benchmark suite
    is thousands of items), broadcast to every executor, and each
    arriving document computes `size(array_intersect(...))` against
    each benchmark row — a projection + filter, so the stream needs
    no watermark, no state store, and works in append mode. Cost per
    micro-batch is batch_docs x n_bench intersects, the right trade
    when the bench side is small; for huge benchmark suites run the
    batch operator inside foreachBatch instead."""
    bench_arrays = bench.select(
        F.col(bench_id_col).alias("_bid"),
        char_shingles(bench_text_col, k).alias("_bg"),
    )
    docs = stream_docs.select(
        F.col(id_col).alias("_did"),
        char_shingles(text_col, k).alias("_dg"),
    )
    overlap = F.size(F.array_intersect(F.col("_dg"), F.col("_bg")))
    return (
        docs.crossJoin(F.broadcast(bench_arrays))
        .select(
            F.col("_did").alias(id_col),
            F.col("_bid").alias(bench_id_col),
            overlap.alias("overlap"),
        )
        .filter(F.col("overlap") >= F.lit(min_overlap))
    )


__all__ = ["streaming_contamination_flags"]
