"""Exact embedding analytics: distributed centroids and
nearest-centroid purity, in pure integer arithmetic.

Float vector aggregation across rows is shuffle-order-dependent
(double addition is not associative), which would break cross-engine
hash attestation AND make production runs non-reproducible. These
operators quantize each component to integer micro-units
(``round(v * 1e6)`` — exact in both Spark and DuckDB for float32
inputs) so every downstream sum/mean/distance is exact bigint
algebra: deterministic under any partitioning, any cluster size, any
engine.

Scale shape: a centroid over n vectors of d dims shuffles at most
(groups × d) partial-sum rows (partial-agg'd groupBy), and
nearest-centroid assignment joins a BROADCAST (k × d) centroid table
— the corpus never shuffles. Exact all-centroid assignment is the
small-k path (quality reports, cluster purity); for large k use the
IVF operators in :mod:`kaflow_spark.operators.similarity`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def _quantized_dims(
    df: DataFrame, vec_col: str, keep: list[str]
) -> DataFrame:
    """posexplode the vector into (dim, q) rows with q = component in
    exact integer micro-units."""
    return df.select(
        *keep, F.posexplode(vec_col).alias("dim", "_v")
    ).select(
        *keep,
        F.col("dim").cast("bigint").alias("dim"),
        F.round(F.col("_v").cast("double") * MICRO)
        .cast("bigint")
        .alias("_q"),
    )


def label_centroids(
    df: DataFrame, label_col: str, vec_col: str
) -> DataFrame:
    """Per-label centroid in long format: one row per (label, dim)
    with the exact integer mean component ``centroid_micro`` (micro-
    units, division truncates toward zero like DuckDB's ``//``) plus
    the exact ``sum_micro`` and member count ``n`` so callers can
    re-aggregate (centroids are mergeable: sums add).

    Shape at scale: posexplode to (label, dim, q) and ONE partial-
    agg'd groupBy — shuffle volume is labels × dims partial rows per
    partition, independent of vector count."""
    return (
        _quantized_dims(df, vec_col, [label_col])
        .groupBy(label_col, "dim")
        .agg(
            F.sum("_q").alias("sum_micro"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col(label_col),
            "dim",
            F.expr("sum_micro div n").alias("centroid_micro"),
            "sum_micro",
            "n",
        )
    )


def nearest_centroid_purity(
    df: DataFrame, id_col: str, label_col: str, vec_col: str
) -> DataFrame:
    """Cluster-purity report: assign every vector to its nearest
    per-label centroid (exact squared L2 distance in integer micro²
    units, ties broken by smallest label) and report per label:
    member count ``n``, how many members' nearest centroid is their
    own label ``n_self``, and ``purity_bp`` (basis points) — the
    embedding-quality check a semantic-dedup pipeline runs before
    trusting cluster-level decisions.

    Shape at scale: the centroid table (k × d rows — tiny) is
    BROADCAST into the per-dim join, so the corpus side never
    shuffles for assignment; per-(vector, candidate-label) distances
    are a partial-agg'd groupBy over (id, label_c) keys, then one
    row_number window picks the argmin. Cost is O(n · d · k) compute
    spread across executors with no wide shuffle — the exact-report
    path for small k; large-k assignment belongs to IVF."""
    cent = label_centroids(df, label_col, vec_col).select(
        F.col(label_col).alias("_lc"), "dim", "centroid_micro"
    )
    dims = _quantized_dims(df, vec_col, [id_col, label_col])
    diff = F.col("_q") - F.col("centroid_micro")
    dist = (
        dims.join(F.broadcast(cent), "dim")
        .groupBy(id_col, label_col, "_lc")
        .agg(F.sum(diff * diff).alias("_d2"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_d2"), F.col("_lc"))
    assigned = (
        dist.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(label_col),
            (F.col("_lc") == F.col(label_col)).alias("_self"),
        )
    )
    return assigned.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_self").cast("bigint")).alias("n_self"),
        F.expr("(sum(cast(_self as bigint)) * 10000) div count(1)").alias(
            "purity_bp"
        ),
    )


__all__ = ["label_centroids", "nearest_centroid_purity", "MICRO"]
