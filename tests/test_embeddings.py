"""Exact embedding analytics (oracle parity for q91/q92 is in
test_oracle.py; these pin the integer semantics directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaflow_spark.operators.embeddings import (
    label_centroids,
    nearest_centroid_purity,
)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<float>"
    )


def test_label_centroids_exact_integer_mean(spark):
    df = _frame(
        spark,
        [
            (1, 0, [1.0, -1.0]),
            (2, 0, [2.0, -2.0]),
            (3, 1, [0.5, 0.25]),
        ],
    )
    out = {(r["label"], r["dim"]): (r["centroid_micro"], r["sum_micro"], r["n"])
           for r in label_centroids(df, "label", "embedding").collect()}
    # label 0 dim 0: (1e6 + 2e6) div 2 = 1_500_000
    assert out[(0, 0)] == (1_500_000, 3_000_000, 2)
    # negative mean truncates toward zero like DuckDB's //
    assert out[(0, 1)] == (-1_500_000, -3_000_000, 2)
    assert out[(1, 0)] == (500_000, 500_000, 1)
    assert out[(1, 1)] == (250_000, 250_000, 1)


def test_label_centroids_truncating_division_negative(spark):
    # sum = -3 micro over n=2 -> div truncates toward zero: -1 (not -2)
    df = _frame(
        spark,
        [(1, 0, [-0.000001]), (2, 0, [-0.000002])],
    )
    r = label_centroids(df, "label", "embedding").collect()[0]
    assert (r["sum_micro"], r["centroid_micro"]) == (-3, -1)


def test_nearest_centroid_purity_report(spark):
    # two tight clusters + one vector planted inside the other cluster
    df = _frame(
        spark,
        [
            (1, 0, [0.0, 0.0]),
            (2, 0, [0.1, 0.0]),
            (3, 1, [5.0, 5.0]),
            (4, 1, [5.1, 5.0]),
            (5, 1, [0.05, 0.0]),  # labeled 1, sits in cluster 0
        ],
    )
    out = {r["label"]: (r["n"], r["n_self"], r["purity_bp"])
           for r in nearest_centroid_purity(
               df, "vec_id", "label", "embedding").collect()}
    assert out[0] == (2, 2, 10000)
    # vec 5 drags label 1's centroid, but stays nearer to label 0's
    assert out[1] == (3, 2, 6666)


def test_purity_assignment_broadcasts_centroids(spark):
    df = _frame(spark, [(i, i % 2, [float(i), 1.0]) for i in range(20)])
    out = nearest_centroid_purity(df, "vec_id", "label", "embedding")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
