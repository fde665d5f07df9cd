"""Embedding-side training prep on kaflow_spark.

The vector half of a training-data pipeline: corpus diagnostics
(exact gram matrix -> PCA fit), dimensionality reduction, semantic
near-dup removal, cluster-quality checks, and hard-negative mining for
contrastive training — every stage a distributed operator with the
driver doing only bounded d x d linear algebra.

    PYTHONPATH=/root/repo python examples/embedding_training_prep.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.operators.dedup import embedding_near_dups
from kaflow_spark.operators.embeddings import (
    gram_matrix,
    label_centroids,
    nearest_centroid_purity,
    pca_project,
)
from kaflow_spark.operators.similarity import hard_negatives


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("embedding-prep", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "label", F.col("label").cast("bigint")
    )
    n0 = emb.count()

    # 1. corpus diagnostics: exact second-moment matrix (the PCA input)
    g = gram_matrix(emb, "embedding")
    diag = g.filter(F.col("dim_i") == F.col("dim_j"))
    top_var = diag.orderBy(F.col("sum_prod").desc()).first()

    # 2. dimensionality reduction: distributed fit, broadcast projection
    proj = pca_project(emb, "embedding", "vec_id", k=8)
    n_proj = proj.count()

    # 3. semantic near-dup removal (hyperplane-LSH bucketed, exact verify)
    pairs = embedding_near_dups(
        emb, "vec_id", "embedding", threshold=0.98
    )
    losers = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    kept = emb.join(losers, "vec_id", "left_anti")
    n1 = kept.count()

    # 4. cluster-quality gate before trusting labels downstream
    purity = nearest_centroid_purity(kept, "vec_id", "label", "embedding")
    worst = purity.orderBy("purity_bp").first()

    # 5. hard negatives for the three anchor vectors
    negs = hard_negatives(
        kept, "vec_id", "label", "embedding", query_ids=[1, 2, 3], k=5
    )
    n_negs = negs.count()

    cents = label_centroids(kept, "label", "embedding")
    print(f"vectors:            {n0}")
    print(f"top-variance dim:   {top_var['dim_i']} (sum q^2 = {top_var['sum_prod']})")
    print(f"PCA projections:    {n_proj} rows -> 8 dims")
    print(f"after near-dup:     {n1}  (-{n0 - n1})")
    print(
        f"worst-purity label: {worst['label']} at {worst['purity_bp'] / 100:.1f}%"
    )
    print(f"hard negatives:     {n_negs} (3 anchors x 5)")
    print(f"centroid rows:      {cents.count()} (labels x dims, mergeable)")
    spark.stop()


if __name__ == "__main__":
    main()
