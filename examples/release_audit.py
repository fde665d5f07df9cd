"""Pre-release data audit on kaflow_spark (round-7 suite).

The checks a data team runs BEFORE releasing a dataset or committing
per-source sampling budgets — privacy, integrity, composition, and
allocation, each an engine operator emitting a small audit frame:

privacy     — k-anonymity cells under k with l-diversity of the
              sensitive column (q176), and the generalization ladder
              that says how much coarsening repairs each cell (q177)
integrity   — Benford first-digit conformance of financial amounts
              (q180), CUSUM level-shift scan over daily volumes (q179)
composition — exact Gini of document length per source (q181),
              DSIR importance weights toward a target distribution
              with their separation AUC (q174/q175)
allocation  — token-budget water-filling across sources, capped at
              each source's available tokens (q178)

    PYTHONPATH=/root/repo python examples/release_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.operators.curation import (
    anonymity_generalization,
    benford_deviation,
    capped_waterfill,
    dsir_importance,
    gini_bp,
    k_anonymity_cells,
    score_separation_auc,
)
from kaflow_spark.operators.events import cusum_shifts

CENTS = "CAST(CAST({col} AS DECIMAL(18,2)) * 100 AS BIGINT)"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("release-audit", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- privacy: who could be re-identified? ------------------------
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.expr(CENTS.format(col="c_acctbal")).alias("cents"),
    ).withColumn("bal_band", F.expr("cents div 200000"))
    qi = ["c_nationkey", "c_mktsegment", "bal_band"]
    risky = k_anonymity_cells(cust, qi, "cents", k=10)
    n_risky = risky.count()
    ladder = anonymity_generalization(cust, qi, k=10)
    fixable = ladder.filter(F.col("anon_level").between(1, 2)).count()
    print(f"k-anonymity:   {n_risky} cells below k=10; "
          f"{fixable} repaired by dropping <=2 QI columns")

    # ---- integrity: do the numbers look organic? ---------------------
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority", F.expr(CENTS.format(col="o_totalprice")).alias("cents")
    )
    benford = benford_deviation(orders, "o_orderpriority", "cents")
    worst_b = benford.orderBy(F.col("l1_bp").desc()).first()
    print(f"benford:       worst group {worst_b['o_orderpriority']} "
          f"L1={worst_b['l1_bp']}bp over {worst_b['n_amounts']} amounts")

    events = load(spark, sf_dir, "events")
    ser = (
        events.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr(CENTS.format(col="value")).alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("day_cents"))
    )
    shifted = cusum_shifts(ser, "event_type", "day", "day_cents").filter(
        F.col("shift_flag")
    )
    print(f"cusum:         {shifted.count()} flagged (type, day) level shifts")

    # ---- composition: is the corpus balanced enough to sample? -------
    docs = load(spark, sf_dir, "documents")
    gini = gini_bp(
        docs.select("source", "doc_id", F.col("n_chars").cast("bigint").alias("v")),
        "source", "doc_id", "v",
    )
    top_g = gini.orderBy(F.col("gini_bp").desc()).first()
    print(f"length gini:   most skewed source {top_g['source']} "
          f"({top_g['gini_bp']}bp)")

    weights = dsir_importance(
        docs, "doc_id", "text", F.col("lang") == "en", n=2, buckets=4096
    )
    [auc] = score_separation_auc(weights, "dsir_bits", "is_target").collect()
    print(f"dsir:          separation AUC {auc['auc_bp']}bp "
          f"({auc['n_flagged']} target / {auc['n_rest']} rest docs)")

    # ---- allocation: split the token budget under per-source caps ----
    stats = (
        docs.select(
            "source",
            "lang",
            F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
            .cast("bigint")
            .alias("ntok"),
        )
        .groupBy("source")
        .agg(
            F.sum("ntok").alias("tokens_avail"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("bigint")
            .alias("en_docs"),
        )
    )
    alloc = capped_waterfill(
        stats, "source", "tokens_avail", "en_docs",
        F.expr("(sum(tokens_avail) over ()) * 3 div 4"),
    )
    rows = alloc.collect()
    capped = [r["source"] for r in rows if r["capped"]]
    total = sum(r["allocation"] for r in rows)
    print(f"waterfill:     {total} tokens allocated; capped sources: "
          f"{', '.join(sorted(capped)) or 'none'}")

    spark.stop()
    print("release audit complete.")


if __name__ == "__main__":
    main()
