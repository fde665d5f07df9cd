"""Distributed connected components (dedup-cluster labeling).

The near-dup operators emit PAIRS; a dedup pipeline needs CLUSTERS —
"keep one canonical document per group of mutual near-duplicates" is
connected components over the pair graph. This is the one genuinely
iterative algorithm in the engine, implemented as a driver-side loop
of DataFrame joins (each iteration is a Catalyst-planned shuffle
join + partial-agg'd min), converging in O(diameter) rounds.

Scale notes: near-dup clusters produced by LSH + exact-verify are
dense (almost cliques), so the diameter — and the iteration count —
is small (2-4) regardless of corpus size. Each iteration shuffles
only (node, label) pairs, 16 bytes a row. For adversarial
long-chain graphs the large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) bounds
rounds at O(log² n); min-label propagation is the right default for
dedup workloads and keeps every step a plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    *,
    max_iter: int = 25,
    out_node: str = "node",
    out_comp: str = "component",
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    MINIMUM node id reachable from it (the component id).

    Min-label propagation: labels start as the node id; each round
    every node takes the min of its own label and its neighbors'
    labels (one join + one groupBy-min); stops when a round changes
    nothing. The result is deterministic — component ids are actual
    member ids (the smallest), which downstream 'keep the canonical
    doc' logic uses directly.
    """
    # symmetric edge list, 16-byte rows; persisted — re-read each round
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    sym.count()  # materialize before the iteration fan-out
    labels = (
        sym.select(F.col("a").alias("n"))
        .distinct()
        .select("n", F.col("n").alias("lbl"))
        .persist()
    )
    labels.count()
    prev_cached = labels
    for _ in range(max_iter):
        # neighbor labels: edge (a,b) proposes label(b) to a
        proposals = (
            sym.join(labels.withColumnRenamed("n", "b"), "b")
            .select(F.col("a").alias("n"), F.col("lbl").alias("plbl"))
        )
        # ONE action per round: the aggregate below both materializes
        # the persisted new-label frame and returns the change count
        # (iterating on Spark pays per-action scheduling, so actions
        # are the unit to minimize, not joins)
        new_labels = (
            labels.select("n", F.col("lbl").alias("_old"))
            .join(proposals, "n", "left")
            .groupBy("n")
            .agg(
                F.min("_old").alias("_old"),
                F.least(F.min("_old"), F.min("plbl")).alias("lbl"),
            )
            .persist()
        )
        changed = new_labels.agg(
            F.sum((F.col("lbl") != F.col("_old")).cast("long"))
        ).first()[0]
        prev_cached.unpersist()
        prev_cached = new_labels
        labels = new_labels.select("n", "lbl")
        if not changed:
            break
    sym.unpersist()
    return labels.select(
        F.col("n").alias(out_node), F.col("lbl").alias(out_comp)
    )


__all__ = ["connected_components"]
