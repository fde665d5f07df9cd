"""Online semantic-dup gate on kaflow_spark (round-14).

The deployment shape SemDeDup actually runs in production: the batch
pipeline (examples/semantic_dedup.py) fits the quantizer and screens
the base corpus ONCE; from then on every incoming vector micro-batch
is gated ONLINE against a frozen quantizer and the at-rest exploded
index — is this arrival a semantic duplicate of anything we already
hold (or of another arrival in the same batch)?

Stages:

seed     — freeze the IVF quantizer on the base corpus (first 60% of
           embeddings), write the exploded multi-assignment layout
           partitioned by list (write_semantic_index)
baseline — the base corpus's own internal pairs: a BATCH job over the
           seeded corpus (semantic_dup_pairs — the gate never
           re-verifies stored-stored pairs)
stream   — the remaining 40% arrives as parquet micro-batches; each
           batch assigns against the FROZEN centroids, probes only
           its lists' partitions, exact-cosine verifies, appends, and
           emits new dup pairs append-mode (semantic_dup_gate)
audit    — closed stream + baseline must equal the batch operator
           over the FULL corpus, row for row (the twin contract
           tests/test_streaming_semantic.py pins); re-streaming a
           delivered file emits nothing (id anti-join)

    PYTHONPATH=/root/repo python examples/online_semantic_gate.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

from kaflow_spark import get_spark
from kaflow_spark.catalog import load
from kaflow_spark.operators.similarity import ivf_fit, semantic_dup_pairs
from kaflow_spark.streaming.semantic import (
    semantic_dup_gate,
    write_semantic_index,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("online-semantic-gate", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="gate-")
    try:
        corpus = load(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        n = corpus.count()
        cut = int(n * 0.6)
        base = corpus.filter(f"vec_id <= {cut}")
        live = corpus.filter(f"vec_id > {cut}")

        # ---- seed: frozen quantizer + at-rest exploded layout
        cents = ivf_fit(base, "embedding", n_lists=16, seed=42)
        index_path = f"{work}/index"
        write_semantic_index(
            base, "vec_id", "embedding", cents, index_path, assign_p=8
        )
        print(f"seeded index: {cut} base vectors, 16 frozen lists")

        # ---- baseline: the base corpus's internal pairs (batch job)
        base_pairs = {
            (r["id_a"], r["id_b"])
            for r in semantic_dup_pairs(
                base,
                "vec_id",
                "embedding",
                threshold=0.4,
                centroids=cents,
                assign_p=8,
            ).collect()
        }
        print(f"baseline: {len(base_pairs)} intra-base pairs (batch)")

        # ---- stream: the live 40% in micro-batches
        src = f"{work}/arrivals"
        live.repartition(4).write.parquet(src)
        emitted: dict[int, list] = {}
        handle = semantic_dup_gate(
            index_path,
            "vec_id",
            "embedding",
            cents,
            threshold=0.4,
            assign_p=8,
            on_pairs=lambda bid, rows: emitted.__setitem__(bid, rows),
        )
        stream = (
            spark.readStream.schema("vec_id bigint, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = stream.writeStream.foreachBatch(handle).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        gate_pairs = {
            (r["id_a"], r["id_b"])
            for rows in emitted.values()
            for r in rows
        }
        per_batch = {b: len(rows) for b, rows in sorted(emitted.items())}
        print(
            f"stream: {n - cut} arrivals in {len(emitted)} batches, "
            f"{len(gate_pairs)} new dup pairs {per_batch}"
        )

        # ---- audit: closed stream + baseline == batch on the union
        want = {
            (r["id_a"], r["id_b"])
            for r in semantic_dup_pairs(
                corpus,
                "vec_id",
                "embedding",
                threshold=0.4,
                centroids=cents,
                assign_p=8,
            ).collect()
        }
        got = base_pairs | gate_pairs
        assert got == want, (
            len(got), len(want), len(got - want), len(want - got)
        )
        print(
            f"audit: closed stream + baseline == batch union "
            f"({len(want)} pairs, exact)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
