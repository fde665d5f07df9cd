"""Online semantic-dup gate (round 14): the streaming twin of q253's
batch ``semantic_dup_pairs``, deployed as frozen-quantizer probes
against the exploded at-rest index. The contract under test: a CLOSED
stream's emitted pair set equals the batch operator over the union
corpus row-for-row, under any arrival order (pair membership is
symmetric — the pair fires when its LATER end arrives), re-delivered
ids are ignored, and the probed read is partition-pruned."""

from __future__ import annotations

import uuid as _uuid

import pytest
from pyspark.sql import functions as F


def _corpus(spark, sf_dir):
    from kaflow_spark.catalog import load

    return load(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def _batch_pairs(spark, sf_dir, cents):
    from kaflow_spark.operators.similarity import semantic_dup_pairs

    return sorted(
        (r["id_a"], r["id_b"])
        for r in semantic_dup_pairs(
            _corpus(spark, sf_dir),
            "vec_id",
            "embedding",
            threshold=0.4,
            centroids=cents,
            assign_p=8,
        ).collect()
    )


def _drive_gate(spark, src_path, index_path, cents):
    from kaflow_spark.streaming.semantic import semantic_dup_gate

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
        .parquet(src_path)
    )
    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return emitted


@pytest.fixture(scope="module")
def frozen_cents(spark, sf_dir):
    from kaflow_spark.operators.similarity import ivf_fit

    return ivf_fit(
        _corpus(spark, sf_dir), "embedding", n_lists=16, seed=42
    )


def test_closed_stream_equals_batch_pairs(
    spark, sf_dir, tmp_path, frozen_cents
):
    src = str(tmp_path / f"src-{_uuid.uuid4().hex[:6]}")
    _corpus(spark, sf_dir).repartition(3).write.parquet(src)
    idx = str(tmp_path / "gate_index")
    emitted = _drive_gate(spark, src, idx, frozen_cents)
    assert len(emitted) >= 2, "expected multiple micro-batches"
    got = sorted(
        {(r["id_a"], r["id_b"]) for rows in emitted.values() for r in rows}
    )
    want = _batch_pairs(spark, sf_dir, frozen_cents)
    assert got == want and want, (len(got), len(want))
    # each pair fires exactly once across batches (no double emission)
    flat = [
        (r["id_a"], r["id_b"]) for rows in emitted.values() for r in rows
    ]
    assert len(flat) == len(set(flat))


def test_gate_is_arrival_order_insensitive(
    spark, sf_dir, tmp_path, frozen_cents
):
    """A DIFFERENT batch split (reverse-sorted round robin) closes to
    the same pair set — late data is just data, no horizon."""
    src = str(tmp_path / f"src-{_uuid.uuid4().hex[:6]}")
    (
        _corpus(spark, sf_dir)
        .orderBy(F.desc("vec_id"))
        .coalesce(1)
        .repartition(4)
        .write.parquet(src)
    )
    idx = str(tmp_path / "gate_index_alt")
    emitted = _drive_gate(spark, src, idx, frozen_cents)
    got = sorted(
        {(r["id_a"], r["id_b"]) for rows in emitted.values() for r in rows}
    )
    assert got == _batch_pairs(spark, sf_dir, frozen_cents)


def test_redelivered_ids_are_ignored(spark, sf_dir, tmp_path, frozen_cents):
    """Streaming the SAME corpus files through an already-seeded index
    emits zero pairs and appends nothing — the stored-id anti-join."""
    from kaflow_spark.streaming.semantic import write_semantic_index

    idx = str(tmp_path / "gate_index_dup")
    write_semantic_index(
        _corpus(spark, sf_dir),
        "vec_id",
        "embedding",
        frozen_cents,
        idx,
        assign_p=8,
    )
    n0 = spark.read.parquet(idx).count()
    src = str(tmp_path / f"src-{_uuid.uuid4().hex[:6]}")
    _corpus(spark, sf_dir).repartition(2).write.parquet(src)
    emitted = _drive_gate(spark, src, idx, frozen_cents)
    assert all(not rows for rows in emitted.values())
    assert spark.read.parquet(idx).count() == n0


def test_gate_index_probe_is_partition_pruned(
    spark, sf_dir, tmp_path, frozen_cents
):
    """The probed read the gate issues per batch — an IN filter on
    _list over the exploded layout — plans PartitionFilters (reads
    only the probed lists' files)."""
    from kaflow_spark.streaming.semantic import write_semantic_index

    idx = str(tmp_path / "gate_index_prune")
    write_semantic_index(
        _corpus(spark, sf_dir),
        "vec_id",
        "embedding",
        frozen_cents,
        idx,
        assign_p=8,
    )
    probed = spark.read.parquet(idx).filter(F.col("_list").isin(0, 5))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_list" in plan.split(
        "PartitionFilters", 1
    )[1][:200], plan
    files = {
        r[0]
        for r in probed.select(F.input_file_name()).distinct().collect()
    }
    assert files and all(
        "_list=0/" in f or "_list=5/" in f for f in files
    ), files
