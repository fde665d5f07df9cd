"""Exactly-once sink pattern + delivery-semantics option mapping."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaflow_spark.app import App
from kaflow_spark.streaming.exactly_once import (
    IdempotentBatchWriter,
    batch_keyed_parquet_writer,
)


def test_idempotent_batch_writer_skips_redelivery(spark, tmp_path):
    out = str(tmp_path / "out")
    commits = str(tmp_path / "commits")
    writer = IdempotentBatchWriter(commits, batch_keyed_parquet_writer(out))

    df1 = spark.range(5)
    writer(df1, batch_id=0)
    assert spark.read.parquet(out).count() == 5

    # recovery re-delivers batch 0 with different (stale) content:
    # the committed batch must NOT be overwritten or duplicated
    writer(spark.range(99), batch_id=0)
    assert spark.read.parquet(out).count() == 5
    assert writer.committed(0)

    writer(spark.range(3), batch_id=1)
    assert spark.read.parquet(out).count() == 8


def test_crash_between_write_and_commit_replays_idempotently(spark, tmp_path):
    """Write succeeded, marker write 'crashed' (simulated): the replay
    overwrites the batch-keyed dir — same final bytes, no dupes."""
    out = str(tmp_path / "out")
    commits = str(tmp_path / "commits")
    writer = IdempotentBatchWriter(commits, batch_keyed_parquet_writer(out))
    # simulate: write happened but marker missing
    batch_keyed_parquet_writer(out)(spark.range(5), 0)
    assert not writer.committed(0)
    writer(spark.range(5), batch_id=0)  # replay
    assert spark.read.parquet(out).count() == 5  # overwrite, not append
    assert writer.committed(0)


def test_delivery_semantics_kwargs_map_to_kafka_options():
    app = App(
        brokers="b:9092",
        acks="all",
        enable_idempotence=True,
        transactional_id="tx-1",
        isolation_level="read_committed",
        auto_offset_reset="earliest",
        compression_type="lz4",
        max_offsets_per_trigger=100_000,
        kafka_options={"kafka.security.protocol": "SSL"},
    )
    opts = app._client_options()
    assert opts["kafka.acks"] == "all"
    assert opts["kafka.enable.idempotence"] == "true"
    assert opts["kafka.transactional.id"] == "tx-1"
    assert opts["kafka.isolation.level"] == "read_committed"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.compression.type"] == "lz4"
    assert opts["maxOffsetsPerTrigger"] == "100000"
    assert opts["kafka.security.protocol"] == "SSL"  # passthrough kept


def test_fingerprint_fast_semantics(spark):
    """Identical texts get identical fast fingerprints; distinct texts
    (almost surely) get distinct ones. (The md5 and xxhash64 variants
    select different argmin grams, so their grouping of NEAR-dups can
    differ — only exact duplicates are contract.)"""
    from kaflow_spark.functions.textstats import fingerprint_fast

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        (3, "an entirely different body of text goes here"),
        (4, "short"),  # below gram width: whole-text hash path
        (5, "short"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", fingerprint_fast("text").alias("fp")).collect()
    }
    assert fps[1] == fps[2]
    assert fps[4] == fps[5]
    assert fps[1] != fps[3] != fps[4]