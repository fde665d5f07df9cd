"""Streaming near-duplicate suppression: LSH dedup across
micro-batches with per-bucket bounded state."""

from __future__ import annotations

import uuid

from kaflow_spark.streaming.neardup import near_dup_flags, streaming_near_dup_verdicts

DOCS_DDL = "doc_id bigint, text string"

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets slowly "
    "behind the distant mountains and the river flows quietly through the valley"
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, DOCS_DDL).coalesce(1).write.mode("append").parquet(path)


def test_cross_batch_near_dup_detection(spark, tmp_path):
    path = str(tmp_path / f"nd-{uuid.uuid4().hex[:6]}")
    name = f"nd_{uuid.uuid4().hex[:8]}"
    # batch 1: two originals
    _write(
        spark,
        path,
        [(1, BASE), (2, "a completely unrelated document about query engines")],
    )
    stream = (
        spark.readStream.schema(DOCS_DDL).option("maxFilesPerTrigger", 1).parquet(path)
    )
    verdicts = streaming_near_dup_verdicts(stream, "doc_id", "text", threshold=0.6)
    q = (
        verdicts.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: near-copy of doc 1 (one word changed) + a fresh doc
        _write(
            spark,
            path,
            [
                (3, BASE.replace("quick", "swift")),
                (4, "something else entirely different again and novel"),
            ],
        )
        q.processAllAvailable()
        flags = {
            r["doc_id"]: (r["dup_of"], r["est_jaccard"])
            for r in near_dup_flags(spark.sql(f"SELECT * FROM {name}")).collect()
        }
        assert flags[1][0] is None  # originals are not dups
        assert flags[2][0] is None
        assert flags[4][0] is None
        dup_of, est = flags[3]
        assert dup_of == 1  # near-copy caught ACROSS micro-batches
        assert est >= 0.6
    finally:
        q.stop()


def test_exact_duplicate_strongest_match(spark, tmp_path):
    path = str(tmp_path / f"nd2-{uuid.uuid4().hex[:6]}")
    name = f"nd2_{uuid.uuid4().hex[:8]}"
    _write(spark, path, [(10, BASE)])
    stream = (
        spark.readStream.schema(DOCS_DDL).option("maxFilesPerTrigger", 1).parquet(path)
    )
    verdicts = streaming_near_dup_verdicts(stream, "doc_id", "text", threshold=0.9)
    q = (
        verdicts.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        _write(spark, path, [(11, BASE)])  # exact redelivery, new id
        q.processAllAvailable()
        flags = {
            r["doc_id"]: r
            for r in near_dup_flags(spark.sql(f"SELECT * FROM {name}")).collect()
        }
        assert flags[11]["dup_of"] == 10
        assert flags[11]["est_jaccard"] == 1.0  # identical signatures
    finally:
        q.stop()
