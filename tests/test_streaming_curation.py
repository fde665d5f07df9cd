"""Streaming decontamination: stateless broadcast gram-array flags
across micro-batches (append mode, no state store)."""

from __future__ import annotations

import uuid

from kaflow_spark.streaming.curation import streaming_contamination_flags

DOCS_DDL = "doc_id bigint, text string"

BENCH_TEXT = (
    "what is the capital of france paris is the capital and largest city"
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, DOCS_DDL).coalesce(1).write.mode("append").parquet(path)


def test_streaming_contamination_across_batches(spark, tmp_path):
    path = str(tmp_path / f"sc-{uuid.uuid4().hex[:6]}")
    name = f"sc_{uuid.uuid4().hex[:8]}"
    bench = spark.createDataFrame(
        [(900, BENCH_TEXT)], "bench_id bigint, btext string"
    )
    _write(spark, path, [(1, "a perfectly clean training document about engines")])
    stream = (
        spark.readStream.schema(DOCS_DDL).option("maxFilesPerTrigger", 1).parquet(path)
    )
    flags = streaming_contamination_flags(
        stream, bench, "doc_id", "text", "bench_id", "btext", k=8, min_overlap=20
    )
    q = flags.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
        assert spark.sql(f"SELECT * FROM {name}").count() == 0
        # batch 2: one contaminated doc (embeds the benchmark answer), one clean
        _write(
            spark,
            path,
            [
                (2, "leaked: " + BENCH_TEXT + " end of leak"),
                (3, "another clean doc discussing shuffle partitioning"),
            ],
        )
        q.processAllAvailable()
        rows = spark.sql(f"SELECT doc_id, bench_id, overlap FROM {name}").collect()
        assert [(r["doc_id"], r["bench_id"]) for r in rows] == [(2, 900)]
        assert rows[0]["overlap"] >= 20
    finally:
        q.stop()
