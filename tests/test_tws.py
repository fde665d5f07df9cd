"""transformWithStateInPandas (Spark 4 typed-state API): first-seen
key suppression across micro-batches."""

from __future__ import annotations

import uuid

import pytest

from kaflow_spark.streaming.tws import dedup_keys_tws, require_tws, tws_available


def test_gated_without_protobuf(spark):
    """Without google.protobuf the operator raises a clear error
    instead of crashing the streaming python runner (mirrors the
    reference's optional-import gating, serializers.py:13-25)."""
    if tws_available():
        pytest.skip("protobuf present: gate inactive")
    with pytest.raises(NotImplementedError, match="google.protobuf"):
        dedup_keys_tws(spark.range(1), "id")


@pytest.mark.skipif(
    not tws_available(), reason="transformWithState needs google.protobuf"
)
def test_dedup_keys_tws_cross_batch(spark, tmp_path):

    DDL = "k bigint, v double"
    path = str(tmp_path / f"tws-{uuid.uuid4().hex[:6]}")
    name = f"tws_{uuid.uuid4().hex[:8]}"
    spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 3.0)], DDL).coalesce(
        1
    ).write.mode("append").parquet(path)
    stream = (
        spark.readStream.schema(DDL).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = dedup_keys_tws(stream, "k")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: key 1 re-delivered (suppressed), key 3 is new
        spark.createDataFrame([(1, 9.0), (3, 4.0)], DDL).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        q.processAllAvailable()
        rows = {
            r["key"]: r["first_batch_rows"]
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert rows == {1: 2, 2: 1, 3: 1}  # each key exactly once
    finally:
        q.stop()
