"""Coverage for less-traveled paths: transform key decoding, the
stream_files source helper, streaming sliding windows."""

from __future__ import annotations

import datetime as dt
import json
import uuid

from pyspark.sql import functions as F

from kaflow_spark.app import App
from kaflow_spark.params import Json, Str
from kaflow_spark.sources.files import stream_files
from kaflow_spark.streaming.windows import sliding
from kaflow_spark.testclient import TestClient


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s + "+00:00")


def test_transform_with_key_serde(spark):
    app = App()

    @app.transform(topic="t", sink_topics=("o",), value=Str, key=Str)
    def swap(df):
        # typed key (string) promoted into the value payload
        return df.select(
            F.to_json(F.struct(F.col("key").alias("who"))).cast("binary").alias("value"),
            F.col("key"),
        )

    client = TestClient(app, spark)
    msg = client.publish("t", b"payload", key=b"alice")
    assert json.loads(msg.value) == {"who": "alice"}
    assert msg.key == b"alice"


def test_transform_rejects_schemaless_serde():
    import pytest

    app = App()
    with pytest.raises(TypeError, match="JVM column codec"):

        @app.transform(topic="t", sink_topics=("o",), value=Json)
        def nope(df):
            return df


def test_stream_files_helper_and_sliding_window(spark, tmp_path):
    path = str(tmp_path / "sl")
    DDL = "event_id bigint, ts timestamp, user_id bigint, value double"
    spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:10:00"), 1, 1.0),
            (2, _ts("2024-01-01 10:40:00"), 1, 1.0),
        ],
        DDL,
    ).coalesce(1).write.mode("append").parquet(path)
    stream = stream_files(spark, path, DDL, max_files_per_trigger=1)
    agg = sliding(
        stream, "ts", "1 hour", "30 minutes", watermark="10 minutes"
    )
    name = f"sl_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance watermark far enough to close all earlier windows
        spark.createDataFrame(
            [(9, _ts("2024-01-01 13:00:00"), 2, 1.0)], DDL
        ).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
        rows = spark.sql(
            f"SELECT window_start, n FROM {name} ORDER BY window_start"
        ).collect()
        got = {r["window_start"].strftime("%H:%M"): r["n"] for r in rows}
        # event 10:10 lands in [09:30,10:30) and [10:00,11:00);
        # event 10:40 lands in [10:00,11:00) and [10:30,11:30)
        assert got["09:30"] == 1
        assert got["10:00"] == 2
        assert got["10:30"] == 1
    finally:
        q.stop()
