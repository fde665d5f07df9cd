"""App error paths + the schema catalog (AsyncAPI analog)."""

from __future__ import annotations

import pytest
from pydantic import BaseModel

from kaflow_spark.app import App
from kaflow_spark.message import Message
from kaflow_spark.params import FromHeader, FromKey, FromValue, Json, Str


class Click(BaseModel):
    user_id: int
    url: str


def test_streaming_requires_brokers(spark):
    app = App()

    @app.consume(topic="t", sink_topics=("o",))
    def h(v: FromValue[Str]) -> Message:
        return Message(value=b"x")

    with pytest.raises(ValueError, match="brokers"):
        app.source_stream(spark)


def test_describe_catalog(spark):
    app = App()

    @app.consume(topic="clicks", sink_topics=("out1", "out2"))
    def h(
        v: FromValue[Json[Click]], k: FromKey[Str], corr: FromHeader[Str]
    ) -> Message:
        return Message(value=b"x")

    @app.transform(topic="clicks2", sink_topics=("big",), value=Json[Click])
    def t(df):
        return df

    d = app.describe()
    assert d["clicks"]["kind"] == "record_handler"
    assert d["clicks"]["sink_topics"] == ["out1", "out2"]
    assert "user_id:bigint" in d["clicks"]["value_schema"]
    assert d["clicks"]["value_type"] == "Click"
    assert d["clicks"]["headers"] == ["corr"]
    assert d["clicks2"]["kind"] == "dataframe_transform"
    assert "url:string" in d["clicks2"]["value_schema"]


def test_root_package_drop_in_imports():
    """A reference user's import line works with the package swapped."""
    from kaflow_spark import (  # noqa: F401
        FromHeader,
        FromKey,
        FromValue,
        Json,
        Kaflow,
        Message,
        TestClient,
    )

    app = Kaflow(name="drop-in", brokers="localhost:9092")
    assert isinstance(app, App)


def test_publish_to_unregistered_topic_raises(spark):
    from kaflow_spark.testclient import TestClient

    app = App()

    @app.consume(topic="known", sink_topics=("o",))
    def h(v: FromValue[Str]) -> Message:
        return Message(value=b"x")

    client = TestClient(app, spark)
    with pytest.raises(KeyError, match="unknown"):
        client.publish("unknown", b"x")


def test_topic_reregistration_replaces(spark):
    """One handler per topic, last registration wins (parity with the
    reference's dict registry, kaflow/applications.py:262-276)."""
    app = App()

    @app.consume(topic="t", sink_topics=("a",))
    def h1(v: FromValue[Str]) -> Message:
        return Message(value=b"1")

    @app.consume(topic="t", sink_topics=("b",))
    def h2(v: FromValue[Str]) -> Message:
        return Message(value=b"2")

    from kaflow_spark.testclient import TestClient

    client = TestClient(app, spark)
    msg = client.publish("t", b"x")
    assert msg.value == b"2"
    assert [r["topic"] for r in client.last_outputs] == ["b"]


def test_dlq_records_carry_error_headers(spark):
    """DLQ records expose error/offset/partition as real Kafka headers
    (array<struct<key,value>>), so consumers can diagnose failures
    without parsing the possibly-garbled value bytes."""
    app = App(name="t", dlq_topic="dead")

    dlq = spark.createDataFrame(
        [("clicks", 3, 42, None, b"\xff{bad", b"k1", "deserialization:value: boom")],
        "topic string, partition int, offset bigint, timestamp timestamp, "
        "value binary, key binary, error string",
    )
    rows = app._dlq_records(dlq).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.topic == "dead"
    assert bytes(r.value) == b"\xff{bad"
    hdrs = {h.key: bytes(h.value).decode() for h in r.headers}
    assert hdrs["error"] == "deserialization:value: boom"
    assert hdrs["source_offset"] == "42"
    assert hdrs["source_partition"] == "3"
