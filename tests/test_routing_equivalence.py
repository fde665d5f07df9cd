"""Multi-topic routing (reference A2) and batch/streaming-operator
equivalence cross-checks."""

from __future__ import annotations

from pyspark.sql import functions as F

import kaflow_spark.message as M
from kaflow_spark.app import App
from kaflow_spark.catalog import load
from kaflow_spark.message import Message
from kaflow_spark.params import FromValue, Str
from kaflow_spark.queries import REGISTRY
from kaflow_spark.streaming.windows import session


def test_multi_topic_routing(spark):
    """One envelope scan, two registered topics: records dispatch to
    the right handler; unregistered topics are ignored."""
    app = App()

    @app.consume(topic="alpha", sink_topics=("out_a",))
    def ha(v: FromValue[Str]) -> Message:
        return Message(value=f"A:{v}".encode())

    @app.consume(topic="beta", sink_topics=("out_b",))
    def hb(v: FromValue[Str]) -> Message:
        return Message(value=f"B:{v}".encode())

    env = spark.createDataFrame(
        [
            ("alpha", 0, 0, None, 0, None, b"1", None),
            ("beta", 0, 1, None, 0, None, b"2", None),
            ("gamma", 0, 2, None, 0, None, b"3", None),  # unregistered
            ("alpha", 0, 3, None, 0, None, b"4", None),
        ],
        M.ENVELOPE_DDL,
    )
    out, dlq = app.process_batch(env)
    got = sorted((r["topic"], bytes(r["value"])) for r in out.collect())
    assert got == [("out_a", b"A:1"), ("out_a", b"A:4"), ("out_b", b"B:2")]
    assert dlq.count() == 0


def test_session_window_matches_gaps_and_islands(spark, sf_dir):
    """The native session_window operator (streaming twin) agrees with
    the oracle-checked gaps-and-islands composition (q31) on session
    count and sizes per user."""
    e = load(spark, sf_dir, "events")
    native = (
        session(e, "ts", "30 minutes", keys=["user_id"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n").alias("n_events"),
        )
    )
    composed = (
        REGISTRY["q31_sessionize"]
        .spark(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n").alias("n_events"),
        )
    )
    a = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in native.collect()}
    b = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in composed.collect()}
    assert a == b
