"""DI / overrides / lifespan parity tests (reference A14-A16)."""

from __future__ import annotations

import json

from kaflow_spark.app import App
from kaflow_spark.message import Message
from kaflow_spark.params import Depends, FromValue, Json, Str
from kaflow_spark.testclient import TestClient


def get_prefix() -> str:
    return "real"


def counter_factory() -> dict:
    return {"calls": 0}


def test_depends_injection(spark):
    app = App()

    @app.consume(topic="t", sink_topics=("out",))
    def handler(v: FromValue[Str], prefix: Depends(get_prefix)) -> Message:
        return Message(value=f"{prefix}:{v}".encode())

    client = TestClient(app, spark)
    assert client.publish("t", b"x").value == b"real:x"


def test_dependency_override(spark):
    app = App()

    @app.consume(topic="t", sink_topics=("out",))
    def handler(v: FromValue[Str], prefix: Depends(get_prefix)) -> Message:
        return Message(value=f"{prefix}:{v}".encode())

    app.dependency_overrides[get_prefix] = lambda: "fake"
    client = TestClient(app, spark)
    assert client.publish("t", b"x").value == b"fake:x"
    del app.dependency_overrides[get_prefix]
    client2 = TestClient(app, spark)
    assert client2.publish("t", b"x").value == b"real:x"


def test_app_scope_caches_per_worker(spark):
    """app-scoped dependencies are created once per python worker and
    reused across records (per-process singleton on executors)."""
    app = App()

    @app.consume(topic="t", sink_topics=("out",))
    def handler(
        v: FromValue[Str], state: Depends(counter_factory, scope="app")
    ) -> Message:
        state["calls"] += 1
        return Message(value=str(state["calls"]).encode())

    client = TestClient(app, spark)
    # two records in ONE batch => same worker, shared app-scoped state
    import kaflow_spark.message as M

    env = spark.createDataFrame(
        [
            ("t", 0, 0, None, 0, None, b"a", None),
            ("t", 0, 1, None, 0, None, b"b", None),
        ],
        M.ENVELOPE_DDL,
    ).coalesce(1)
    out, _ = app.process_batch(env)
    values = sorted(bytes(r["value"]) for r in out.collect())
    assert values == [b"1", b"2"]  # cached instance incremented twice


def test_consumer_scope_fresh_per_record(spark):
    app = App()

    @app.consume(topic="t", sink_topics=("out",))
    def handler(
        v: FromValue[Str], state: Depends(counter_factory, scope="consumer")
    ) -> Message:
        state["calls"] += 1
        return Message(value=str(state["calls"]).encode())

    import kaflow_spark.message as M

    env = spark.createDataFrame(
        [
            ("t", 0, 0, None, 0, None, b"a", None),
            ("t", 0, 1, None, 0, None, b"b", None),
        ],
        M.ENVELOPE_DDL,
    ).coalesce(1)
    out, _ = app.process_batch(env)
    values = [bytes(r["value"]) for r in out.collect()]
    assert values == [b"1", b"1"]  # fresh dict per record


def test_lifespan_wraps_session():
    events: list[str] = []

    import contextlib

    @contextlib.contextmanager
    def lifespan(app):
        events.append("up")
        yield
        events.append("down")

    app = App(lifespan=lifespan)
    with app.run_context():
        events.append("body")
    assert events == ["up", "body", "down"]


def test_async_lifespan():
    events: list[str] = []

    import contextlib

    @contextlib.asynccontextmanager
    async def lifespan(app):
        events.append("up")
        yield
        events.append("down")

    app = App(lifespan=lifespan)
    with app.run_context():
        events.append("body")
    assert events == ["up", "body", "down"]
