"""AsyncAPI 2.6.0 document generation (the working version of the
reference's dead-code builder — kaflow/asyncapi/_builder.py:55-86
assembles the document but kaflow/applications.py:446-460 raises
NotImplementedError before ever calling it)."""

from __future__ import annotations

from pydantic import BaseModel

from kaflow_spark.app import App, Message
from kaflow_spark.params import FromKey, FromValue, Json


class Order(BaseModel):
    order_id: int
    item: "Item"
    total: float


class Item(BaseModel):
    sku: str
    qty: int


class RouteKey(BaseModel):
    region: str


def _app() -> App:
    app = App(
        name="orders-app",
        version="1.2.3",
        description="order processing",
        brokers="b1:9092,b2:9092",
        dlq_topic="orders.dlq",
    )

    @app.consume(topic="orders.in", sink_topics=("orders.enriched",))
    def handle(v: FromValue[Json[Order]], k: FromKey[Json[RouteKey]]) -> Message:
        return Message(value=b"{}")

    @app.produce(sink_topic="orders.audit")
    def audit() -> Message:
        return Message(value=b"{}")

    return app


def test_document_skeleton_and_info():
    doc = _app().asyncapi()
    assert doc["asyncapi"] == "2.6.0"
    assert doc["info"] == {
        "title": "orders-app",
        "version": "1.2.3",
        "description": "order processing",
    }
    assert doc["servers"]["default"] == {
        "url": "b1:9092,b2:9092",
        "protocol": "kafka",
    }


def test_channels_cover_consume_fanout_produce_and_dlq():
    doc = _app().asyncapi()
    ch = doc["channels"]
    # consumed topic -> publish operation (clients publish, app receives)
    assert ch["orders.in"]["publish"]["operationId"] == "receive_orders.in"
    # sink topic, @produce target, and DLQ -> subscribe operations
    for t in ("orders.enriched", "orders.audit", "orders.dlq"):
        assert ch[t]["subscribe"]["operationId"] == f"send_{t}"
    assert set(ch) == {
        "orders.in",
        "orders.enriched",
        "orders.audit",
        "orders.dlq",
    }


def test_payload_schemas_compiled_from_pydantic_models():
    doc = _app().asyncapi()
    schemas = doc["components"]["schemas"]
    # nested model hoisted into components alongside its parent
    assert {"Order", "Item"} <= set(schemas)
    assert schemas["Order"]["properties"]["item"]["$ref"] == (
        "#/components/schemas/Item"
    )
    msg = doc["components"]["messages"]["Order"]
    assert msg["payload"] == {"$ref": "#/components/schemas/Order"}
    assert doc["channels"]["orders.in"]["publish"]["message"] == {
        "$ref": "#/components/messages/Order"
    }


def test_secure_server_marked_kafka_secure():
    app = App(
        name="s",
        brokers="b:9093",
        security_protocol="SASL_SSL",
        sasl_mechanism="PLAIN",
        sasl_plain_username="u",
        sasl_plain_password="p",
    )
    doc = app.asyncapi()
    assert doc["servers"]["default"]["protocol"] == "kafka-secure"


def test_document_is_json_serializable():
    import json

    json.dumps(_app().asyncapi())


def test_transform_and_key_models_documented(spark):
    # spark needed: @app.transform compiles the serde's JVM column
    from kaflow_spark.params import Json as J

    app = App(name="t-app")

    @app.transform(topic="orders.t", value=J[Order])
    def tfm(df):
        return df

    doc = app.asyncapi()
    # typed transform payload is a real schema ref, not opaque bytes
    assert doc["channels"]["orders.t"]["publish"]["message"] == {
        "$ref": "#/components/messages/Order"
    }
    # key model of the record handler reaches components.schemas
    doc2 = _app().asyncapi()
    assert "RouteKey" in doc2["components"]["schemas"]


# a DIFFERENT class carrying the same class name as Order above
# (module-level so lazy annotation evaluation can resolve it)
OrderClone = __import__("pydantic").create_model("Order", other=(str, ...))


def test_schema_name_collision_raises():
    import pytest

    app = App(name="c-app")

    @app.consume(topic="a")
    def h1(v: FromValue[Json[Order]]) -> Message:
        return Message(value=b"")

    @app.consume(topic="b")
    def h2(v: FromValue[Json[OrderClone]]) -> Message:
        return Message(value=b"")

    with pytest.raises(ValueError, match="collision"):
        app.asyncapi()


def test_same_model_nested_then_toplevel_is_fine():
    """Item appears nested in Order's $defs AND as a top-level handler
    model — same class, so no collision is raised and both channels
    reference the one schema."""
    app = App(name="n-app")

    @app.consume(topic="orders")
    def h1(v: FromValue[Json[Order]]) -> Message:
        return Message(value=b"")

    @app.consume(topic="items")
    def h2(v: FromValue[Json[Item]]) -> Message:
        return Message(value=b"")

    doc = app.asyncapi()
    assert doc["channels"]["items"]["publish"]["message"] == {
        "$ref": "#/components/messages/Item"
    }


# a different class named Item, to collide with Order's NESTED Item
ItemClone = __import__("pydantic").create_model("Item", zzz=(int, ...))


def test_nested_then_different_toplevel_collision_raises():
    import pytest

    app = App(name="nc-app")

    @app.consume(topic="orders")
    def h1(v: FromValue[Json[Order]]) -> Message:  # nests Item via $defs
        return Message(value=b"")

    @app.consume(topic="items")
    def h2(v: FromValue[Json[ItemClone]]) -> Message:
        return Message(value=b"")

    with pytest.raises(ValueError, match="collision"):
        app.asyncapi()


def test_html_page_embeds_schema_and_viewer():
    """get_asyncapi_html parity (reference kaflow/asyncapi/docs.py:9-37):
    stylesheet link, deferred web-component script, and the document
    JSON embedded in the <asyncapi-component schema='...'> attribute."""
    import json

    app = _app()
    html = app.asyncapi_html()
    assert "<!DOCTYPE html>" in html
    assert "<title>orders-app</title>" in html
    assert "asyncapi-web-component.js" in html and "defer" in html
    assert "default.min.css" in html
    # the embedded attribute round-trips to the exact document
    start = html.index("schema='") + len("schema='")
    end = html.index("'", start)
    payload = (
        html[start:end]
        .replace("&#39;", "'")
        .replace("&lt;", "<")
        .replace("&amp;", "&")
    )
    assert json.loads(payload) == app.asyncapi()


def test_html_page_escapes_quotes_in_descriptions():
    """A single quote in an app description must not truncate the
    single-quoted schema attribute (hardening delta vs the reference,
    which interpolates raw JSON)."""
    app = App(name="q'app", version="1", description="it's quoted", brokers="")

    html = app.asyncapi_html(title="T")
    start = html.index("schema='") + len("schema='")
    end = html.index("'", start)
    # the raw quote never appears inside the attribute body
    assert "'" not in html[start:end]
    assert "&#39;" in html[start:end]
