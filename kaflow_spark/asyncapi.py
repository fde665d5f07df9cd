"""AsyncAPI 2.6.0 document generation from an :class:`App`'s registry.

Parity surface: the reference ships an AsyncAPI builder
(kaflow/asyncapi/_builder.py:55-86 assembles info + pydantic model
definitions into an AsyncAPI model) whose public entry point raises
NotImplementedError (kaflow/applications.py:446-460) — the document is
never actually produced there. This module finishes the job against
the SAME registry information our App tracks: one channel per topic,
operations derived from the consumer/producer role, and payload
schemas compiled from the handlers' pydantic models.

AsyncAPI 2.x role convention: on a channel the application CONSUMES,
the document exposes a ``publish`` operation (clients publish so the
app receives); topics the app PRODUCES to (sink topics and
``@produce`` targets) expose ``subscribe``. Everything here is plain
dict assembly — no network, no pydantic-internals beyond the public
``model_json_schema``.
"""

from __future__ import annotations

from typing import Any

_REF_TEMPLATE = "#/components/schemas/{model}"


def _is_pydantic_model(t: object) -> bool:
    try:
        from pydantic import BaseModel

        return isinstance(t, type) and issubclass(t, BaseModel) and t is not BaseModel
    except ImportError:  # pragma: no cover - pydantic is a hard dep
        return False


def _collect_schema(
    t: type, schemas: dict[str, Any], owners: dict[str, type]
) -> str | None:
    """Compile a pydantic model (and its nested $defs) into
    ``schemas``; return the component name. Component names are class
    names (that is what pydantic's $refs use), so two DIFFERENT
    classes sharing a name cannot coexist in one document — fail
    loudly instead of silently pointing one channel at the other's
    schema."""
    doc = t.model_json_schema(ref_template=_REF_TEMPLATE)
    for name, sub in doc.pop("$defs", {}).items():
        if schemas.setdefault(name, sub) != sub:
            raise ValueError(
                f"AsyncAPI schema name collision on {name!r}: two "
                "different models share the class name; rename one "
                "(pydantic $refs are class-name based)"
            )
    name = t.__name__
    prev = owners.setdefault(name, t)
    if prev is not t:
        raise ValueError(
            f"AsyncAPI schema name collision on {name!r}: "
            f"{prev.__module__}.{prev.__qualname__} vs "
            f"{t.__module__}.{t.__qualname__}; rename one model"
        )
    # the name may already be occupied by a NESTED ($defs) model from
    # an earlier handler — owners doesn't track those, so compare the
    # schema bodies: identical means same model (fine), different
    # means a silent mis-pointing we must refuse
    if schemas.setdefault(name, doc) != doc:
        raise ValueError(
            f"AsyncAPI schema name collision on {name!r}: a nested "
            "model of another handler already claimed the name with a "
            "different schema; rename one model"
        )
    return name


def build_asyncapi(app: Any) -> dict[str, Any]:
    """Assemble the AsyncAPI 2.6.0 document for ``app``.

    Channels cover every consumed topic, every sink topic, and every
    ``@produce`` target; message payloads reference
    ``components.schemas`` entries compiled from the handlers'
    pydantic value/key models (non-model payloads are typed as opaque
    byte strings).
    """
    from kaflow_spark.app import _BatchConsumer, _Consumer

    schemas: dict[str, Any] = {}
    owners: dict[str, type] = {}
    messages: dict[str, Any] = {}
    channels: dict[str, Any] = {}

    def message_for(t: object, fallback: str) -> dict[str, Any]:
        if _is_pydantic_model(t):
            name = _collect_schema(t, schemas, owners)
            messages.setdefault(
                name,
                {"name": name, "payload": {"$ref": f"{_REF_TEMPLATE.format(model=name)}"}},
            )
            return {"$ref": f"#/components/messages/{name}"}
        messages.setdefault(
            fallback,
            {
                "name": fallback,
                "payload": {"type": "string", "format": "binary"},
            },
        )
        return {"$ref": f"#/components/messages/{fallback}"}

    produced_topics: dict[str, dict[str, Any]] = {}

    for topic, reg in app._consumers.items():
        if isinstance(reg, _Consumer):
            value_t = reg.spec.value.target_type if reg.spec.value else None
            kind = "record_handler"
        else:
            # batch consumers and transforms declare their payload via
            # the value serde; surface its pydantic model when typed
            value_t = getattr(reg.value_serde, "model", None)
            kind = (
                "batch_handler"
                if isinstance(reg, _BatchConsumer)
                else "dataframe_transform"
            )
        channels[topic] = {
            "description": f"consumed by {kind}",
            "publish": {
                "operationId": f"receive_{topic}",
                "message": message_for(value_t, "Bytes"),
            },
        }
        if isinstance(reg, _Consumer):
            # key/header models belong in components.schemas too (the
            # upstream builder's get_flat_models collects all three,
            # kaflow/asyncapi/_builder.py:21-38)
            extra = [reg.spec.key.target_type if reg.spec.key else None]
            extra += [h.target_type for h in reg.spec.headers]
            for t in extra:
                if _is_pydantic_model(t):
                    _collect_schema(t, schemas, owners)
        for sink in reg.sink_topics:
            produced_topics.setdefault(sink, {"from": topic})

    for topic in sorted(getattr(app, "_produce_topics", ())):
        produced_topics.setdefault(topic, {"from": "@produce"})

    for topic, meta in produced_topics.items():
        ch = channels.setdefault(topic, {})
        ch.setdefault("description", f"produced (fan-out from {meta['from']})")
        ch["subscribe"] = {
            "operationId": f"send_{topic}",
            "message": message_for(None, "Bytes"),
        }
    if app.dlq_topic:
        channels.setdefault(app.dlq_topic, {})["subscribe"] = {
            "operationId": f"send_{app.dlq_topic}",
            "message": message_for(None, "DeadLetter"),
        }

    info: dict[str, Any] = {"title": app.name, "version": app.version}
    if app.description:
        info["description"] = app.description

    doc: dict[str, Any] = {
        "asyncapi": "2.6.0",
        "info": info,
        "channels": channels,
    }
    if app.brokers:
        server: dict[str, Any] = {
            "url": app.brokers,
            "protocol": "kafka",
        }
        if app.security_protocol != "PLAINTEXT":
            server["protocol"] = "kafka-secure"
            server["description"] = f"security: {app.security_protocol}"
        doc["servers"] = {"default": server}
    components: dict[str, Any] = {}
    if schemas:
        components["schemas"] = schemas
    if messages:
        components["messages"] = messages
    if components:
        doc["components"] = components
    return doc


_ASYNCAPI_JS_URL = (
    "https://unpkg.com/@asyncapi/web-component@1.0.0-next.47"
    "/lib/asyncapi-web-component.js"
)
_ASYNCAPI_CSS_URL = (
    "https://unpkg.com/@asyncapi/react-component@1.0.0-next.12"
    "/styles/default.min.css"
)


def get_asyncapi_html(
    title: str,
    asyncapi_schema: dict[str, Any],
    asyncapi_react_component_js_url: str = _ASYNCAPI_JS_URL,
    asyncapi_react_component_css_url: str = _ASYNCAPI_CSS_URL,
) -> str:
    """Standalone HTML page rendering the AsyncAPI document with the
    official web-component viewer (parity with the reference's
    ``get_asyncapi_html``, kaflow/asyncapi/docs.py:9-37 — same page
    structure: stylesheet link + deferred component script +
    ``<asyncapi-component schema='...'>``).

    Two hardening deltas vs the reference: the schema JSON is embedded
    in a single-quoted HTML attribute, so any ``'`` / ``&`` / ``<``
    inside the document (e.g. in a model description) is escaped as an
    HTML entity — the reference interpolates the raw JSON and a quote
    in a docstring would truncate the attribute; and the page title is
    entity-escaped too (the reference interpolates it raw, so a title
    containing markup would inject into the page).
    """
    import json as _json

    payload = (
        _json.dumps(asyncapi_schema, separators=(",", ":"))
        .replace("&", "&amp;")
        .replace("'", "&#39;")
        .replace("<", "&lt;")
    )
    title = title.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return f"""
    <!DOCTYPE html>
    <html>
    <head>
        <link
            rel="stylesheet"
            href="{asyncapi_react_component_css_url}"
        />
        <title>{title}</title>
    </head>
    <body>
        <script
            src="{asyncapi_react_component_js_url}"
            defer
        ></script>
        <asyncapi-component
            schema='{payload}'
            cssImportPath="{asyncapi_react_component_css_url}"
        ></asyncapi-component>
    </body>
    </html>
    """


__all__ = ["build_asyncapi", "get_asyncapi_html"]
