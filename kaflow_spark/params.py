"""Handler-parameter annotation markers + signature introspection.

Parity with the reference's DI parameter system
(/root/reference/kaflow/parameters.py:22-157, :160-223): a handler
declares what it wants injected via ``Annotated`` markers —

    @app.consume(topic="t", sink_topics=("out",))
    def handler(
        click: FromValue[Json[UserClick]],
        key: FromKey[Json[EnvKey]],
        corr_id: FromHeader[Str],          # header name = param name
        req_id: Header(alias="x-request-id"),
        offset: MessageOffset,
        partition: MessagePartition,
        ts: MessageTimestamp,
    ) -> Message | None: ...

``get_handler_spec`` introspects the signature into a ``HandlerSpec``
the pipeline compiler consumes. Exactly one ``FromValue`` is required
(mirrors kaflow/parameters.py:90-100); a non-annotated value/key type
must be ``bytes`` (mirrors :51-56).
"""

from __future__ import annotations

import inspect
import typing as _t
from dataclasses import dataclass, field

from kaflow_spark.serde.serializers import (
    AvroSerde,
    BytesSerde,
    JsonSerde,
    ProtobufSerde,
    Serde,
    StringSerde,
)

# --------------------------------------------------------------- markers


@dataclass(frozen=True)
class _Marker:
    role: str  # "value" | "key" | "header" | "offset" | "partition" | "timestamp"
    alias: str | None = None


class _RoleAlias:
    """``FromValue[X]`` -> Annotated[T, serde?, _Marker(role)]."""

    def __init__(self, role: str) -> None:
        self._role = role

    def __getitem__(self, item: object) -> object:
        if isinstance(item, _SerdeAlias):
            item = item.bare  # FromValue[Json] == FromValue[Json.bare]
        return _t.Annotated[item, _Marker(self._role)]


FromValue = _RoleAlias("value")
FromKey = _RoleAlias("key")
FromHeader = _RoleAlias("header")


def Header(alias: str | None = None, serde: Serde | None = None) -> object:
    """Header injection with an explicit header-name alias
    (kaflow/parameters.py:186-199 supports the same)."""
    # tuple-subscript form: `Annotated[str, *meta, marker]` is 3.11+
    # syntax (PEP 646) and we support 3.10
    meta = [m for m in (serde,) if m is not None]
    return _t.Annotated[tuple([str, *meta, _Marker("header", alias=alias)])]


MessageOffset = _t.Annotated[int, _Marker("offset")]
MessagePartition = _t.Annotated[int, _Marker("partition")]
MessageTimestamp = _t.Annotated[int, _Marker("timestamp")]


class _DependsMarker:
    """Dependency-injection marker (parity: kaflow/dependencies.py:7-23).

    ``scope='app'``: the factory runs once per executor python worker
    and the instance is cached (the Spark analog of the reference's
    app-scoped DI — per-process singletons on executors).
    ``scope='consumer'``: the factory runs per record.
    """

    def __init__(self, factory, scope: str = "consumer", use_cache: bool = True):
        if scope not in ("app", "consumer"):
            raise ValueError("Depends scope must be 'app' or 'consumer'")
        self.factory = factory
        self.scope = scope
        self.use_cache = use_cache


def Depends(factory, *, scope: str = "consumer", use_cache: bool = True) -> object:
    return _t.Annotated[object, _DependsMarker(factory, scope, use_cache)]


# ------------------------------------------------------- serde shorthand


class _SerdeAlias:
    """``Json[Model]`` -> Annotated[Model, JsonSerde(Model)] etc."""

    def __init__(self, factory, default_target: type) -> None:
        self._factory = factory
        self._default = default_target

    def __getitem__(self, model: type) -> object:
        return _t.Annotated[model, self._factory(model)]

    @property
    def bare(self) -> object:
        return _t.Annotated[self._default, self._factory(None)]


Json = _SerdeAlias(lambda m: JsonSerde(model=m), object)
Str = _t.Annotated[str, StringSerde()]


def Avro(schema: dict, model: type | None = None) -> object:
    s = AvroSerde(schema, model=model)
    return _t.Annotated[model or dict, s]


def Protobuf(fields: dict[int, tuple[str, str]], model: type | None = None) -> object:
    s = ProtobufSerde(fields, model=model)
    return _t.Annotated[model or dict, s]


# --------------------------------------------------------- introspection


@dataclass
class ParamBinding:
    param: str
    target_type: type | None
    serde: Serde | None
    alias: str | None = None  # header name for header bindings


@dataclass
class DependsBinding:
    param: str
    factory: object
    scope: str
    use_cache: bool


@dataclass
class HandlerSpec:
    func: object
    value: ParamBinding | None = None
    key: ParamBinding | None = None
    headers: list[ParamBinding] = field(default_factory=list)
    depends: list[DependsBinding] = field(default_factory=list)
    offset_param: str | None = None
    partition_param: str | None = None
    timestamp_param: str | None = None
    is_async: bool = False


def _unpack(
    annotation: object,
) -> tuple[object, Serde | None, _Marker | None, "_DependsMarker | None"]:
    """Flatten Annotated metadata into (base, serde, marker, depends)."""
    serde: Serde | None = None
    marker: _Marker | None = None
    depends: _DependsMarker | None = None
    base = annotation
    while _t.get_origin(base) is _t.Annotated:
        args = _t.get_args(base)
        base = args[0]
        for m in args[1:]:
            if isinstance(m, Serde):
                serde = serde or m
            elif isinstance(m, _Marker):
                marker = marker or m
            elif isinstance(m, _DependsMarker):
                depends = depends or m
    return base, serde, marker, depends


def resolve_serde(annotation: object) -> Serde | None:
    """Serde from an annotation — accepts bare aliases (``Json``) and
    subscripted forms (``Json[Model]``, ``Str``)."""
    if annotation is None:
        return None
    if isinstance(annotation, _SerdeAlias):
        annotation = annotation.bare
    if annotation is bytes:
        return BytesSerde()
    return _unpack(annotation)[1]


def get_handler_spec(func) -> HandlerSpec:
    spec = HandlerSpec(func=func, is_async=inspect.iscoroutinefunction(func))
    sig = inspect.signature(func)
    # PEP 563 (`from __future__ import annotations`) stringifies
    # signatures; evaluate them in the handler's namespace.
    try:
        hints = _t.get_type_hints(func, include_extras=True)
    except Exception:  # noqa: BLE001 - fall back to raw annotations
        hints = {}
    for name, p in sig.parameters.items():
        annotation = hints.get(name, p.annotation)
        if annotation is inspect.Parameter.empty:
            raise TypeError(
                f"handler parameter {name!r} needs a FromValue/FromKey/"
                f"FromHeader/Message* annotation"
            )
        base, serde, marker, depends = _unpack(annotation)
        if depends is not None:
            spec.depends.append(
                DependsBinding(name, depends.factory, depends.scope, depends.use_cache)
            )
            continue
        if marker is None:
            raise TypeError(
                f"handler parameter {name!r}: no injection marker found in "
                f"{p.annotation!r}"
            )
        if marker.role in ("offset", "partition", "timestamp"):
            setattr(spec, f"{marker.role}_param", name)
            continue
        if serde is None:
            if base is bytes:
                serde = BytesSerde()
            elif marker.role == "header":
                serde = StringSerde()  # headers default to utf-8 text
            else:
                # mirrors kaflow/parameters.py:51-56: only bytes may omit
                # a serializer
                raise TypeError(
                    f"handler parameter {name!r}: type {base!r} requires a "
                    f"serde annotation (only bytes can omit one)"
                )
        binding = ParamBinding(
            param=name,
            target_type=base if isinstance(base, type) else None,
            serde=serde,
            alias=marker.alias or (name if marker.role == "header" else None),
        )
        if marker.role == "value":
            if spec.value is not None:
                raise TypeError("handler declares more than one FromValue")
            spec.value = binding
        elif marker.role == "key":
            if spec.key is not None:
                raise TypeError("handler declares more than one FromKey")
            spec.key = binding
        else:
            spec.headers.append(binding)
    if spec.value is None:
        raise TypeError("handler must declare exactly one FromValue parameter")
    return spec
