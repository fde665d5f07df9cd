"""Serialization layer (parity: /root/reference/kaflow/serializers.py:32-131).

Every serde exposes two levels:

- **python codec** (``loads``/``dumps``): used inside the Arrow-batched
  handler stage (the bytes already crossed into Python for the user's
  handler, so decoding there costs no extra JVM<->Python crossing) and
  by the TestClient.
- **column codec** (``decode_col``/``encode_col``): the JVM fast path
  for declarative pipelines with no Python handler — ``from_json`` /
  ``to_json`` / casts, fully inside whole-stage codegen.

Avro and Protobuf: the connector jars (spark-avro / spark-protobuf)
are not bundled with stock PySpark; when absent we fall back to a
pure-Python binary codec. The Avro fallback covers the full recursive
schema language (nested records, arrays, maps, enums, fixed, unions,
named-type references — the reference accepts arbitrary user schemas,
kaflow/serializers.py:76-106); the Protobuf fallback covers scalar and
arbitrarily nested message fields. Golden-bytes fixtures mirror the
reference's (/root/reference/tests/test_serializers.py:33-88). The
fallback is Arrow-batched, never per-row JVM round-trips.
"""

from __future__ import annotations

import io
import json
import struct as _struct
from abc import ABC, abstractmethod
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType


class Serde(ABC):
    """Two-level codec: python loads/dumps + optional JVM column path."""

    #: handler-facing python type this serde produces (may be None)
    target_type: type | None = None

    @abstractmethod
    def loads(self, data: bytes) -> Any: ...

    @abstractmethod
    def dumps(self, obj: Any) -> bytes: ...

    def spark_schema(self) -> DataType | None:
        """Schema of the decoded column on the JVM path, if known."""
        return None

    def decode_col(self, col: Column) -> Column | None:
        """JVM-side decode bytes->typed column; None => python-only."""
        return None

    def encode_col(self, col: Column) -> Column | None:
        """JVM-side encode typed column->bytes; None => python-only."""
        return None

    def decode_with_errors(self, col: Column) -> tuple[Column, Column] | None:
        """JVM-side decode returning (parsed, is_malformed). Default:
        malformed == raw non-null but parse yielded null."""
        parsed = self.decode_col(col)
        if parsed is None:
            return None
        return parsed, col.isNotNull() & parsed.isNull()

    # -- probe API: lets the pipeline evaluate the (possibly expensive,
    # non-codegen) decode expression ONCE behind a Generate barrier and
    # derive error/clean views from the materialized result. Without
    # this, project-collapsing re-inlines from_json into every
    # consumer (6x parse per row measured).
    def probe_col(self, col: Column) -> Column | None:
        """Decode probe (may carry error metadata); None => no JVM path."""
        return self.decode_col(col)

    def probe_bad(self, probe: Column, raw: Column) -> Column:
        """Malformed predicate over the MATERIALIZED probe column."""
        return raw.isNotNull() & probe.isNull()

    def probe_clean(self, probe: Column) -> Column:
        """The typed value from the materialized probe column."""
        return probe


class BytesSerde(Serde):
    """Identity passthrough (the reference's no-serializer case,
    kaflow/parameters.py:51-56 allows bare ``bytes`` only)."""

    target_type = bytes

    def loads(self, data: bytes) -> bytes:
        return data

    def dumps(self, obj: Any) -> bytes:
        if isinstance(obj, (bytes, bytearray, memoryview)):
            return bytes(obj)
        raise TypeError(f"BytesSerde expects bytes, got {type(obj).__name__}")

    def decode_col(self, col: Column) -> Column:
        return col

    def encode_col(self, col: Column) -> Column:
        return col.cast("binary")


class StringSerde(Serde):
    """UTF-8 text (kaflow/serializers.py:46-57)."""

    target_type = str

    def __init__(self, encoding: str = "utf-8") -> None:
        self.encoding = encoding

    def loads(self, data: bytes) -> str:
        return data.decode(self.encoding)

    def dumps(self, obj: Any) -> bytes:
        return str(obj).encode(self.encoding)

    def decode_col(self, col: Column) -> Column:
        return col.cast("string")

    def encode_col(self, col: Column) -> Column:
        return col.cast("string").cast("binary")


class JsonSerde(Serde):
    """JSON payloads (kaflow/serializers.py:60-71), optionally bound to
    a pydantic model for schema-validated decoding."""

    def __init__(self, model: type | None = None) -> None:
        self.model = model
        self.target_type = model if model is not None else object

    # -- python path --------------------------------------------------
    def loads(self, data: bytes) -> Any:
        obj = json.loads(data)
        if self.model is not None:
            return self.model(**obj)  # pydantic validation, like the ref
        return obj

    def dumps(self, obj: Any) -> bytes:
        if self.model is not None and isinstance(obj, self.model):
            dump = getattr(obj, "model_dump", None) or getattr(obj, "dict", None)
            obj = dump() if dump else vars(obj)
        return json.dumps(obj).encode("utf-8")

    # -- JVM path ------------------------------------------------------
    def spark_schema(self) -> StructType | None:
        if self.model is None:
            return None
        from kaflow_spark.serde.pydantic_schema import model_to_struct

        return model_to_struct(self.model)

    def decode_col(self, col: Column) -> Column | None:
        schema = self.spark_schema()
        if schema is None:
            return None
        return F.from_json(col.cast("string"), schema)

    def _probe_schema(self) -> StructType | None:
        schema = self.spark_schema()
        if schema is None:
            return None
        from pyspark.sql.types import StringType, StructField

        return StructType([*schema.fields, StructField("_corrupt_rec", StringType())])

    def decode_with_errors(self, col: Column) -> tuple[Column, Column] | None:
        """from_json in PERMISSIVE mode yields an all-null struct (not
        NULL) on malformed input, so detect corruption explicitly via
        columnNameOfCorruptRecord."""
        parsed = self.probe_col(col)
        if parsed is None:
            return None
        return self.probe_clean(parsed), self.probe_bad(parsed, col)

    def probe_col(self, col: Column) -> Column | None:
        probe = self._probe_schema()
        if probe is None:
            return None
        return F.from_json(
            col.cast("string"),
            probe,
            {"columnNameOfCorruptRecord": "_corrupt_rec", "mode": "PERMISSIVE"},
        )

    def probe_bad(self, probe: Column, raw: Column) -> Column:
        return (raw.isNotNull() & probe.isNull()) | probe["_corrupt_rec"].isNotNull()

    def probe_clean(self, probe: Column) -> Column:
        return probe.dropFields("_corrupt_rec")

    def encode_col(self, col: Column) -> Column:
        return F.to_json(col).cast("binary")


# ---------------------------------------------------------------------
# Avro: minimal binary codec for flat record schemas (fallback when the
# spark-avro jar is absent). Field order follows the schema, encoding
# per the Avro 1.x binary spec: zigzag varints, length-prefixed utf8.
# ---------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise ValueError("truncated Avro varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _as_dict(obj: Any) -> dict[str, Any]:
    if isinstance(obj, dict):
        return obj
    dump = getattr(obj, "model_dump", None) or getattr(obj, "dict", None)
    return dump() if dump else vars(obj)


class AvroSerde(Serde):
    """Schemaless Avro binary records (kaflow/serializers.py:76-108).

    ``schema`` is a standard Avro record schema dict. Covers the full
    recursive schema language per the Avro 1.x binary spec: primitives
    (string/bytes/int/long/float/double/boolean/null), arbitrarily
    nested records, arrays and maps (block-encoded), enums, fixed,
    unions (any branch set, not just nullable), and references to
    previously defined named types.
    """

    _PRIMITIVES = {
        "string", "bytes", "int", "long", "float", "double", "boolean", "null",
    }

    def __init__(self, schema: dict[str, Any], model: type | None = None) -> None:
        if schema.get("type") != "record":
            raise ValueError("AvroSerde supports record schemas")
        self.schema = schema
        self.model = model
        self.target_type = model if model is not None else dict
        self._named: dict[str, dict[str, Any]] = {}
        self._collect_names(schema)
        self.fields: list[tuple[str, Any]] = [
            (f["name"], f["type"]) for f in schema["fields"]
        ]
        for _, t in self.fields:
            self._validate(t)

    # -- schema walking ------------------------------------------------
    def _collect_names(self, typ: Any) -> None:
        """Register named types (record/enum/fixed) so later fields can
        reference them by name, as the spec allows."""
        if isinstance(typ, list):
            for t in typ:
                self._collect_names(t)
        elif isinstance(typ, dict):
            kind = typ.get("type")
            if kind in ("record", "enum", "fixed") and "name" in typ:
                self._named[typ["name"]] = typ
            if kind == "record":
                for f in typ.get("fields", []):
                    self._collect_names(f["type"])
            elif kind == "array":
                self._collect_names(typ["items"])
            elif kind == "map":
                self._collect_names(typ["values"])

    def _resolve(self, typ: Any) -> Any:
        if isinstance(typ, str) and typ in self._named:
            return self._named[typ]
        return typ

    def _validate(self, typ: Any) -> None:
        typ = self._resolve(typ)
        if isinstance(typ, list):
            for t in typ:
                self._validate(t)
            return
        if isinstance(typ, dict):
            kind = typ.get("type")
            if kind == "record":
                for f in typ.get("fields", []):
                    self._validate(f["type"])
            elif kind == "array":
                self._validate(typ["items"])
            elif kind == "map":
                self._validate(typ["values"])
            elif kind == "enum":
                if not typ.get("symbols"):
                    raise ValueError("Avro enum needs symbols")
            elif kind == "fixed":
                if not isinstance(typ.get("size"), int):
                    raise ValueError("Avro fixed needs integer size")
            elif kind in self._PRIMITIVES:  # {"type": "string"} wrapper
                pass
            else:
                raise ValueError(f"unsupported Avro type {typ!r}")
            return
        if typ not in self._PRIMITIVES:
            raise ValueError(f"unsupported Avro field type {typ!r}")

    def _union_branch(self, typ: list[Any], v: Any) -> int:
        """Pick the union branch whose type accepts the python value
        (writers choose the branch; None always takes 'null')."""
        kinds = [
            self._resolve(t).get("type") if isinstance(self._resolve(t), dict)
            else self._resolve(t)
            for t in typ
        ]
        if v is None:
            if "null" in kinds:
                return kinds.index("null")
            raise ValueError("None for non-nullable union")
        accepts = {
            bool: ("boolean",),
            int: ("long", "int"),
            float: ("double", "float"),
            str: ("string", "enum"),
            bytes: ("bytes", "fixed"),
            bytearray: ("bytes", "fixed"),
            list: ("array",),
        }
        want = accepts.get(type(v), ("record", "map"))
        for pref in want:
            for i, k in enumerate(kinds):
                if k == pref:
                    return i
        # fall back to the sole non-null branch (nullable-union shape)
        non_null = [i for i, k in enumerate(kinds) if k != "null"]
        if len(non_null) == 1:
            return non_null[0]
        raise ValueError(f"no union branch in {typ!r} accepts {type(v)}")

    # -- binary codec --------------------------------------------------
    def _write(self, out: bytearray, typ: Any, v: Any) -> None:
        typ = self._resolve(typ)
        if isinstance(typ, list):  # union: branch index first
            branch = self._union_branch(typ, v)
            out += _zigzag_encode(branch)
            typ = self._resolve(typ[branch])
        if isinstance(typ, dict):
            kind = typ.get("type")
            if kind == "record":
                rec = _as_dict(v)
                for f in typ["fields"]:
                    self._write(out, f["type"], rec.get(f["name"]))
                return
            if kind == "array":
                items = list(v or [])
                if items:
                    out += _zigzag_encode(len(items))
                    for item in items:
                        self._write(out, typ["items"], item)
                out += _zigzag_encode(0)
                return
            if kind == "map":
                entries = dict(v or {})
                if entries:
                    out += _zigzag_encode(len(entries))
                    for mk, mv in entries.items():
                        enc = str(mk).encode("utf-8")
                        out += _zigzag_encode(len(enc)) + enc
                        self._write(out, typ["values"], mv)
                out += _zigzag_encode(0)
                return
            if kind == "enum":
                out += _zigzag_encode(typ["symbols"].index(v))
                return
            if kind == "fixed":
                raw = bytes(v)
                if len(raw) != typ["size"]:
                    raise ValueError(
                        f"fixed({typ['size']}) got {len(raw)} bytes"
                    )
                out += raw
                return
            typ = kind  # {"type": "string"} wrapper -> primitive
        if typ == "null":
            return
        if typ == "string":
            enc = str(v).encode("utf-8")
            out += _zigzag_encode(len(enc)) + enc
        elif typ == "bytes":
            out += _zigzag_encode(len(v)) + bytes(v)
        elif typ in ("int", "long"):
            out += _zigzag_encode(int(v))
        elif typ == "float":
            out += _struct.pack("<f", float(v))
        elif typ == "double":
            out += _struct.pack("<d", float(v))
        elif typ == "boolean":
            out.append(1 if v else 0)

    def _read_block_count(self, buf: io.BytesIO) -> int:
        """Array/map block header: a negative count means |count| items
        preceded by a block byte size (spec allows writers to emit it
        for skippability) — read and discard the size."""
        n = _zigzag_decode(buf)
        if n < 0:
            _zigzag_decode(buf)  # block size in bytes, unused here
            n = -n
        return n

    def _read(self, buf: io.BytesIO, typ: Any) -> Any:
        typ = self._resolve(typ)
        if isinstance(typ, list):
            typ = self._resolve(typ[_zigzag_decode(buf)])
        if isinstance(typ, dict):
            kind = typ.get("type")
            if kind == "record":
                return {
                    f["name"]: self._read(buf, f["type"]) for f in typ["fields"]
                }
            if kind == "array":
                items: list[Any] = []
                while (n := self._read_block_count(buf)) != 0:
                    items.extend(
                        self._read(buf, typ["items"]) for _ in range(n)
                    )
                return items
            if kind == "map":
                entries: dict[str, Any] = {}
                while (n := self._read_block_count(buf)) != 0:
                    for _ in range(n):
                        klen = _zigzag_decode(buf)
                        mk = buf.read(klen).decode("utf-8")
                        entries[mk] = self._read(buf, typ["values"])
                return entries
            if kind == "enum":
                return typ["symbols"][_zigzag_decode(buf)]
            if kind == "fixed":
                raw = buf.read(typ["size"])
                if len(raw) != typ["size"]:
                    raise ValueError("truncated Avro fixed")
                return raw
            typ = kind
        if typ == "null":
            return None
        if typ in ("string", "bytes"):
            n = _zigzag_decode(buf)
            raw = buf.read(n)
            if len(raw) != n:
                raise ValueError("truncated Avro payload")
            return raw.decode("utf-8") if typ == "string" else raw
        if typ in ("int", "long"):
            return _zigzag_decode(buf)
        if typ == "float":
            return _struct.unpack("<f", buf.read(4))[0]
        if typ == "double":
            return _struct.unpack("<d", buf.read(8))[0]
        if typ == "boolean":
            return buf.read(1) == b"\x01"
        raise ValueError(f"unsupported Avro type {typ!r}")

    def loads(self, data: bytes) -> Any:
        buf = io.BytesIO(data)
        obj = {name: self._read(buf, typ) for name, typ in self.fields}
        if buf.read(1):
            raise ValueError("trailing bytes after Avro record")
        return self.model(**obj) if self.model is not None else obj

    # -- JVM path: available when the spark-avro package is on the
    # classpath (not bundled with stock PySpark); falls back to the
    # python codec above otherwise.
    def decode_col(self, col: Column) -> Column | None:
        try:
            import json as _json

            from pyspark.sql.avro.functions import from_avro

            return from_avro(col, _json.dumps(self.schema))
        except Exception:  # noqa: BLE001 - jar absent
            return None

    def encode_col(self, col: Column) -> Column | None:
        try:
            from pyspark.sql.avro.functions import to_avro

            return to_avro(col)
        except Exception:  # noqa: BLE001
            return None

    def dumps(self, obj: Any) -> bytes:
        if not isinstance(obj, dict):
            dump = getattr(obj, "model_dump", None) or getattr(obj, "dict", None)
            obj = dump() if dump else vars(obj)
        out = bytearray()
        for name, typ in self.fields:
            self._write(out, typ, obj.get(name))
        return bytes(out)


# ---------------------------------------------------------------------
# Protobuf: minimal proto3 wire-format codec driven by a field
# descriptor dict (fallback when neither spark-protobuf jar nor the
# google.protobuf python package is available).
# ---------------------------------------------------------------------


def _uvarint_encode(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _uvarint_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise ValueError("truncated protobuf varint")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc
        shift += 7


class ProtobufSerde(Serde):
    """Proto3 messages (kaflow/serializers.py:112-131).

    ``fields`` maps field number -> (name, type) with type either a
    scalar in {"string","bytes","int64","int32","bool","double",
    "float"} or a nested fields dict of the same shape (a proto3
    message field, encoded length-delimited and parsed recursively;
    nesting depth is unlimited).

    Proto3 default-value semantics: scalar defaults are omitted on
    encode and filled on decode; message fields have presence (absent
    => None), and an empty-dict value still emits the (empty)
    length-delimited field, exactly like upstream proto3.
    """

    _DEFAULTS = {
        "string": "",
        "bytes": b"",
        "int64": 0,
        "int32": 0,
        "bool": False,
        "double": 0.0,
        "float": 0.0,
    }

    def __init__(
        self,
        fields: dict[int, tuple[str, Any]],
        model: type | None = None,
    ) -> None:
        self.fields: dict[int, tuple[str, Any]] = {}
        for num, (name, typ) in fields.items():
            if isinstance(typ, dict):
                typ = ProtobufSerde(typ)  # nested message spec
            elif isinstance(typ, ProtobufSerde):
                pass
            elif typ not in self._DEFAULTS:
                raise ValueError(f"unsupported protobuf type {typ!r} for {name}")
            self.fields[num] = (name, typ)
        self.model = model
        self.target_type = model if model is not None else dict

    def _default(self, typ: Any) -> Any:
        # message fields have presence in proto3: absent means None
        return None if isinstance(typ, ProtobufSerde) else self._DEFAULTS[typ]

    def loads(self, data: bytes) -> Any:
        buf = io.BytesIO(data)
        obj = {name: self._default(typ) for name, typ in self.fields.values()}
        while True:
            start = buf.tell()
            first = buf.read(1)
            if not first:
                break
            buf.seek(start)
            tag = _uvarint_decode(buf)
            num, wire = tag >> 3, tag & 0x7
            spec = self.fields.get(num)
            if wire == 2:  # length-delimited
                n = _uvarint_decode(buf)
                raw = buf.read(n)
                if len(raw) != n:
                    raise ValueError("truncated protobuf field")
                if spec:
                    name, typ = spec
                    if isinstance(typ, ProtobufSerde):
                        obj[name] = typ.loads(raw)
                    else:
                        obj[name] = (
                            raw.decode("utf-8") if typ == "string" else raw
                        )
            elif wire == 0:  # varint
                v = _uvarint_decode(buf)
                if spec:
                    name, typ = spec
                    obj[name] = bool(v) if typ == "bool" else v
            elif wire == 1:  # 64-bit
                raw = buf.read(8)
                if spec:
                    obj[spec[0]] = _struct.unpack("<d", raw)[0]
            elif wire == 5:  # 32-bit
                raw = buf.read(4)
                if spec:
                    obj[spec[0]] = _struct.unpack("<f", raw)[0]
            else:
                raise ValueError(f"unsupported protobuf wire type {wire}")
        return self.model(**obj) if self.model is not None else obj

    def dumps(self, obj: Any) -> bytes:
        if not isinstance(obj, dict):
            dump = getattr(obj, "model_dump", None) or getattr(obj, "dict", None)
            obj = dump() if dump else vars(obj)
        out = bytearray()
        for num in sorted(self.fields):
            name, typ = self.fields[num]
            if isinstance(typ, ProtobufSerde):
                v = obj.get(name)
                if v is None:
                    continue  # message absent
                raw = typ.dumps(v)
                out += _uvarint_encode((num << 3) | 2)
                out += _uvarint_encode(len(raw)) + raw
                continue
            v = obj.get(name, self._DEFAULTS[typ])
            if v == self._DEFAULTS[typ]:
                continue  # proto3: defaults omitted
            if typ in ("string", "bytes"):
                raw = v.encode("utf-8") if typ == "string" else bytes(v)
                out += _uvarint_encode((num << 3) | 2)
                out += _uvarint_encode(len(raw)) + raw
            elif typ in ("int64", "int32", "bool"):
                out += _uvarint_encode(num << 3) + _uvarint_encode(int(v))
            elif typ == "double":
                out += _uvarint_encode((num << 3) | 1) + _struct.pack("<d", v)
            elif typ == "float":
                out += _uvarint_encode((num << 3) | 5) + _struct.pack("<f", v)
        return bytes(out)
