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
minimal pure-Python binary codec covering flat record schemas —
enough for the reference's golden-bytes fixtures
(/root/reference/tests/test_serializers.py:33-88). The fallback is
Arrow-batched, never per-row JVM round-trips.
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


class AvroSerde(Serde):
    """Schemaless Avro binary records (kaflow/serializers.py:76-108).

    ``schema`` is a standard Avro record schema dict. Supports the
    primitive field types string/bytes/int/long/float/double/boolean/
    null and nullable unions like ["null", "string"].
    """

    _SUPPORTED = {"string", "bytes", "int", "long", "float", "double", "boolean", "null"}

    def __init__(self, schema: dict[str, Any], model: type | None = None) -> None:
        if schema.get("type") != "record":
            raise ValueError("AvroSerde supports record schemas")
        self.schema = schema
        self.model = model
        self.target_type = model if model is not None else dict
        self.fields: list[tuple[str, Any]] = [
            (f["name"], f["type"]) for f in schema["fields"]
        ]
        for _, t in self.fields:
            base = set(t) - {"null"} if isinstance(t, list) else {t}
            if not base <= self._SUPPORTED:
                raise ValueError(f"unsupported Avro field type {t!r}")

    def _write(self, out: bytearray, typ: Any, v: Any) -> None:
        if isinstance(typ, list):  # nullable union: branch index first
            branch = 0 if v is None else next(
                i for i, t in enumerate(typ) if t != "null"
            )
            out += _zigzag_encode(branch)
            typ = typ[branch]
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

    def _read(self, buf: io.BytesIO, typ: Any) -> Any:
        if isinstance(typ, list):
            typ = typ[_zigzag_decode(buf)]
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

    ``fields`` maps field number -> (name, type) with type in
    {"string","bytes","int64","int32","bool","double","float"}.
    Proto3 default-value semantics: defaults are omitted on encode and
    filled on decode.
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
        self, fields: dict[int, tuple[str, str]], model: type | None = None
    ) -> None:
        for num, (name, typ) in fields.items():
            if typ not in self._DEFAULTS:
                raise ValueError(f"unsupported protobuf type {typ!r} for {name}")
        self.fields = fields
        self.model = model
        self.target_type = model if model is not None else dict

    def loads(self, data: bytes) -> Any:
        buf = io.BytesIO(data)
        obj = {name: self._DEFAULTS[typ] for name, typ in self.fields.values()}
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
                    obj[name] = raw.decode("utf-8") if typ == "string" else raw
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
