"""Serializer round-trips with the reference's golden bytes
(/root/reference/tests/test_serializers.py:23-88 — fixtures in
FIXTURES.md A3). These run without Spark: the python codec level is
the same code the Arrow-batched handler stage executes."""

from __future__ import annotations

import pytest
from pydantic import BaseModel

from kaflow_spark.serde import (
    AvroSerde,
    BytesSerde,
    JsonSerde,
    ProtobufSerde,
    StringSerde,
)

AVRO_SCHEMA = {
    "type": "record",
    "name": "test",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "value", "type": "string"},
    ],
}

GOLDEN_AVRO = b"\x1aunit_test_key\x1eunit_test_value"
GOLDEN_PROTO = b"\n\runit_test_key\x12\x0funit_test_value"
GOLDEN_JSON = b'{"key": "value"}'


class KV(BaseModel):
    key: str
    value: str


def test_json_golden_roundtrip():
    s = JsonSerde()
    assert s.loads(GOLDEN_JSON) == {"key": "value"}
    assert s.loads(s.dumps({"key": "value"})) == {"key": "value"}


def test_json_model_validation():
    s = JsonSerde(model=KV)
    obj = s.loads(b'{"key": "k", "value": "v"}')
    assert isinstance(obj, KV) and obj.key == "k"
    with pytest.raises(Exception):
        s.loads(b'{"key": "k"}')  # missing required field


def test_avro_golden_bytes():
    s = AvroSerde(AVRO_SCHEMA)
    assert s.dumps({"key": "unit_test_key", "value": "unit_test_value"}) == GOLDEN_AVRO
    assert s.loads(GOLDEN_AVRO) == {
        "key": "unit_test_key",
        "value": "unit_test_value",
    }


def test_avro_nullable_and_numeric_roundtrip():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "n", "type": ["null", "long"]},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
        ],
    }
    s = AvroSerde(schema)
    for obj in ({"n": None, "d": 1.5, "b": True}, {"n": -7, "d": 0.0, "b": False}):
        assert s.loads(s.dumps(obj)) == obj


def test_protobuf_golden_bytes():
    s = ProtobufSerde({1: ("key", "string"), 2: ("value", "string")})
    assert (
        s.dumps({"key": "unit_test_key", "value": "unit_test_value"}) == GOLDEN_PROTO
    )
    assert s.loads(GOLDEN_PROTO) == {
        "key": "unit_test_key",
        "value": "unit_test_value",
    }


def test_protobuf_proto3_defaults():
    s = ProtobufSerde({1: ("key", "string"), 2: ("n", "int64")})
    assert s.dumps({"key": "", "n": 0}) == b""  # defaults omitted
    assert s.loads(b"") == {"key": "", "n": 0}  # and filled on decode


def test_string_bytes_serdes():
    assert StringSerde().loads(b"abc") == "abc"
    assert StringSerde().dumps("abc") == b"abc"
    assert BytesSerde().loads(b"\x00\x01") == b"\x00\x01"
    with pytest.raises(TypeError):
        BytesSerde().dumps("not bytes")


def test_malformed_payloads_raise():
    with pytest.raises(Exception):
        JsonSerde().loads(b'{"key": ')  # truncated JSON (FIXTURES A4)
    with pytest.raises(Exception):
        AvroSerde(AVRO_SCHEMA).loads(b"\xff")  # truncated varint/string
