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


NESTED_AVRO_SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {
            "name": "meta",
            "type": {
                "type": "record",
                "name": "Meta",
                "fields": [
                    {"name": "lang", "type": "string"},
                    {
                        "name": "quality",
                        "type": {
                            "type": "enum",
                            "name": "Q",
                            "symbols": ["LOW", "MED", "HIGH"],
                        },
                    },
                ],
            },
        },
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "scores", "type": {"type": "map", "values": "long"}},
        {"name": "parent", "type": ["null", "Meta"]},
        {"name": "digest", "type": {"type": "fixed", "name": "D4", "size": 4}},
    ],
}


def test_avro_nested_golden_bytes():
    """Hand-computed Avro binary spec bytes: nested record fields are
    inlined in order; arrays/maps are block-encoded (count, items,
    zero terminator); enum is the zigzag symbol index; a named-type
    union branch references the earlier record definition."""
    s = AvroSerde(NESTED_AVRO_SCHEMA)
    obj = {
        "id": 3,
        "meta": {"lang": "en", "quality": "HIGH"},
        "tags": ["a", "bc"],
        "scores": {"k": 1},
        "parent": None,
        "digest": b"\x01\x02\x03\x04",
    }
    expect = (
        b"\x06"  # id: zigzag(3)
        b"\x04en\x04"  # meta.lang ("en"), meta.quality enum idx 2
        b"\x04\x02a\x04bc\x00"  # tags: block of 2, "a", "bc", end
        b"\x02\x02k\x02\x00"  # scores: block of 1, "k"->1, end
        b"\x00"  # parent: union branch 0 (null)
        b"\x01\x02\x03\x04"  # digest: fixed(4) raw
    )
    assert s.dumps(obj) == expect
    assert s.loads(expect) == obj


def test_avro_nested_union_branch_roundtrip():
    s = AvroSerde(NESTED_AVRO_SCHEMA)
    obj = {
        "id": -1,
        "meta": {"lang": "fr", "quality": "LOW"},
        "tags": [],
        "scores": {},
        "parent": {"lang": "de", "quality": "MED"},
        "digest": b"\xff\xff\xff\xff",
    }
    assert s.loads(s.dumps(obj)) == obj


def test_avro_negative_block_count_decodes():
    """Spec: a negative array block count means |count| items preceded
    by a byte-size long (writers may emit it for skippability)."""
    schema = {
        "type": "record",
        "name": "t",
        "fields": [{"name": "xs", "type": {"type": "array", "items": "long"}}],
    }
    s = AvroSerde(schema)
    # zigzag(-2)=0x03, zigzag(2 bytes)=0x04, items 1,2 -> 0x02 0x04, end 0x00
    assert s.loads(b"\x03\x04\x02\x04\x00") == {"xs": [1, 2]}


def test_avro_unsupported_schema_rejected_eagerly():
    with pytest.raises(ValueError):
        AvroSerde(
            {
                "type": "record",
                "name": "t",
                "fields": [{"name": "x", "type": "decimal"}],
            }
        )


def test_protobuf_nested_message_golden_bytes():
    """Nested proto3 message: wire type 2, recursively encoded; message
    fields have presence (absent => None), empty dict still emits the
    empty length-delimited field."""
    s = ProtobufSerde(
        {
            1: ("id", "int64"),
            2: ("meta", {1: ("lang", "string"), 2: ("score", "int64")}),
        }
    )
    obj = {"id": 5, "meta": {"lang": "en", "score": 9}}
    # field1 varint 5; field2 len-delim: [field1 "en"] [field2 9]
    expect = b"\x08\x05\x12\x06\n\x02en\x10\x09"
    assert s.dumps(obj) == expect
    assert s.loads(expect) == obj
    assert s.loads(b"\x08\x05") == {"id": 5, "meta": None}  # presence
    assert s.dumps({"id": 0, "meta": {}}) == b"\x12\x00"
    # two levels deep
    deep = ProtobufSerde({1: ("a", {1: ("b", {1: ("c", "string")})})})
    assert deep.loads(deep.dumps({"a": {"b": {"c": "x"}}})) == {
        "a": {"b": {"c": "x"}}
    }
