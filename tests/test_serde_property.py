"""Property-based serde round-trips (hypothesis) — the generalization
of the reference's golden-bytes tests."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import given, settings

from kaflow_spark.serde import AvroSerde, JsonSerde, ProtobufSerde, StringSerde

AVRO_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "n", "type": ["null", "long"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
    ],
}

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=80),
)
json_values = st.recursive(
    json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(st.text(max_size=10), inner, max_size=5),
    ),
    max_leaves=20,
)


@settings(max_examples=150, deadline=None)
@given(st.dictionaries(st.text(max_size=10), json_values, max_size=8))
def test_json_roundtrip(obj):
    s = JsonSerde()
    assert s.loads(s.dumps(obj)) == obj


@settings(max_examples=150, deadline=None)
@given(
    st.text(max_size=100),
    st.none() | st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False),
    st.booleans(),
    st.binary(max_size=60),
)
def test_avro_roundtrip(s_, n, d, b, raw):
    serde = AvroSerde(AVRO_SCHEMA)
    obj = {"s": s_, "n": n, "d": d, "b": b, "raw": raw}
    assert serde.loads(serde.dumps(obj)) == obj


@settings(max_examples=150, deadline=None)
@given(
    st.text(max_size=100),
    st.integers(min_value=0, max_value=2**62),
    st.booleans(),
    st.binary(max_size=60),
)
def test_protobuf_roundtrip(s_, n, b, raw):
    serde = ProtobufSerde(
        {1: ("s", "string"), 2: ("n", "int64"), 3: ("b", "bool"), 4: ("raw", "bytes")}
    )
    obj = {"s": s_, "n": n, "b": b, "raw": raw}
    assert serde.loads(serde.dumps(obj)) == obj


@settings(max_examples=100, deadline=None)
@given(st.text())
def test_string_roundtrip(s_):
    serde = StringSerde()
    assert serde.loads(serde.dumps(s_)) == s_
