from __future__ import annotations

import datetime as dt

import pytest
from pydantic import BaseModel

from kaflow_spark.serde.pydantic_schema import model_to_struct


class Inner(BaseModel):
    a: int
    b: str | None


class Outer(BaseModel):
    uid: int
    name: str
    score: float
    ok: bool
    raw: bytes
    when: dt.datetime
    tags: list[str]
    attrs: dict[str, int]
    inner: Inner
    maybe: int | None = None


def test_model_to_struct_shape():
    st = model_to_struct(Outer)
    ddl = st.simpleString()
    assert "uid:bigint" in ddl
    assert "score:double" in ddl
    assert "raw:binary" in ddl
    assert "when:timestamp" in ddl
    assert "tags:array<string>" in ddl
    assert "attrs:map<string,bigint>" in ddl
    assert "inner:struct<a:bigint,b:string>" in ddl
    assert st["maybe"].nullable  # Optional w/ default => nullable


def test_underivable_raises():
    class Bad(BaseModel):
        x: complex

    with pytest.raises(TypeError):
        model_to_struct(Bad)
