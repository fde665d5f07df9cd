"""pydantic model -> Spark StructType compiler.

The reference declares per-handler schemas as pydantic models in the
function signature (kaflow/parameters.py:131-157); the Spark engine
derives a ``StructType`` from the same model so the JVM fast path
(``from_json``) can decode without any Python involvement.

Registration fails loudly on underivable annotations, mirroring the
reference's parameter errors (kaflow/parameters.py:51-56).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import types as _types
import typing as _t

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_PRIMITIVES: dict[type, DataType] = {
    str: StringType(),
    int: LongType(),
    float: DoubleType(),
    bool: BooleanType(),
    bytes: BinaryType(),
    _dt.datetime: TimestampType(),
    _dt.date: DateType(),
    _dec.Decimal: DecimalType(38, 18),
}


def _is_model(tp: object) -> bool:
    return isinstance(tp, type) and hasattr(tp, "model_fields")


def annotation_to_datatype(tp: object) -> tuple[DataType, bool]:
    """Map a python annotation to (DataType, nullable)."""
    origin = _t.get_origin(tp)
    if origin in (_t.Union, _types.UnionType):
        args = [a for a in _t.get_args(tp) if a is not type(None)]
        nullable = len(args) != len(_t.get_args(tp))
        if len(args) != 1:
            raise TypeError(f"cannot derive Spark type for union {tp!r}")
        dt, _ = annotation_to_datatype(args[0])
        return dt, nullable
    if origin in (list, tuple, set, frozenset):
        (elem,) = _t.get_args(tp) or (str,)
        edt, enull = annotation_to_datatype(elem)
        return ArrayType(edt, containsNull=enull), False
    if origin is dict:
        kt, vt = _t.get_args(tp) or (str, str)
        kdt, _ = annotation_to_datatype(kt)
        vdt, vnull = annotation_to_datatype(vt)
        return MapType(kdt, vdt, valueContainsNull=vnull), False
    if _is_model(tp):
        return model_to_struct(tp), False
    if isinstance(tp, type) and tp in _PRIMITIVES:
        return _PRIMITIVES[tp], False
    raise TypeError(f"cannot derive Spark type for annotation {tp!r}")


def model_to_struct(model: type) -> StructType:
    """pydantic (v2) BaseModel -> StructType."""
    if not _is_model(model):
        raise TypeError(f"{model!r} is not a pydantic model")
    fields = []
    for name, finfo in model.model_fields.items():
        dt, nullable = annotation_to_datatype(finfo.annotation)
        if not finfo.is_required():
            nullable = True
        fields.append(StructField(name, dt, nullable=nullable))
    return StructType(fields)
