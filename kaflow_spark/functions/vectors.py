"""Vector math over ``array<float|double>`` columns — pure JVM-side
higher-order functions (``aggregate``/``zip_with``), no UDFs: the hot
path stays inside whole-stage codegen and scales linearly with rows ×
dims on executors.

Evaluation order is deterministic (left-to-right fold), which is what
makes cosine scores oracle-comparable against DuckDB's list functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left-to-right aggregate (double)."""
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision."""
    return dot(a, b) / (norm(a) * norm(b))


def scale(a: Column | str, s: Column) -> Column:
    return F.transform(_c(a), lambda v: v.cast("double") * s)


def add(a: Column | str, b: Column | str) -> Column:
    return F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") + y.cast("double"))


def hyperplane_sign_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one bit per plane (sign of the
    dot product), packed into a BIGINT bucket id. ``planes`` is a
    driver-side list of unit vectors (deterministic seed upstream);
    they serialize into the plan as literals — no shuffle, no UDF."""
    bits = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = (dot(_c(a), arr) >= 0).cast("bigint")
        bits = bits + F.shiftleft(bit, i)
    return bits
