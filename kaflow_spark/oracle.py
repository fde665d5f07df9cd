"""Local DuckDB-oracle harness mirroring the driver's correctness gate.

Runs a declared query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column-name set, and an
order-insensitive canonical value form. Used by tests/test_oracle.py
to keep every declared query green before the driver ever sees it.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import SparkSession

from kaflow_spark.catalog import TABLES
from kaflow_spark.queries.base import DeclaredQuery


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(v: object) -> str:
    """Canonical string form of one value, engine-agnostic."""
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, _dec.Decimal):
        # strip exponent/trailing-zero representation differences
        return format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare(
    q: DeclaredQuery, spark: SparkSession, sf_dir: str, max_diff_show: int = 5
) -> CompareResult:
    sdf = q.spark(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if q.oracle is None:
        return CompareResult(q.name, True, f"rows-only: {len(s_rows)} rows")

    con = duckdb_connect(sf_dir)
    try:
        res = con.execute(q.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    if sorted(s_cols) != sorted(d_cols):
        return CompareResult(
            q.name, False, f"column mismatch: spark={s_cols} duckdb={d_cols}"
        )
    if len(s_rows) != len(d_rows):
        return CompareResult(
            q.name, False, f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
        )

    # order-insensitive: sort columns by name, then sort canonical rows
    s_ix = [s_cols.index(c) for c in sorted(s_cols)]
    d_ix = [d_cols.index(c) for c in sorted(d_cols)]
    s_canon = sorted(tuple(canon(r[i]) for i in s_ix) for r in s_rows)
    d_canon = sorted(tuple(canon(r[i]) for i in d_ix) for r in d_rows)
    if s_canon != d_canon:
        diffs = [
            f"  spark={s} != duckdb={d}"
            for s, d in zip(s_canon, d_canon)
            if s != d
        ][:max_diff_show]
        return CompareResult(
            q.name, False, "value mismatch:\n" + "\n".join(diffs)
        )
    return CompareResult(q.name, True, f"{len(s_rows)} rows match")
