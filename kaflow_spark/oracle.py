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
    q: DeclaredQuery,
    spark: SparkSession,
    sf_dir: str,
    max_diff_show: int = 5,
    oracle_timeout_s: float | None = None,
) -> CompareResult:
    """Spark-vs-DuckDB compare for one declared query.

    ``oracle_timeout_s`` arms a watchdog thread that interrupts the
    DuckDB side after that many seconds — the O(n^2) brute-force
    oracles (q206/q215-family all-pairs CTEs) are quadratic in the
    corpus and hang for 45+ min at sf0.1; the timeout turns that into
    a reported ``oracle timeout`` result instead of a wedged run
    (used by tools/sf_sweep.py; the Spark side is never interrupted —
    it is the engine under test and scales)."""
    sdf = q.spark(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if q.oracle is None:
        return CompareResult(q.name, True, f"rows-only: {len(s_rows)} rows")

    con = duckdb_connect(sf_dir)
    timer = None
    if oracle_timeout_s:
        import threading

        timer = threading.Timer(oracle_timeout_s, con.interrupt)
        timer.daemon = True
        timer.start()
    try:
        # Driver-canon dtype audit: the driver hashes the PANDAS
        # string form of both frames, so an uncast DuckDB HUGEINT
        # (e.g. SUM over int, or windowed-SUM arithmetic) renders as
        # float64 ("770.0") against Spark's int64 ("770") and
        # hash-mismatches even though the VALUES are equal —
        # fetchall() hides this (HUGEINT -> python int), which is how
        # q117/q150/q153 stayed green here while failing the driver
        # gate. Enforce: any column Spark declares integral must not
        # come back float64 from DuckDB's pandas conversion (NaN-free
        # float64 only — with NULLs both engines degrade to float64
        # identically, so the driver hash agrees and we stay quiet).
        # ONE lazy relation serves both the dtype audit (declared
        # DuckDB types) and the row compare (one fetchall with
        # native-python values) — the O(n^2) brute-force oracles are
        # expensive enough that a second execution doubled test time.
        rel = con.sql(q.oracle)
        d_cols = list(rel.columns)
        d_types = [str(t).upper() for t in rel.types]
        d_rows = rel.fetchall()
    except duckdb.InterruptException:
        return CompareResult(
            q.name,
            False,
            f"oracle timeout: DuckDB interrupted after "
            f"{oracle_timeout_s}s (quadratic-oracle gate candidate)",
        )
    finally:
        if timer is not None:
            timer.cancel()
        con.close()
    integral = {
        f.name
        for f in sdf.schema.fields
        if f.dataType.typeName() in ("byte", "short", "integer", "long")
    }
    # Any DuckDB type that pandas renders as float64 (HUGEINT from
    # SUM-over-int, DOUBLE/FLOAT, and DECIMAL — verified:
    # CAST(770 AS DECIMAL(18,0)) stringifies '770.0' via pandas)
    # against a Spark integral column will stringify "770.0" vs
    # "770" under the driver's hash. With NULLs present both engines
    # degrade to float64 identically, so only NULL-free columns are
    # trapped.
    floaty = ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "DECIMAL")
    for i, c in enumerate(d_cols):
        if (
            c in integral
            and any(d_types[i].startswith(t) for t in floaty)
            and not any(r[i] is None for r in d_rows)
        ):
            return CompareResult(
                q.name,
                False,
                f"driver-canon dtype trap: oracle column {c!r} is "
                f"{d_types[i]} (float64 in pandas) while Spark "
                "declares an integral type — the driver's "
                "stringified hash will mismatch ('1.0' vs '1'). Add "
                "an explicit CAST(... AS BIGINT) in the oracle SQL.",
            )

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
