"""Physical-plan introspection helpers.

The 100 TB contract is enforced here: tests assert that filters reach
the parquet scan (PushedFilters), projections prune columns
(ReadSchema), dimension joins broadcast, aggregations are two-phase
(partial+final), and ORDER BY+LIMIT plans as TakeOrderedAndProject.
A query that silently regresses to a full scan or a shuffle join
fails the suite, not just the benchmark.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", txt):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_read_schema(df: DataFrame, table_hint: str = "") -> list[str]:
    """Columns actually read by (the first matching) parquet scan."""
    txt = explain_str(df)
    for m in re.finditer(r"Location:.*?(\S*)\n.*?ReadSchema: struct<([^>]*)>", txt, re.S):
        loc, schema = m.groups()
        if table_hint and table_hint not in loc:
            continue
        return [f.split(":")[0].strip() for f in schema.split(",") if f.strip()]
    # fallback: first ReadSchema anywhere
    m = re.search(r"ReadSchema: struct<([^>]*)>", txt)
    return (
        [f.split(":")[0].strip() for f in m.group(1).split(",") if f.strip()]
        if m
        else []
    )


def has_broadcast_join(df: DataFrame, count: int = 1) -> bool:
    txt = explain_str(df)
    return (
        len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", txt)) >= count
    )


def has_partial_aggregate(df: DataFrame) -> bool:
    """Two-phase hash aggregation (map-side combine before shuffle)."""
    txt = explain_str(df)
    return "partial_" in txt or len(re.findall(r"HashAggregate", txt)) >= 2


def has_top_k(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in explain_str(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the plan (Exchange nodes, excluding broadcast
    exchanges which move only the small side). Formatted mode lists
    each node once as '(n) Exchange' in the details section."""
    txt = explain_str(df)
    return len(re.findall(r"\(\d+\) Exchange\b", txt))
