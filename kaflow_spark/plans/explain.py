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


def scan_partition_metrics(df: DataFrame) -> list[dict[str, int]]:
    """Post-execution scan metrics: one dict per file-scan leaf with
    whatever of ``numPartitions`` / ``numFiles`` / ``numOutputRows``
    the scan reports. Call AFTER an action — SQL metrics are filled in
    at runtime, which is precisely what makes this the right probe for
    DYNAMIC partition pruning (the static plan only shows the
    ``dynamicpruningexpression`` placeholder; how many partitions
    survived pruning is a runtime fact)."""
    ep = df._jdf.queryExecution().executedPlan()  # noqa: SLF001
    out: list[dict[str, int]] = []
    for node in _physical_nodes(ep):
        if "Scan" not in node.nodeName():
            continue
        mets = node.metrics()
        row: dict[str, int] = {}
        for key in ("numPartitions", "numFiles", "numOutputRows"):
            if mets.contains(key):
                row[key] = mets.apply(key).value()
        out.append(row)
    return out


def _physical_nodes(node):
    """Walk a physical plan yielding REAL operator nodes, unwrapping
    the adaptive-execution containers: AdaptiveSparkPlanExec holds the
    current plan behind ``executedPlan()``, and each materialized stage
    (Shuffle/Broadcast/ResultQueryStage) hides its subtree behind
    ``plan()`` — a naive ``collectLeaves()`` sees only the wrappers
    (the runtime cousin of CLAUDE.md trap 9)."""
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        yield from _physical_nodes(node.executedPlan())
        return
    if "QueryStage" in name:
        yield from _physical_nodes(node.plan())
        return
    yield node
    children = node.children()
    for i in range(children.length()):
        yield from _physical_nodes(children.apply(i))


def count_exchanges(df: DataFrame) -> int:
    """Shuffle count in the plan (Exchange nodes, excluding broadcast
    exchanges which move only the small side). Formatted mode lists
    each node once as '(n) Exchange' in the details section."""
    txt = explain_str(df)
    return len(re.findall(r"\(\d+\) Exchange\b", txt))
