from kaflow_spark.plans.explain import (
    explain_str,
    has_broadcast_join,
    has_partial_aggregate,
    has_top_k,
    pushed_filters,
    scan_partition_metrics,
    scan_read_schema,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "scan_partition_metrics",
    "scan_read_schema",
    "has_broadcast_join",
    "has_partial_aggregate",
    "has_top_k",
]
