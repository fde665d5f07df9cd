from kaflow_spark.streaming import dedup, stateful, windows  # noqa: F401

__all__ = ["windows", "dedup", "stateful"]
