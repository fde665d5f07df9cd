from kaflow_spark.operators import asof, dedup, multimodal, similarity  # noqa: F401

__all__ = ["asof", "dedup", "multimodal", "similarity"]
