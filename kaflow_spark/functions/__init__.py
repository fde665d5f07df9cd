from kaflow_spark.functions import textstats, vectors  # noqa: F401

__all__ = ["vectors", "textstats"]
