"""Declared-query registry aggregation.

Importing this package materializes every declared query into
``REGISTRY`` (name -> DeclaredQuery). ``__spark_entry__`` and the
tests consume it.
"""

from kaflow_spark.queries import audits as _audits  # noqa: F401
from kaflow_spark.queries import base as _base
from kaflow_spark.queries import cohorts as _cohorts  # noqa: F401
from kaflow_spark.queries import curation as _curation  # noqa: F401
from kaflow_spark.queries import distributions as _distributions  # noqa: F401
from kaflow_spark.queries import extended as _extended  # noqa: F401
from kaflow_spark.queries import growth as _growth  # noqa: F401
from kaflow_spark.queries import llm as _llm  # noqa: F401
from kaflow_spark.queries import pipeline as _pipeline  # noqa: F401
from kaflow_spark.queries import relational as _relational  # noqa: F401
from kaflow_spark.queries import risk as _risk  # noqa: F401
from kaflow_spark.queries import robust as _robust  # noqa: F401
from kaflow_spark.queries import semantic as _semantic  # noqa: F401
from kaflow_spark.queries import sequences as _sequences  # noqa: F401
from kaflow_spark.queries import tpch as _tpch  # noqa: F401

REGISTRY = _base.REGISTRY
DeclaredQuery = _base.DeclaredQuery

__all__ = ["REGISTRY", "DeclaredQuery"]
