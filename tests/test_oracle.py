"""Every declared query must match the DuckDB oracle at the test SF.

This is a local mirror of the driver's t2 gate (CORRECTNESS_r{N}).
"""

from __future__ import annotations

import pytest

from kaflow_spark.oracle import compare
from kaflow_spark.queries import REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_declared_query_matches_oracle(name, spark, sf_dir):
    res = compare(REGISTRY[name], spark, sf_dir)
    assert res.ok, f"{name}: {res.detail}"
