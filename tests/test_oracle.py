"""Every declared query must match the DuckDB oracle at the test SF.

This is a local mirror of the driver's t2 gate (CORRECTNESS_r{N}).
"""

from __future__ import annotations

import os

import pytest

from kaflow_spark.oracle import compare
from kaflow_spark.queries import REGISTRY

# Oracles tagged "quadratic-oracle" are deliberate O(n^2) all-pairs
# CTEs (brute-force ground truth for the bucketed dedup operators);
# they are quadratic in the documents table and infeasible at sf0.1
# (5,000 docs x long texts: q206's oracle measured 45+ min, q137's
# exceeded a 300 s watchdog — the cost driver is pairs x per-pair
# list ops, and sf0.1 has 100x the pairs of sf0.01's 500 docs).
# They stay hash-checked at sf0.001/sf0.01 (500 docs, the driver
# gate SF); above this row bound the test SKIPS programmatically
# instead of relying on nobody running `-k q206` at the bench SF.
QUADRATIC_ORACLE_MAX_DOCS = 1_000


def _documents_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")
    ).metadata.num_rows


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_declared_query_matches_oracle(name, spark, sf_dir):
    q = REGISTRY[name]
    if (
        "quadratic-oracle" in q.tags
        and _documents_rows(sf_dir) > QUADRATIC_ORACLE_MAX_DOCS
    ):
        pytest.skip(
            f"{name}: O(n^2) brute-force oracle gated above "
            f"{QUADRATIC_ORACLE_MAX_DOCS} documents "
            "(hash-attested at sf0.001/sf0.01)"
        )
    res = compare(q, spark, sf_dir)
    assert res.ok, f"{name}: {res.detail}"
