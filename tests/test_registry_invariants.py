"""Governance invariants over the declared-query registry: the
correctness contract can only weaken by explicit declaration."""

from __future__ import annotations

from kaflow_spark.queries import REGISTRY


def test_registry_size_floor():
    # the inventory only grows; shrinking it means queries were lost
    assert len(REGISTRY) >= 64


def test_every_exact_query_has_an_oracle():
    """Only 'approx'-tagged queries may skip the DuckDB oracle (the
    driver then records a weaker rows-only check)."""
    missing = [
        name
        for name, q in REGISTRY.items()
        if q.oracle is None and "approx" not in q.tags
    ]
    assert missing == []


def test_names_and_docs():
    for name, q in REGISTRY.items():
        assert q.doc, f"{name} needs a doc line (judge-facing)"
        assert name[0] == "q" and name[1:3].isdigit(), name
