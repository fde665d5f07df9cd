"""k-anonymity audit + generalization ladder (q176/q177) hand cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaflow_spark.operators.curation import (
    anonymity_generalization,
    k_anonymity_cells,
)


def _pop(spark):
    # nation A / seg X: 12 people in band 0 (safe), 2 in band 1 (risky
    # at full grain, safe once band dropped: 14 >= 10 -> level 1)
    rows = [("A", "X", 0, 100 + i) for i in range(12)]
    rows += [("A", "X", 1, 200 + i) for i in range(2)]
    # nation A / seg Y: 3 people -> seg-level 15 >= 10 -> level 2
    rows += [("A", "Y", 0, 300 + i) for i in range(3)]
    # nation B: 4 people total -> nothing reaches 10 -> level 3
    rows += [("B", "X", 0, 400 + i) for i in range(4)]
    return spark.createDataFrame(
        rows, "nation string, seg string, band int, bal bigint"
    )


def test_k_anonymity_flags_small_cells_with_l_diversity(spark):
    cells = k_anonymity_cells(
        _pop(spark), ["nation", "seg", "band"], "bal", k=10
    ).collect()
    got = {(r["nation"], r["seg"], r["band"]): (r["n_people"], r["l_distinct"])
           for r in cells}
    assert got == {
        ("A", "X", 1): (2, 2),
        ("A", "Y", 0): (3, 3),
        ("B", "X", 0): (4, 4),
    }


def test_k_anonymity_l_diversity_counts_distinct_only(spark):
    df = spark.createDataFrame(
        [("A", "X", 0, 7)] * 5, "nation string, seg string, band int, bal bigint"
    )
    [cell] = k_anonymity_cells(df, ["nation", "seg", "band"], "bal", k=10).collect()
    assert cell["n_people"] == 5 and cell["l_distinct"] == 1  # leaks bal


def test_generalization_ladder_levels(spark):
    out = anonymity_generalization(
        _pop(spark), ["nation", "seg", "band"], k=10
    ).collect()
    lvl = {(r["nation"], r["seg"], r["band"]): r["anon_level"] for r in out}
    assert lvl == {
        ("A", "X", 0): 0,  # 12 at full grain
        ("A", "X", 1): 1,  # 14 once band dropped
        ("A", "Y", 0): 2,  # 17 once seg dropped
        ("B", "X", 0): 3,  # nation B never reaches 10
    }


def test_generalization_level_len_means_population_only(spark):
    # tiny population: even the whole dataset < k -> max level
    df = spark.createDataFrame(
        [("A", "X", 0, 1), ("B", "Y", 1, 2)],
        "nation string, seg string, band int, bal bigint",
    )
    out = anonymity_generalization(df, ["nation", "seg", "band"], k=10).collect()
    assert all(r["anon_level"] == 3 for r in out)
