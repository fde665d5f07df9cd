"""Skew-mitigation utilities.

AQE's skew-join splitting handles most cases automatically (enabled in
the session posture); these helpers cover the two patterns AQE can't:

- ``salted_aggregate``: high-cardinality-skewed GROUP BY (one hot key
  overwhelms a reducer). Two-phase: group on (key, salt) first — the
  hot key fans out over ``salt`` reducers — then merge partials.
  Works for any algebraic aggregate (sum/count/min/max).
- ``salted_join``: skewed fact-to-dim equi-join where the dim is too
  big to broadcast: replicate each dim row ``salt`` times, salt the
  fact side randomly, join on (key, salt) — the hot key's rows spread
  over ``salt`` partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output_name -> (function, column) with function in
    {count, sum, min, max}. Example::

        salted_aggregate(df, ["user_id"], {"n": ("count", "*"),
                                           "total": ("sum", "value")})
    """
    first_phase = []
    merge_phase = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            first_phase.append(F.count(F.lit(1)).alias(f"_p_{name}"))
            merge_phase.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "sum":
            first_phase.append(F.sum(col).alias(f"_p_{name}"))
            merge_phase.append(F.sum(f"_p_{name}").alias(name))
        elif fn == "min":
            first_phase.append(F.min(col).alias(f"_p_{name}"))
            merge_phase.append(F.min(f"_p_{name}").alias(name))
        elif fn == "max":
            first_phase.append(F.max(col).alias(f"_p_{name}"))
            merge_phase.append(F.max(f"_p_{name}").alias(name))
        else:
            raise ValueError(f"unsupported salted aggregate fn {fn!r}")
    salted = df.withColumn("_salt", (F.rand(seed=0) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(*first_phase)
    return partial.groupBy(*keys).agg(*merge_phase)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: dim replicated ``salt``×, fact salted
    randomly, join key becomes (key, salt)."""
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    fact_salted = fact.withColumn("_salt", (F.rand(seed=0) * salt).cast("int"))
    out = fact_salted.join(dim_rep, [on, "_salt"], how)
    return out.drop("_salt")


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Skew diagnosis: the heaviest keys and their share — run this
    before deciding between AQE, salting, or broadcast."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(float(total)))
        .orderBy(F.desc("n"))
        .limit(top)
    )
