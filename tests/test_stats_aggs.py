"""Statistical aggregates (stddev/variance/corr/covar) — double sums
are shuffle-order-dependent, so these stay engine-tested against the
DuckDB values within float tolerance instead of hash-declared."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from kaflow_spark.catalog import load


def test_stats_aggs_match_duckdb_within_tolerance(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    row = o.agg(
        F.stddev_samp("o_totalprice").alias("sd"),
        F.var_samp("o_totalprice").alias("var"),
        F.corr("o_totalprice", "o_custkey").alias("corr"),
        F.covar_samp("o_totalprice", "o_custkey").alias("covar"),
        F.skewness("o_totalprice").alias("skew"),
        F.kurtosis("o_totalprice").alias("kurt"),
    ).first()
    d = duckdb.sql(
        f"""
        SELECT stddev_samp(o_totalprice), var_samp(o_totalprice),
               corr(o_totalprice, o_custkey), covar_samp(o_totalprice, o_custkey),
               skewness(o_totalprice), kurtosis(o_totalprice)
        FROM '{sf_dir}/orders.parquet'
        """
    ).fetchone()
    # (absolute tol, relative tol): moment stats near zero suffer
    # catastrophic cancellation that differs with summation order, so
    # corr/skew/kurt get absolute bounds
    for got, want, abs_tol, rel_tol in [
        (row["sd"], d[0], 1e-6, 1e-9),
        (row["var"], d[1], 1e-2, 1e-9),
        (row["corr"], d[2], 1e-3, 0.0),
        (row["covar"], d[3], 100.0, 1e-6),
        (row["skew"], d[4], 1e-3, 0.0),
        (row["kurt"], d[5], 5e-2, 0.0),
    ]:
        assert abs(got - want) <= max(abs_tol, rel_tol * abs(want)), (got, want)
