"""Sketch family: mergeability and error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaflow_spark.catalog import load
from kaflow_spark.functions.sketches import (
    bloom_filter,
    count_min,
    distinct_approx,
    hll_estimate,
    hll_sketch,
    hll_union,
    percentile_approx,
)


def test_hll_sketch_merge_across_groups(spark, sf_dir):
    """Per-group HLL sketches union to the global distinct — the
    mergeable property that lets daily sketches roll up to monthly."""
    o = load(spark, sf_dir, "orders")
    exact = o.select(F.countDistinct("o_custkey").alias("n")).first()["n"]
    per_status = o.groupBy("o_orderstatus").agg(
        hll_sketch("o_custkey").alias("sk")
    )
    merged = per_status.agg(hll_union("sk").alias("u")).select(
        hll_estimate("u").alias("est")
    )
    est = merged.first()["est"]
    assert abs(est - exact) <= max(3, 0.05 * exact)


def test_approx_percentile_close_to_exact(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    exact = o.agg(F.percentile("o_totalprice", F.lit(0.5)).alias("m")).first()["m"]
    approx = o.agg(percentile_approx("o_totalprice", 0.5).alias("m")).first()["m"]
    assert abs(approx - exact) <= 0.05 * exact


def test_count_min_heavy_hitter(spark):
    rows = [("hot",)] * 900 + [("cold",)] * 100
    df = spark.createDataFrame(rows, "k string")
    cms = count_min(df, "k", eps=0.001, confidence=0.99)
    # CMS never undercounts; overcount bounded by eps * total
    assert 900 <= cms.estimateCount("hot") <= 900 + 10
    assert 100 <= cms.estimateCount("cold") <= 100 + 10


def test_bloom_filter_membership(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "k bigint")
    bf = bloom_filter(df, "k", expected=1000, fpp=0.01)
    assert all(bf.mightContain(i) for i in range(0, 1000, 97))  # no false negatives
    misses = sum(bf.mightContain(i) for i in range(10_000, 11_000))
    assert misses <= 50  # fpp with margin


def test_distinct_approx_rsd(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    exact = o.select(F.countDistinct("o_orderkey").alias("n")).first()["n"]
    est = o.select(distinct_approx("o_orderkey", rsd=0.02).alias("n")).first()["n"]
    assert abs(est - exact) <= max(5, 0.06 * exact)
