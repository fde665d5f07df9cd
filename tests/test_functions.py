"""Engine tests for the function surfaces the oracle can't hash-check:
map functions (the Kafka-headers path), range-frame windows,
approximate distinct counting, and vector math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kaflow_spark.catalog import load
from kaflow_spark.functions.vectors import add, cosine, dot, norm, scale


def test_map_functions_headers_path(spark):
    """map_from_entries + element_at over the Kafka header shape
    (duplicate keys: map_from_entries keeps the LAST duplicate after
    the dedup-last transform, mirroring the reference's dict view)."""
    df = spark.createDataFrame(
        [([("a", b"1"), ("b", b"2"), ("a", b"3")],)],
        "headers array<struct<key: string, value: binary>>",
    )
    # dedup-last then map_from_entries (duplicate keys would error)
    m = df.select(
        F.expr(
            "map_from_entries(transform("
            "  array_distinct(transform(reverse(headers), h -> h.key)),"
            "  k -> struct(k AS key,"
            "              element_at(filter(headers, h -> h.key = k), -1).value AS value)))"
        ).alias("m")
    )
    row = m.first()["m"]
    assert row["a"] == bytearray(b"3") or bytes(row["a"]) == b"3"  # last wins
    assert bytes(row["b"]) == b"2"
    assert set(row.keys()) == {"a", "b"}


def test_range_frame_window(spark, sf_dir):
    """rangeBetween: sum of values within a +-1000 key range."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (1500, 5.0), (2200, 1.0)], "k bigint, v double"
    )
    w = W.orderBy("k").rangeBetween(-1000, 0)
    out = {r["k"]: r["s"] for r in df.select("k", F.sum("v").over(w).alias("s")).collect()}
    assert out[1] == 10.0
    assert out[2] == 30.0  # k=1 within [-998, 2]
    assert out[1500] == 5.0  # range [500, 1500] holds only itself
    assert out[2200] == 6.0  # 1500 and 2200


def test_approx_count_distinct_within_error(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    exact = o.select(F.countDistinct("o_custkey").alias("n")).first()["n"]
    approx = o.select(
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("n")
    ).first()["n"]
    assert abs(approx - exact) <= max(3, 0.1 * exact)


def test_vector_math(spark):
    df = spark.createDataFrame(
        [([3.0, 4.0], [1.0, 0.0])], "a array<double>, b array<double>"
    )
    r = df.select(
        dot("a", "b").alias("d"),
        norm("a").alias("n"),
        cosine("a", "b").alias("c"),
        add("a", "b").alias("s"),
        scale("a", F.lit(2.0)).alias("x2"),
    ).first()
    assert r["d"] == 3.0
    assert r["n"] == 5.0
    assert abs(r["c"] - 0.6) < 1e-12
    assert r["s"] == [4.0, 4.0]
    assert r["x2"] == [6.0, 8.0]


def test_readability_grade_hand_example(spark):
    """'The cat sat. It ran far.' — 6 words, 2 sentences, 6 vowel
    groups: grade_milli = 390*(6//2) + 11800*(6//6) - 15590 = -2620
    (grade x1000 ≈ -2.62, i.e. trivially easy text — matches the
    float FK formula's 0.39*3 + 11.8*1 - 15.59 = -2.62)."""
    from pyspark.sql import functions as F
    from kaflow_spark.functions.textstats import readability_grade_milli

    df = spark.createDataFrame(
        [("The cat sat. It ran far.",), ("",)], "text string"
    )
    out = [r["g"] for r in df.select(readability_grade_milli("text").alias("g")).collect()]
    assert out[0] == 390 * 3 + 11800 * 1 - 15590
    assert out[0] == -2620
    # empty text: words=sentences=1 (floors), syllables=0
    assert out[1] == 390 * 1 + 11800 * 0 - 15590
