"""Edge-robustness: empty inputs, single rows, and degenerate text
through the composite operators (no crashes, sane shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaflow_spark.operators.asof import asof_join
from kaflow_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    simhash_near_dups,
)
from kaflow_spark.operators.rangejoin import binned_range_join
from kaflow_spark.operators.similarity import cosine_topk


DOCS_DDL = "doc_id bigint, text string"


def test_empty_document_frame(spark):
    empty = spark.createDataFrame([], DOCS_DDL)
    assert minhash_lsh_candidates(empty, "doc_id", "text").count() == 0
    assert simhash_near_dups(empty, "doc_id", "text").count() == 0
    assert exact_dedup(empty, "text", "doc_id").count() == 0


def test_single_and_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, ""), (3, "a a a a a a a a a a")], DOCS_DDL
    )
    # shorter-than-shingle and empty strings must not error
    pairs = minhash_lsh_candidates(df, "doc_id", "text").collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_asof_empty_right_side(spark):
    left = spark.createDataFrame([(1, 10)], "k bigint, t bigint").select(
        "k", F.timestamp_seconds("t").alias("ts")
    )
    right = spark.createDataFrame([], "k bigint, ts timestamp, px double")
    out = asof_join(left, right, "k", "ts", "ts", ["px"]).collect()
    assert len(out) == 1 and out[0]["px_right"] is None


def test_binned_range_join_empty_and_negative_values(spark):
    left = spark.createDataFrame([(1, -5.0), (2, 5.0)], "id bigint, v double")
    right = spark.createDataFrame(
        [(10, -10.0, 0.0)], "rid bigint, lo double, hi double"
    )
    out = binned_range_join(left, right, "v", "lo", "hi", bin_width=4.0).collect()
    assert [(r["id"], r["rid"]) for r in out] == [(1, 10)]  # -5 in [-10,0]
    empty = spark.createDataFrame([], "rid bigint, lo double, hi double")
    assert binned_range_join(left, empty, "v", "lo", "hi", 4.0).count() == 0


def test_cosine_topk_k_larger_than_corpus(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id bigint, embedding array<double>"
    )
    out = cosine_topk(df, "embedding", "vec_id", [1.0, 0.0], k=10).collect()
    assert len(out) == 2  # k caps at corpus size, no error
