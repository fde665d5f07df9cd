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


def test_q189_decimal_chi2_term_survives_int64_overflow(spark):
    """Round 9 (advice): the chi-square term computes in
    DECIMAL(38,0) unconditionally — counts where o*n / r*c / n*r*c
    overflow int64 (n*min(r,c) > ~3e9) must still produce the exact
    Python-int answer instead of an ANSI overflow error."""
    from pyspark.sql import functions as F

    o, r, c, n = 4_000_000_000, 6_000_000_000, 5_000_000_000, 8_000_000_000
    assert o * n > 2**63  # int64 genuinely overflows here
    dec = "decimal(38,0)"
    df = (
        spark.createDataFrame([(o, r, c, n)], "o long, r long, c long, n long")
        .withColumn(
            "d",
            F.col("o").cast(dec) * F.col("n")
            - F.col("r").cast(dec) * F.col("c"),
        )
        .withColumn("nrc", F.col("n").cast(dec) * F.col("r") * F.col("c"))
        .select(
            F.expr(
                f"CAST(CAST(r AS {dec}) * c * 1000000 div n AS BIGINT)"
            ).alias("expected_micro"),
            F.expr(
                "CAST((d * d div nrc) * 1000000"
                " + ((d * d % nrc) * 1000000) div nrc AS BIGINT)"
            ).alias("chi2_term_micro"),
        )
    )
    row = df.head()
    d = o * n - r * c
    nrc = n * r * c
    assert row.expected_micro == r * c * 1000000 // n
    assert (
        row.chi2_term_micro
        == (d * d // nrc) * 1000000 + ((d * d % nrc) * 1000000) // nrc
    )
