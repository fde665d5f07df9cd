"""The numpy (Arrow) and pure-expression signature paths must be
bit-identical — signatures may be persisted, so the two execution
strategies cannot drift."""

from __future__ import annotations

from kaflow_spark.operators.dedup import (
    minhash_signature,
    minhash_signature_expr,
    simhash,
    simhash_expr,
)


def test_minhash_paths_identical(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a completely different document body"),
         (3, "xy")],  # shorter than the shingle width
        "id bigint, text string",
    )
    a = df.select(minhash_signature("text").alias("s")).collect()
    b = df.select(minhash_signature_expr("text").alias("s")).collect()
    assert [r["s"] for r in a] == [r["s"] for r in b]


def test_fingerprint_paths_identical(spark):
    from kaflow_spark.functions.textstats import fingerprint, fingerprint_expr

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "short"),
         (3, "exactly8")],
        "id bigint, text string",
    )
    a = [r["fp"] for r in df.select(fingerprint("text").alias("fp")).collect()]
    b = [r["fp"] for r in df.select(fingerprint_expr("text").alias("fp")).collect()]
    assert a == b


def test_simhash_paths_identical(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a completely different document body"),
         (3, "xy")],
        "id bigint, text string",
    )
    a = df.select(simhash("text").alias("s")).collect()
    b = df.select(simhash_expr("text").alias("s")).collect()
    assert [r["s"] for r in a] == [r["s"] for r in b]
