"""Engine tests for the DSIR family (q174/q175) — appended to
tests/test_round6_ops.py-style coverage as its own file."""

from __future__ import annotations

from pyspark.sql import functions as F

from kaflow_spark.operators.curation import (
    dsir_importance,
    feature_bucket,
    score_separation_auc,
)


def test_feature_bucket_matches_duckdb(spark):
    import duckdb

    vals = ["alpha beta", "gamma", "x", ""]
    sdf = spark.createDataFrame([(v,) for v in vals], "s string").select(
        "s", feature_bucket(F.col("s"), 4096).alias("b")
    )
    got = {r["s"]: r["b"] for r in sdf.collect()}
    con = duckdb.connect()
    for v in vals:
        (want,) = con.execute(
            "SELECT CAST('0x' || substring(md5(?), 1, 8) AS BIGINT) % 4096", [v]
        ).fetchone()
        assert got[v] == want, v


def test_dsir_planted_distribution_shift(spark):
    # target docs speak "aa bb", raw docs speak "cc dd"; a held-out
    # target-like doc must score positive, a raw-like doc negative
    rows = [(i, "aa bb " * 20, True) for i in range(10)]
    rows += [(100 + i, "cc dd " * 20, False) for i in range(10)]
    rows += [(900, "aa bb " * 20, False), (901, "cc dd " * 20, True)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, tgt boolean")
    w = {
        r["doc_id"]: r["dsir_milli"]
        for r in dsir_importance(df, "doc_id", "text", F.col("tgt")).collect()
    }
    assert w[900] > 0  # target-like content scores toward target...
    assert w[901] < 0  # ...regardless of which side the doc sat on
    assert w[0] > 0 and w[100] < 0


def test_dsir_weight_is_label_free(spark):
    # the score is a function of CONTENT given the two distributions:
    # identical text on opposite sides scores identically (doc 0 vs
    # 900, 100 vs 901 in the planted fixture)
    rows = [(i, "aa bb " * 20, True) for i in range(10)]
    rows += [(100 + i, "cc dd " * 20, False) for i in range(10)]
    rows += [(900, "aa bb " * 20, False), (901, "cc dd " * 20, True)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, tgt boolean")
    w = {
        r["doc_id"]: r["dsir_bits"]
        for r in dsir_importance(df, "doc_id", "text", F.col("tgt")).collect()
    }
    assert w[900] == w[0]
    assert w[901] == w[100]


def test_auc_perfect_and_null_separation(spark):
    perfect = spark.createDataFrame(
        [(10, True), (11, True), (1, False), (2, False)], "s bigint, f boolean"
    )
    [row] = score_separation_auc(perfect, "s", "f").collect()
    assert (row["n_flagged"], row["n_rest"], row["auc_bp"]) == (2, 2, 10000)

    coin = spark.createDataFrame(
        [(5, True), (5, False), (5, True), (5, False)], "s bigint, f boolean"
    )
    [row] = score_separation_auc(coin, "s", "f").collect()
    assert row["auc_bp"] == 5000  # all ties -> midrank 0.5


def test_auc_matches_pairwise_definition(spark):
    import itertools
    import random

    rng = random.Random(7)
    rows = [(rng.randint(-5, 5), rng.random() < 0.4) for _ in range(60)]
    df = spark.createDataFrame(rows, "s bigint, f boolean")
    t = [s for s, f in rows if f]
    r = [s for s, f in rows if not f]
    num = sum(
        2 if a > b else (1 if a == b else 0)
        for a, b in itertools.product(t, r)
    )
    want = num * 10000 // (2 * len(t) * len(r))
    [row] = score_separation_auc(df, "s", "f").collect()
    assert row["auc_bp"] == want


def test_q174_single_scan_diamond_reuse(spark, sf_dir):
    """Plan contract: the gram pipeline (scan+tokenize+explode+md5) is
    shared between the per-doc branch and the bucket-distribution
    branch through ONE exchange — coalesce null-safe join + window
    totals keep the subtrees canonical (q100/q136 idiom). Asserted on
    the static planner (AQE reuses at stage level without showing it)."""
    from kaflow_spark.queries import REGISTRY

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for q in ("q174_dsir_importance", "q175_dsir_separation_auc"):
            df = REGISTRY[q].spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert plan.count("ReusedExchange") == 1, q
            assert plan.count("Scan parquet") == 1, q
            assert "BroadcastHashJoin" in plan, q
            assert "NestedLoop" not in plan, q
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_dsir_flag_swap_negates_weights(spark):
    # bits_t and bits_r use the same smoothing, so exchanging the two
    # distributions exactly negates every per-bucket delta — and
    # therefore every document's dsir_bits. A broken smoothing or an
    # asymmetric total would break this identity.
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40))),
         rng.random() < 0.5)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, tgt boolean")
    a = {
        r["doc_id"]: r["dsir_bits"]
        for r in dsir_importance(df, "doc_id", "text", F.col("tgt")).collect()
    }
    b = {
        r["doc_id"]: r["dsir_bits"]
        for r in dsir_importance(df, "doc_id", "text", ~F.col("tgt")).collect()
    }
    assert a and set(a) == set(b)
    assert all(a[k] == -b[k] for k in a)


def test_auc_flag_flip_complements(spark):
    # flipping the flag complements the AUC: floor truncation makes the
    # pair sum 10000 or 9999, never anything else
    import random

    rng = random.Random(11)
    rows = [(rng.randint(-8, 8), rng.random() < 0.3) for _ in range(80)]
    df = spark.createDataFrame(rows, "s bigint, f boolean")
    [a] = score_separation_auc(df, "s", "f").collect()
    flipped = df.withColumn("f", ~F.col("f"))
    [b] = score_separation_auc(flipped, "s", "f").collect()
    assert a["n_flagged"] == b["n_rest"] and a["n_rest"] == b["n_flagged"]
    assert a["auc_bp"] + b["auc_bp"] in (9999, 10000)
