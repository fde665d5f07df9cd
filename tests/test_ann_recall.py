"""Quantitative recall attestation for the approximate similarity
operators (q44 multi-probe multi-table LSH, q63 IVF) — the registry's
only rows-only entries, since ANN output has no exact cross-engine
oracle BY DESIGN. Two complementary measurements replace "trust me":

1. PLANTED STRUCTURE (the operator's actual retrieval job): a seeded
   corpus of uniform noise plus a cluster of near-duplicates of the
   query (cos ~0.95). Both ANN operators must retrieve EVERY planted
   neighbour (recall 1.0) while their candidate set provably prunes
   (selectivity bound asserted) — recall AND pruning together, since
   either alone is trivial.

2. FIXTURE FLOORS: the driver fixture's embeddings are uniform on the
   sphere (measured: mean pairwise cos ~0, top-10 cos ~0.33, zero
   pairs above 0.5) — the information-theoretic worst case, where ANY
   bucketing scheme's recall@10 is ~selectivity + 0.3 (measured over
   a plane/probe/table/nprobe grid; see ann_candidates docstring).
   Everything is seeded, so the measured recalls are deterministic
   constants; pinning them as floors makes a silent quality
   regression in plane generation, probing, or assignment fail
   loudly, without pretending the uniform fixture admits recall 0.9
   at pruning selectivity.
"""

from __future__ import annotations

import math
import random

from kaflow_spark.queries import REGISTRY


def _topk_ids(spark, sf_dir: str, name: str) -> list[int]:
    df = REGISTRY[name].spark(spark, sf_dir)
    id_col = df.columns[0]
    return [r[id_col] for r in df.collect()]


def _planted_corpus(spark):
    """300 seeded uniform vectors (dim 32) + 10 near-duplicates of a
    base vector (gaussian noise, cos ~0.95) + the query = another
    noisy copy. The planted cluster is far above the uniform cosine
    range, so the exact top-10 is exactly the planted set."""
    rng = random.Random(7)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    def noisy(base, eps):
        return unit([b + rng.gauss(0, eps) for b in base])

    base = unit([rng.gauss(0, 1) for _ in range(32)])
    rows = [(i, unit([rng.gauss(0, 1) for _ in range(32)])) for i in range(300)]
    planted = [(1000 + i, noisy(base, 0.1)) for i in range(10)]
    query = noisy(base, 0.1)
    df = spark.createDataFrame(
        rows + planted, "vec_id bigint, embedding array<double>"
    )
    return df, query, {pid for pid, _ in planted}


def test_lsh_planted_recall_is_total_and_pruned(spark):
    from kaflow_spark.operators.similarity import ann_candidates, ann_topk

    df, query, planted = _planted_corpus(spark)
    got = {
        r["vec_id"]
        for r in ann_topk(df, "embedding", "vec_id", query, k=10).collect()
    }
    assert got == planted, f"LSH missed planted neighbours: {planted - got}"
    n_cand = ann_candidates(df, "embedding", query).count()
    assert n_cand < 0.5 * 310, f"LSH candidate set did not prune: {n_cand}/310"


def test_ivf_planted_recall_is_total_and_pruned(spark):
    from kaflow_spark.operators.similarity import ivf_candidates, ivf_topk

    df, query, planted = _planted_corpus(spark)
    got = {
        r["vec_id"]
        for r in ivf_topk(
            df, "embedding", "vec_id", query, k=10, n_lists=8, nprobe=3
        ).collect()
    }
    assert got == planted, f"IVF missed planted neighbours: {planted - got}"
    n_cand = ivf_candidates(
        df, "embedding", query, n_lists=8, nprobe=3
    ).count()
    assert n_cand < 0.75 * 310, f"IVF candidate set did not prune: {n_cand}/310"


def test_fixture_recall_floors_hold(spark, sf_dir):
    """Deterministic (seeded) floors on the uniform driver fixture:
    measured q44 = 0.4 (sf0.001) / 0.3 (sf0.01), q63 = 0.6 / 0.8.
    Floors are the cross-SF minima; a drop below means the bucketing
    machinery itself regressed, not the data."""
    exact = set(_topk_ids(spark, sf_dir, "q38_cosine_topk"))
    assert len(exact) == 10
    a44 = _topk_ids(spark, sf_dir, "q44_ann_topk")
    a63 = _topk_ids(spark, sf_dir, "q63_ivf_topk")
    assert len(a44) == 10, "q44 no longer fills k — candidate set too small"
    recall44 = len(exact & set(a44)) / 10
    recall63 = len(exact & set(a63)) / 10
    assert recall44 >= 0.3, f"q44 fixture recall fell to {recall44}"
    assert recall63 >= 0.6, f"q63 fixture recall fell to {recall63}"


def _grown_corpus(spark, mult):
    """The planted corpus replicated mult x (id-shifted copies of the
    noise), the scale_probe growth pattern that decays fixed-nprobe
    recall as the quantizer fit ages relative to the corpus."""
    rng = random.Random(7)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    dim = 32
    base = unit([rng.gauss(0, 1) for _ in range(dim)])
    noise = [
        (i, unit([rng.gauss(0, 1) for _ in range(dim)])) for i in range(300)
    ]
    planted = [
        (1000 + i, unit([b + rng.gauss(0, 0.1) for b in base]))
        for i in range(10)
    ]
    query = unit([b + rng.gauss(0, 0.1) for b in base])
    rep = [(i + 10_000_000 * j, v) for j in range(mult) for i, v in noise]
    df = spark.createDataFrame(
        rep + planted, "vec_id bigint, embedding array<double>"
    )
    return df, query, {p for p, _ in planted}


def test_ivf_tuner_restores_recall_at_10x_without_hand_tuning(spark):
    """Round 10: the self-probing nprobe tuner operationalizes the
    SCALING rule 'probe more, not finer' — at 10x corpus growth it
    picks (from its own one-pass recall curve, no hand tuning) an
    nprobe that retrieves the planted cluster completely."""
    from kaflow_spark.operators.similarity import (
        ivf_fit,
        ivf_topk,
        ivf_tune_nprobe,
    )

    df, query, planted = _grown_corpus(spark, 10)
    cents = ivf_fit(df, "embedding", n_lists=16, seed=42)
    tune = ivf_tune_nprobe(
        df, "embedding", "vec_id", centroids=cents, k=10,
        n_queries=20, target_recall_bp=9500,
    )
    m = tune["nprobe"]
    curve = tune["recall_bp"]
    # the grown corpus needs MORE probes than the 1x default of 4
    assert 4 < m <= 16, tune
    # curve sanity: monotone non-decreasing, exact at full probe,
    # and m is minimal for the target
    assert all(curve[i] <= curve[i + 1] for i in range(1, 16))
    assert curve[16] == 10000
    assert curve[m] >= 9500 and (m == 1 or curve[m - 1] < 9500)
    got = {
        r["vec_id"]
        for r in ivf_topk(
            df, "embedding", "vec_id", query, k=10,
            centroids=cents, nprobe=m,
        ).collect()
    }
    assert got == planted, f"tuned nprobe={m} missed {planted - got}"


def test_ivf_tuner_ground_truth_dedupes_exact_copies(spark):
    """The replication trap the tuner must not fall into: a
    duplicate-heavy corpus makes every raw top-k = k co-located
    copies, reporting recall 1.0 at nprobe=1 (observed before the
    distinct-score dedupe) — while genuine neighborhoods need far
    more probes. The dedupe keeps the curve honest."""
    from kaflow_spark.operators.similarity import ivf_fit, ivf_tune_nprobe

    df, _, _ = _grown_corpus(spark, 10)
    cents = ivf_fit(df, "embedding", n_lists=16, seed=42)
    tune = ivf_tune_nprobe(
        df, "embedding", "vec_id", centroids=cents, k=10,
        n_queries=20, target_recall_bp=9500,
    )
    assert tune["nprobe"] > 1, tune
    assert tune["recall_bp"][1] < 9000, tune["recall_bp"]


def test_ivf_refresh_drift_separates_grown_from_stationary(spark):
    """ivf_refresh's drift_bp — RELATIVE QUANTIZATION-ERROR REDUCTION
    of a fresh fit vs the serving one, in basis points — is near-zero
    when the corpus merely replicated (the old fit quantizes it as
    well as a refit would), large when new mass arrived in a
    direction the old fit never saw (a refit's dedicated centroid
    slashes that mass's cosine distance)."""
    import random as _random

    from kaflow_spark.operators.similarity import ivf_fit, ivf_refresh

    df, query, _ = _grown_corpus(spark, 5)
    old = ivf_fit(df, "embedding", n_lists=16, seed=42)
    stationary = ivf_refresh(df, "embedding", old)
    assert len(stationary["centroids"]) == 16
    assert stationary["drift_bp"] < 1200, stationary["drift_bp"]

    rng = _random.Random(11)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    newclust = [
        (
            5_000_000 + i,
            unit([-q + rng.gauss(0, 0.05) for q in query]),
        )
        for i in range(1500)
    ]
    grown = df.unionAll(
        df.sparkSession.createDataFrame(
            newclust, "vec_id bigint, embedding array<double>"
        )
    )
    shifted = ivf_refresh(grown, "embedding", old)
    assert shifted["drift_bp"] > 1500, shifted["drift_bp"]
    assert shifted["drift_bp"] > 3 * max(stationary["drift_bp"], 100)


def test_ivf_append_only_maintenance_loop(spark):
    """Round-13 (r12 verdict task 6): the append-only maintenance
    path — per-delta assign-only stats fold into one running report
    (counts exact), a same-distribution append leaves the signal
    quiet, a drifted append trips it, and the expensive confirm
    (ivf_refresh) then justifies the rebuild. The base corpus is
    scanned exactly once (at build); every later pass is delta-only
    by construction of the API."""
    import numpy as np

    from kaflow_spark.operators.similarity import (
        ivf_append_signal,
        ivf_corpus_stats,
        ivf_fit,
        ivf_merge_stats,
        ivf_refresh,
    )

    df, query, _ = _grown_corpus(spark, 3)
    cents = ivf_fit(df, "embedding", n_lists=16, seed=42)
    build = ivf_corpus_stats(df, "embedding", cents)
    n0 = df.count()
    assert build["n"] == n0
    assert sum(build["occupancy"].values()) == n0
    assert build["err_sum_micro"] >= 0

    # append 1: a replica of the corpus — same distribution, and the
    # folded report's counts/err must be EXACTLY additive
    delta_same = df.selectExpr("vec_id + 900000 AS vec_id", "embedding")
    d1 = ivf_corpus_stats(delta_same, "embedding", cents)
    assert d1["n"] == n0 and d1["err_sum_micro"] == build["err_sum_micro"]
    assert d1["occupancy"] == build["occupancy"]
    report = ivf_merge_stats(build, d1)
    assert report["n"] == 2 * n0
    assert report["err_sum_micro"] == 2 * build["err_sum_micro"]
    sig = ivf_append_signal(build, report)
    assert sig["err_growth_bp"] == 0 and sig["added"] == n0

    # append 2: mass in a direction the quantizer never saw
    rng = np.random.RandomState(5)
    anti = [
        (
            950_000 + i,
            [float(x) for x in -(np.array(query) + rng.normal(0, 0.05, len(query)))],
        )
        for i in range(1200)
    ]
    delta_drift = spark.createDataFrame(
        anti, "vec_id bigint, embedding array<double>"
    )
    d2 = ivf_corpus_stats(delta_drift, "embedding", cents)
    report = ivf_merge_stats(report, d2)
    assert report["n"] == 2 * n0 + 1200
    sig = ivf_append_signal(build, report)
    assert sig["err_growth_bp"] > 300, sig  # the trigger trips
    assert sig["added"] == n0 + 1200

    # the expensive confirm: a refit must cut quantization error
    grown = df.unionByName(delta_same).unionByName(delta_drift)
    ref = ivf_refresh(grown, "embedding", cents, seed=11)
    assert ref["drift_bp"] > 1500, ref["drift_bp"]  # rebuild justified


def test_ivf_corpus_stats_matches_assign_and_refresh_err(spark):
    """ivf_corpus_stats' one-pass (occupancy, error) must agree with
    the separate ivf_list_stats occupancy and (up to the documented
    per-row floor quantization) ivf_refresh's mean error."""
    from kaflow_spark.operators.similarity import (
        ivf_corpus_stats,
        ivf_fit,
        ivf_list_stats,
    )

    df, _, _ = _grown_corpus(spark, 2)
    cents = ivf_fit(df, "embedding", n_lists=8, seed=42)
    stats = ivf_corpus_stats(df, "embedding", cents)
    occ = {
        int(r["_ivf_list"]): int(r["n"])
        for r in ivf_list_stats(df, "embedding", cents).collect()
    }
    assert stats["occupancy"] == occ
    # mean error in micro-units: per-row floor vs mean-then-round —
    # within 1 micro-unit per row of each other
    n = stats["n"]
    assert 0 <= stats["err_sum_micro"] <= n * 2_000_000


def test_ivf_fit_deterministic_under_subsampling(spark):
    """Round-13 regression pin for the r12 residual nondeterminism:
    `df.sample(frac, seed=seed)` binds frac to withReplacement and
    PySpark's overload shim SILENTLY DROPS the seed — so ivf_fit's
    'deterministic' sample was random per call whenever the corpus
    exceeded the sample size (frac < 1; the small-fixture tests never
    noticed because frac=1.0 bypasses the sampler). With keyword
    fraction=/seed= the fit is bit-identical across calls AT A
    SUB-UNITY FRACTION, and different seeds still differ."""
    import numpy as np

    from kaflow_spark.operators.similarity import ivf_fit

    df, _, _ = _grown_corpus(spark, 4)  # 1210 rows
    c1 = np.array(ivf_fit(df, "embedding", n_lists=8, sample=300, seed=42))
    c2 = np.array(ivf_fit(df, "embedding", n_lists=8, sample=300, seed=42))
    assert np.array_equal(c1, c2)
    c3 = np.array(ivf_fit(df, "embedding", n_lists=8, sample=300, seed=7))
    assert not np.array_equal(c1, c3)


def test_ivf_partitioned_storage_prunes_probe_scan(spark, tmp_path):
    """The storage layout the IVF docstrings promise, attested:
    ivf_write_partitioned lays the corpus out by _ivf_list, and a
    probe's IN-list filter is served by PARTITION PRUNING — the scan
    plans PartitionFilters on _ivf_list and reads only the probed
    lists' files, and the pruned read returns exactly the rows a
    full-scan filter would."""
    from pyspark.sql import functions as F

    from kaflow_spark.operators.similarity import (
        ivf_fit,
        ivf_write_partitioned,
    )

    df, query, _ = _planted_corpus(spark)
    cents = ivf_fit(df, "embedding", n_lists=8, seed=42)
    path = str(tmp_path / "ivf_store")
    ivf_write_partitioned(df, "embedding", cents, path)

    stored = spark.read.parquet(path)
    probes = [0, 3]
    pruned = stored.filter(F.col("_ivf_list").isin(probes))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_ivf_list" in plan.split(
        "PartitionFilters", 1
    )[1][:200], plan

    # the pruned scan reads ONLY the probed partitions' files
    pruned.collect()
    files = {
        r[0]
        for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert files and all(
        any(f"_ivf_list={p}/" in f for p in probes) for f in files
    ), files
    # and row-for-row equals the full-scan filter
    want = {
        r["vec_id"]
        for r in stored.collect()
        if r["_ivf_list"] in probes
    }
    got = {r["vec_id"] for r in pruned.collect()}
    assert got == want and got

    # maintenance append with FROZEN centroids lands in the layout
    delta = df.selectExpr("vec_id + 900000 AS vec_id", "embedding")
    ivf_write_partitioned(delta, "embedding", cents, path, mode="append")
    again = spark.read.parquet(path).filter(
        F.col("_ivf_list").isin(probes)
    )
    assert again.count() == 2 * len(want)


def test_sq8_probe_matches_float_path_on_planted_corpus(spark, tmp_path):
    """The SQ8 serving path (round 14): probe the quantized layout,
    int8 asymmetric shortlist, exact rerank — the final top-k must
    EQUAL the float ivf_topk's under the same frozen centroids and
    probes (exact rerank makes parity achievable, not just recall
    overlap), and the planted cluster must be fully retrieved."""
    from kaflow_spark.operators.similarity import (
        ivf_fit,
        ivf_topk,
        sq8_probe_topk,
        sq8_write_partitioned,
    )

    df, query, planted = _planted_corpus(spark)
    cents = ivf_fit(df, "embedding", n_lists=8, seed=42)
    path = str(tmp_path / "sq8_store")
    sq8_write_partitioned(df, "embedding", cents, path)
    stored = spark.read.parquet(path)

    got = sq8_probe_topk(
        stored, "embedding", "vec_id", query, 10,
        centroids=cents, nprobe=3,
    ).collect()
    want = ivf_topk(
        df, "embedding", "vec_id", query, 10,
        centroids=cents, nprobe=3,
    ).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    assert set(r["vec_id"] for r in got) == set(planted)


def test_sq8_probe_matches_float_path_on_fixtures(spark):
    """Recall parity on the uniform fixture corpora at every SF — the
    adversarial case (no planted structure, scores packed together):
    same centroids, same probes, identical final top-10."""
    from kaflow_spark.catalog import load
    from kaflow_spark.operators.similarity import (
        ivf_assign,
        ivf_fit,
        ivf_topk,
        sq8_encode,
        sq8_probe_topk,
    )
    from kaflow_spark.queries.llm import _fixture_query_vec

    for sf in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        e = load(spark, sf, "embeddings").select("vec_id", "embedding")
        query = _fixture_query_vec(sf)
        cents = ivf_fit(e, "embedding", n_lists=8, seed=42)
        index = sq8_encode(ivf_assign(e, "embedding", cents), "embedding")
        got = sq8_probe_topk(
            index, "embedding", "vec_id", query, 10,
            centroids=cents, nprobe=3,
        ).collect()
        want = ivf_topk(
            e, "embedding", "vec_id", query, 10,
            centroids=cents, nprobe=3,
        ).collect()
        assert [r["vec_id"] for r in got] == [
            r["vec_id"] for r in want
        ], sf


def test_sq8_layout_prunes_partitions_and_columns(spark, tmp_path):
    """The byte accounting the SQ8 path promises at 100 TB, attested
    on the plans: (a) the probe's narrow read plans PartitionFilters
    on _ivf_list AND a ReadSchema WITHOUT the float vector column
    (column pruning — the 4x saving); (b) the refine read pushes the
    shortlist down as an In filter on vec_id (row-group skipping)."""
    from pyspark.sql import functions as F

    from kaflow_spark.operators.similarity import (
        ivf_fit,
        sq8_write_partitioned,
    )

    df, query, _ = _planted_corpus(spark)
    cents = ivf_fit(df, "embedding", n_lists=8, seed=42)
    path = str(tmp_path / "sq8_prune")
    sq8_write_partitioned(df, "embedding", cents, path)
    stored = spark.read.parquet(path)

    narrow = stored.filter(F.col("_ivf_list").isin(0, 3)).select(
        "vec_id", "_sq8_code", "_sq8_scale"
    )
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    rs = plan.split("ReadSchema", 1)[1][:200]
    assert "_sq8_code" in rs and "embedding" not in rs, rs

    rerank = stored.filter(F.col("_ivf_list").isin(0, 3)).filter(
        F.col("vec_id").isin(1, 2, 3)
    )
    plan2 = rerank._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan2 and "In(vec_id" in plan2.split(
        "PushedFilters", 1
    )[1][:200], plan2


def test_ivf_tuner_runs_unchanged_over_sq8_layout(spark, tmp_path):
    """ivf_tune_nprobe consumes the float column the SQ8 layout
    retains — it runs UNCHANGED over the read-back quantized store:
    same corpus evidence (occupancy identical to the source frame),
    a well-formed monotone recall curve closing at 10000, and
    deterministic (two runs over the layout are identical). The
    self-query SET is not asserted equal to the source frame's —
    Bernoulli sampling is per-partition seeded, so it is pinned per
    PLAN (the ivf_fit contract), not across physical layouts."""
    from kaflow_spark.operators.similarity import (
        ivf_fit,
        ivf_tune_nprobe,
        sq8_write_partitioned,
    )

    df, _, _ = _planted_corpus(spark)
    cents = ivf_fit(df, "embedding", n_lists=8, seed=42)
    path = str(tmp_path / "sq8_tune")
    sq8_write_partitioned(df, "embedding", cents, path)
    stored = spark.read.parquet(path).select("vec_id", "embedding")

    src = ivf_tune_nprobe(
        df, "embedding", "vec_id", centroids=cents, k=5, n_queries=8
    )
    back = ivf_tune_nprobe(
        stored, "embedding", "vec_id", centroids=cents, k=5, n_queries=8
    )
    assert back["occupancy"] == src["occupancy"]
    assert back["n_lists"] == 8
    curve = [back["recall_bp"][m] for m in range(1, 9)]
    assert curve == sorted(curve) and curve[-1] == 10000
    assert 1 <= back["nprobe"] <= 8
    again = ivf_tune_nprobe(
        stored, "embedding", "vec_id", centroids=cents, k=5, n_queries=8
    )
    assert again["recall_bp"] == back["recall_bp"]
    assert again["nprobe"] == back["nprobe"]
