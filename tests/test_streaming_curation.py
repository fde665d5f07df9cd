"""Streaming decontamination: stateless broadcast gram-array flags
across micro-batches (append mode, no state store)."""

from __future__ import annotations

import uuid

from kaflow_spark.streaming.curation import streaming_contamination_flags

DOCS_DDL = "doc_id bigint, text string"

BENCH_TEXT = (
    "what is the capital of france paris is the capital and largest city"
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, DOCS_DDL).coalesce(1).write.mode("append").parquet(path)


def test_streaming_contamination_across_batches(spark, tmp_path):
    path = str(tmp_path / f"sc-{uuid.uuid4().hex[:6]}")
    name = f"sc_{uuid.uuid4().hex[:8]}"
    bench = spark.createDataFrame(
        [(900, BENCH_TEXT)], "bench_id bigint, btext string"
    )
    _write(spark, path, [(1, "a perfectly clean training document about engines")])
    stream = (
        spark.readStream.schema(DOCS_DDL).option("maxFilesPerTrigger", 1).parquet(path)
    )
    flags = streaming_contamination_flags(
        stream, bench, "doc_id", "text", "bench_id", "btext", k=8, min_overlap=20
    )
    q = flags.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
        assert spark.sql(f"SELECT * FROM {name}").count() == 0
        # batch 2: one contaminated doc (embeds the benchmark answer), one clean
        _write(
            spark,
            path,
            [
                (2, "leaked: " + BENCH_TEXT + " end of leak"),
                (3, "another clean doc discussing shuffle partitioning"),
            ],
        )
        q.processAllAvailable()
        rows = spark.sql(f"SELECT doc_id, bench_id, overlap FROM {name}").collect()
        assert [(r["doc_id"], r["bench_id"]) for r in rows] == [(2, 900)]
        assert rows[0]["overlap"] >= 20
    finally:
        q.stop()


def test_streaming_drift_monitor_flags_shifted_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from kaflow_spark.streaming.curation import drift_monitor

    path = str(tmp_path / f"dm-{uuid.uuid4().hex[:6]}")
    ddl = "doc_id bigint, n_chars bigint"
    # reference: lengths spread over buckets 1-3 (64-char buckets)
    ref_rows = [(i, 64 + (i % 3) * 64) for i in range(30)]
    ref = (
        spark.createDataFrame(ref_rows, ddl)
        .groupBy(F.expr("n_chars div 64").alias("bucket"))
        .agg(F.count("*").alias("rc"))
    )
    results = {}
    handle = drift_monitor(
        ref, "n_chars", 64, on_result=lambda bid, row: results.__setitem__(bid, row)
    )
    # batch 0 matches the reference mixture; batch 1 is all-bucket-10
    spark.createDataFrame(ref_rows, ddl).coalesce(1).write.mode("append").parquet(path)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(100 + i, 640) for i in range(30)], ddl
        ).coalesce(1).write.mode("append").parquet(path)
        q.processAllAvailable()
    finally:
        q.stop()
    assert set(results) == {0, 1}
    assert results[0].l1_bp == 0  # identical mixture
    # fully disjoint: batch bucket 10000 bp + ref 3x(10*10000 div 30
    # = 3333) = 9999 bp (floor-div shares don't sum to exactly 10000)
    assert results[1].l1_bp == 19999
    assert results[1].n_docs == 30


def test_streaming_ks_monitor_matches_batch_twin(spark, tmp_path):
    """The foreachBatch KS score equals the batch ks_drift_bp
    two-group computation on the same (batch, reference) samples:
    0 bp for an identical sample, 10000 bp for a disjoint one, and
    bit-equal to the operator on a nontrivial mixed batch."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from kaflow_spark.operators.curation import ks_drift_bp
    from kaflow_spark.streaming.curation import ks_monitor

    path = str(tmp_path / f"ks-{_uuid.uuid4().hex[:6]}")
    ddl = "doc_id bigint, n_tokens bigint"
    ref_rows = [(i, 100 + (i % 7) * 13) for i in range(40)]
    ref = spark.createDataFrame(ref_rows, ddl)
    results = {}
    handle = ks_monitor(
        ref, "n_tokens", on_result=lambda bid, row: results.__setitem__(bid, row)
    )
    batches = [
        ref_rows,                                      # identical sample
        [(200 + i, 9000 + i) for i in range(25)],      # fully disjoint
        [(300 + i, 100 + (i % 11) * 9) for i in range(33)],  # mixed
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(path)
    )
    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert set(results) == {0, 1, 2}
    assert results[0].ks_bp == 0
    assert results[1].ks_bp == 10000
    # nontrivial batch: bit-equal to the batch operator on the union
    live = spark.createDataFrame(batches[2], ddl).select(
        F.lit("live").alias("_side"), "n_tokens"
    )
    want = (
        ks_drift_bp(
            live.unionByName(
                ref.select(F.lit("ref").alias("_side"), "n_tokens")
            ),
            "_side",
            "n_tokens",
        )
        .filter("_side = 'live'")
        .head()
    )
    got = results[2]
    assert (got.ks_bp, got.n_group, got.n_rest) == (
        want.ks_bp,
        want.n_group,
        want.n_rest,
    )


def test_monitors_skip_empty_batches(spark):
    """Round 9 (advice): an empty micro-batch yields no scored row
    (ks_drift_bp has no 'live' group at all); the handlers must skip
    it instead of handing None to on_result — a None-deref inside
    foreachBatch kills the stream."""
    from pyspark.sql import functions as F

    from kaflow_spark.streaming.curation import drift_monitor, ks_monitor

    ddl = "doc_id bigint, n_tokens bigint"
    ref = spark.createDataFrame([(i, 100 + i) for i in range(20)], ddl)
    empty = spark.createDataFrame([], ddl)

    calls = []
    ks = ks_monitor(ref, "n_tokens", on_result=lambda b, r: calls.append(r))
    ks(empty, 0)  # must not raise, must not call back
    assert calls == []

    ref_hist = ref.groupBy(F.expr("n_tokens div 64").alias("bucket")).agg(
        F.count("*").alias("rc")
    )
    dm = drift_monitor(
        ref_hist, "n_tokens", 64, on_result=lambda b, r: calls.append(r)
    )
    dm(empty, 0)
    # drift_monitor may legitimately score an empty batch as full
    # drift IF its operator emits a row; what it must never do is
    # call back with None
    assert all(r is not None for r in calls)


def test_change_point_monitor_matches_q235_on_closed_stream(spark, sf_dir, tmp_path):
    """The live change-point monitor's FINAL emission equals the q235
    batch query row-for-row on the same events, with the series
    arriving split across three micro-batches (days interleaved, so
    per-(type, day) cent sums must MERGE across batches)."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from kaflow_spark.catalog import load
    from kaflow_spark.queries import REGISTRY
    from kaflow_spark.streaming.curation import change_point_monitor

    proj = (
        load(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            F.col("event_type"),
            F.expr("CAST(unix_date(CAST(ts AS DATE)) AS BIGINT)").alias(
                "day_i"
            ),
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
    )
    path = str(tmp_path / f"cp-{_uuid.uuid4().hex[:6]}")
    # round-robin split: every batch carries rows of MOST days
    proj.repartition(3).write.mode("overwrite").parquet(path)

    emissions = {}
    handle = change_point_monitor(
        "event_type", "day_i", "cents",
        on_result=lambda bid, rows: emissions.__setitem__(bid, rows),
    )
    stream = (
        spark.readStream.schema("event_type string, day_i bigint, cents bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(emissions) >= 2, "expected multiple micro-batches"
    final = {
        r["event_type"]: r for r in emissions[max(emissions)]
    }
    batch = {
        r["event_type"]: r
        for r in REGISTRY["q235_change_point"].spark(spark, sf_dir).collect()
    }
    assert set(final) == set(batch)
    for t, b in batch.items():
        m = final[t]
        assert (
            m["split_day"], m["n_days"], m["pre_mean"], m["post_mean"], m["shift"]
        ) == (
            b["split_day"], b["n_days"], b["pre_mean_dollars"],
            b["post_mean_dollars"], b["shift_dollars"]
        ), t
    # intermediate emissions exist and are well-formed (a prefix of
    # the series still yields a split per multi-day group)
    first = emissions[min(emissions)]
    assert all(r["n_days"] >= 2 for r in first)


# ---- round 12: late/out-of-order arrival contracts -----------------------
# (round-11 verdict item 6: the applyInPandasWithState twins got these
# in round 11; the stateless foreachBatch monitors were only
# closed-stream tested. Contract under lateness: drift/KS score every
# batch INDEPENDENTLY — a late batch is scored exactly like any other
# and cannot contaminate or recall earlier emissions; the change-point
# accumulator is a per-(group, day) SUM, so arbitrary interleaving and
# split partial sums converge to the batch operator on the accumulated
# prefix after EVERY batch, not just at close.)


def test_drift_monitor_late_batch_scored_independently(spark, tmp_path):
    """A LATE batch (re-delivering data older than what the stream has
    already seen) scores exactly like its first-arrival twin: the
    emission is a pure function of the batch contents, equal to the
    batch operator, unaffected by arrival position."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from kaflow_spark.operators.curation import histogram_drift_vs_ref
    from kaflow_spark.streaming.curation import drift_monitor

    path = str(tmp_path / f"dml-{_uuid.uuid4().hex[:6]}")
    ddl = "doc_id bigint, n_chars bigint"
    ref_rows = [(i, 64 + (i % 3) * 64) for i in range(30)]
    ref = (
        spark.createDataFrame(ref_rows, ddl)
        .groupBy(F.expr("n_chars div 64").alias("bucket"))
        .agg(F.count("*").alias("rc"))
    )
    results = {}
    handle = drift_monitor(
        ref, "n_chars", 64,
        on_result=lambda bid, row: results.__setitem__(bid, row),
    )
    early = [(100 + i, 640) for i in range(20)]      # shifted mixture
    late = ref_rows                                  # "old" data, re-sent
    spark.createDataFrame(early, ddl).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = stream.writeStream.foreachBatch(handle).start()
    try:
        q.processAllAvailable()
        # the late re-delivery arrives AFTER newer data was scored
        spark.createDataFrame(late, ddl).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        q.processAllAvailable()
    finally:
        q.stop()
    assert set(results) == {0, 1}
    # each emission equals the batch operator on that batch alone
    for bid, rows in ((0, early), (1, late)):
        want = histogram_drift_vs_ref(
            spark.createDataFrame(rows, ddl), ref, "n_chars", 64
        ).head()
        got = results[bid]
        assert (got.l1_bp, got.n_docs) == (want.l1_bp, want.n_docs), bid
    # the late batch matches the reference mixture -> 0 drift, and the
    # earlier alarm is not recalled or rescored
    assert results[1].l1_bp == 0
    assert results[0].l1_bp > 0


def test_ks_monitor_late_batch_scored_independently(spark, tmp_path):
    """KS twin of the drift contract: out-of-order delivery changes
    WHICH batch_id carries which score, never the scores themselves —
    each equals the batch ks_drift_bp on (that batch, reference)."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from kaflow_spark.operators.curation import ks_drift_bp
    from kaflow_spark.streaming.curation import ks_monitor

    ddl = "doc_id bigint, n_tokens bigint"
    ref_rows = [(i, 100 + (i % 7) * 13) for i in range(40)]
    ref = spark.createDataFrame(ref_rows, ddl)
    batch_a = [(200 + i, 9000 + i) for i in range(25)]          # disjoint
    batch_b = [(300 + i, 100 + (i % 11) * 9) for i in range(33)]  # mixed

    def run(order):
        import uuid as _u

        path = str(tmp_path / f"ksl-{_u.uuid4().hex[:6]}")
        results = {}
        handle = ks_monitor(
            ref, "n_tokens",
            on_result=lambda bid, row: results.__setitem__(bid, row),
        )
        q = None
        try:
            for rows in order:
                spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
                    "append"
                ).parquet(path)
                if q is None:
                    stream = (
                        spark.readStream.schema(ddl)
                        .option("maxFilesPerTrigger", 1)
                        .parquet(path)
                    )
                    q = stream.writeStream.foreachBatch(handle).start()
                q.processAllAvailable()
        finally:
            if q is not None:
                q.stop()
        return results

    fwd = run([batch_a, batch_b])
    rev = run([batch_b, batch_a])  # "late" delivery of batch_a
    # same per-batch scores, independent of arrival order
    assert (fwd[0].ks_bp, fwd[0].n_group) == (rev[1].ks_bp, rev[1].n_group)
    assert (fwd[1].ks_bp, fwd[1].n_group) == (rev[0].ks_bp, rev[0].n_group)
    # and each equals the batch operator
    for rows, got in ((batch_a, rev[1]), (batch_b, rev[0])):
        live = spark.createDataFrame(rows, ddl).select(
            F.lit("live").alias("_side"), "n_tokens"
        )
        want = (
            ks_drift_bp(
                live.unionByName(
                    ref.select(F.lit("ref").alias("_side"), "n_tokens")
                ),
                "_side",
                "n_tokens",
            )
            .filter("_side = 'live'")
            .head()
        )
        assert (got.ks_bp, got.n_group, got.n_rest) == (
            want.ks_bp, want.n_group, want.n_rest
        )


def test_change_point_monitor_prefix_contract_under_late_arrival(
    spark, tmp_path
):
    """After EVERY batch — not just at close — the change-point
    emission equals the batch operator on the accumulated prefix,
    with days arriving out of order, one (group, day) cell SPLIT
    across two batches (partial cent sums must merge), and a final
    all-stale batch that only re-delivers old days."""
    import uuid as _uuid

    from kaflow_spark.operators.events import change_point_from_daily
    from kaflow_spark.streaming.curation import change_point_monitor

    ddl = "event_type string, day_i bigint, cents bigint"
    # level shift at day 5: ~100/day before, ~500/day after
    series = {d: (10000 if d < 5 else 50000) + d * 7 for d in range(10)}
    # batch 0: the LATER days arrive first, plus HALF of day 3's cents;
    # batch 1: early days out of order + the other half of day 3;
    # batch 2: stale-only re-delivery (more cents for days 0 and 7)
    batches = [
        [("a", d, series[d]) for d in (7, 5, 9, 6, 8)] + [("a", 3, 4000)],
        [("a", d, series[d]) for d in (2, 0, 4, 1)]
        + [("a", 3, series[3] - 4000)],
        [("a", 0, 111), ("a", 7, 222)],
    ]
    path = str(tmp_path / f"cpl-{_uuid.uuid4().hex[:6]}")
    emissions = {}
    handle = change_point_monitor(
        "event_type", "day_i", "cents",
        on_result=lambda bid, rows: emissions.__setitem__(bid, rows),
    )
    q = None
    try:
        for rows in batches:
            spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
                "append"
            ).parquet(path)
            if q is None:
                stream = (
                    spark.readStream.schema(ddl)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(path)
                )
                q = stream.writeStream.foreachBatch(handle).start()
            q.processAllAvailable()
    finally:
        if q is not None:
            q.stop()
    assert set(emissions) == {0, 1, 2}
    # expected: batch operator on each accumulated prefix (cent sums
    # merged per (group, day), then div-100 truncation like the
    # monitor's driver accumulator)
    acc: dict[tuple, int] = {}
    for bid, rows in enumerate(batches):
        for g, d, c in rows:
            acc[(g, d)] = acc.get((g, d), 0) + c
        daily = spark.createDataFrame(
            [
                (g, d, c // 100 if c >= 0 else -((-c) // 100))
                for (g, d), c in sorted(acc.items())
            ],
            "event_type string, day_i bigint, x bigint",
        )
        want = {
            r["event_type"]: r
            for r in change_point_from_daily(
                daily, "event_type", "day_i", "x"
            ).collect()
        }
        got = {r["event_type"]: r for r in emissions[bid]}
        assert set(got) == set(want), bid
        for g in want:
            w, m = want[g], got[g]
            assert (
                m["split_day"], m["n_days"], m["pre_mean"],
                m["post_mean"], m["shift"],
            ) == (
                w["split_day"], w["n_days"], w["pre_mean"],
                w["post_mean"], w["shift"],
            ), (bid, g)
    # the detected split survives lateness: still at the planted
    # boundary (split_day = last pre-shift day under the operator's
    # convention, equal to the batch operator's on the full series)
    assert emissions[2][0]["split_day"] == 4
    assert emissions[2][0]["shift"] > 0


def test_accumulator_frame_is_jvm_local(spark):
    """The change-point monitor's per-batch accumulator frame must NOT
    plan a pickled ExistingRDD scan (CLAUDE.md trap 18: 32 near-empty
    Python-worker partitions billed per micro-batch) — the
    inline(array(struct(lit...))) assembly stays a JVM-local relation
    with no Python workers and a single partition, and data-derived
    group strings (quotes included) bind as literals, never spliced
    into SQL text."""
    from kaflow_spark.streaming.curation import _accumulator_frame

    cells = [("ca'rt", 1, 10), ("view", 1, 20), ("view", 2, 30)]
    daily = _accumulator_frame(spark, cells, "g", "d")
    plan = daily._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan, plan
    assert "Python" not in plan, plan  # no BatchEvalPython/ArrowEval
    got = sorted(tuple(r) for r in daily.collect())
    assert got == sorted(cells)
