"""Structured Streaming tests: real micro-batch execution through
file sources (one file per trigger) + memory sinks. Kafka itself needs
the spark-sql-kafka package and a broker — the wiring is covered by
unit-shape tests; the streaming *semantics* (watermarks, windows,
dedup, arbitrary state, the app's micro-batch body) run for real here.
"""

from __future__ import annotations

import datetime as dt
import json
import uuid

import pytest
from pyspark.sql import functions as F

import kaflow_spark.message as M
from kaflow_spark.app import App
from kaflow_spark.message import Message
from kaflow_spark.params import FromValue, Json, Str
from kaflow_spark.streaming.dedup import dedup_within_watermark
from kaflow_spark.streaming.stateful import running_aggregate
from kaflow_spark.streaming.windows import session, tumbling

EVENTS_DDL = "event_id bigint, ts timestamp, user_id bigint, value double"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s + "+00:00")


def _write_chunk(spark, path: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.mode("append").parquet(path)


def _stream(spark, path: str):
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _run_query(df, mode: str, name: str):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )


@pytest.fixture()
def tdir(tmp_path) -> str:
    return str(tmp_path / f"stream-{uuid.uuid4().hex[:8]}")


def test_tumbling_window_with_watermark_append(spark, tdir):
    """Append mode emits a window only once the watermark passes its
    end; a late event arriving after that is dropped."""
    name = f"t_{uuid.uuid4().hex[:8]}"
    _write_chunk(
        spark,
        tdir,
        [
            (1, _ts("2024-01-01 10:00:30"), 1, 1.0),
            (2, _ts("2024-01-01 10:03:00"), 1, 1.0),
        ],
    )
    agg = tumbling(
        _stream(spark, tdir),
        "ts",
        "5 minutes",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n")],
        watermark="10 minutes",
    )
    q = _run_query(agg, "append", name)
    try:
        q.processAllAvailable()
        assert spark.sql(f"SELECT * FROM {name}").count() == 0  # window open

        # batch 2: event far in the future pushes watermark past 10:05
        _write_chunk(spark, tdir, [(3, _ts("2024-01-01 11:00:00"), 1, 1.0)])
        q.processAllAvailable()
        # batch 3: late event for the already-closed 10:00 window
        _write_chunk(spark, tdir, [(4, _ts("2024-01-01 10:01:00"), 1, 1.0)])
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        closed = {
            (r["window_start"].isoformat(), r["n"]) for r in rows
        }
        # the 10:00-10:05 window closed with exactly the 2 on-time events;
        # the late event_id=4 did NOT reopen/recount it
        assert ("2024-01-01T10:00:00+00:00", 2) in closed or (
            "2024-01-01T10:00:00",
            2,
        ) in closed
        assert all(n == 2 for (_, n) in closed)
    finally:
        q.stop()


def test_streaming_dedup_within_watermark(spark, tdir):
    name = f"d_{uuid.uuid4().hex[:8]}"
    _write_chunk(
        spark,
        tdir,
        [
            (1, _ts("2024-01-01 10:00:00"), 1, 1.0),
            (1, _ts("2024-01-01 10:00:10"), 1, 1.0),  # same event_id, same batch
        ],
    )
    dd = dedup_within_watermark(
        _stream(spark, tdir), ["event_id"], "ts", watermark="30 minutes"
    )
    q = _run_query(dd, "append", name)
    try:
        q.processAllAvailable()
        # batch 2: redelivery of event_id=1 within the horizon + a new id
        _write_chunk(
            spark,
            tdir,
            [
                (1, _ts("2024-01-01 10:05:00"), 1, 1.0),
                (2, _ts("2024-01-01 10:06:00"), 1, 2.0),
            ],
        )
        q.processAllAvailable()
        ids = [r["event_id"] for r in spark.sql(f"SELECT * FROM {name}").collect()]
        assert sorted(ids) == [1, 2]  # each id exactly once
    finally:
        q.stop()


def test_session_window_streaming(spark, tdir):
    name = f"s_{uuid.uuid4().hex[:8]}"
    _write_chunk(
        spark,
        tdir,
        [
            (1, _ts("2024-01-01 10:00:00"), 7, 1.0),
            (2, _ts("2024-01-01 10:10:00"), 7, 1.0),  # same session (gap 30m)
            (3, _ts("2024-01-01 12:00:00"), 7, 1.0),  # new session
        ],
    )
    sess = session(
        _stream(spark, tdir),
        "ts",
        "30 minutes",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n")],
        watermark="10 minutes",
    )
    q = _run_query(sess, "append", name)
    try:
        q.processAllAvailable()
        # close everything by advancing the watermark far ahead
        _write_chunk(spark, tdir, [(9, _ts("2024-01-02 00:00:00"), 8, 1.0)])
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name} WHERE user_id = 7").collect()
        ns = sorted(r["n"] for r in rows)
        assert ns == [1, 2]  # two sessions: {e1,e2} and {e3}
    finally:
        q.stop()


def test_stateful_running_aggregate(spark, tdir):
    name = f"r_{uuid.uuid4().hex[:8]}"
    _write_chunk(spark, tdir, [(1, _ts("2024-01-01 10:00:00"), 5, 10.0)])
    run = running_aggregate(_stream(spark, tdir), "user_id", "value")
    q = _run_query(run, "update", name)
    try:
        q.processAllAvailable()
        _write_chunk(spark, tdir, [(2, _ts("2024-01-01 10:01:00"), 5, 32.0)])
        q.processAllAvailable()
        rows = spark.sql(
            f"SELECT * FROM {name} ORDER BY run_count"
        ).collect()
        # state carried across micro-batches: 1 row then cumulative 2
        assert [(r["run_count"], r["run_sum"]) for r in rows] == [
            (1, 10.0),
            (2, 42.0),
        ]
        assert rows[-1]["run_max"] == 32.0
    finally:
        q.stop()


def test_batch_fallbacks_match_streaming_shapes(spark):
    """The same builders run on batch frames (TestClient path)."""
    rows = [
        (1, _ts("2024-01-01 10:00:00"), 1, 1.0),
        (1, _ts("2024-01-01 10:00:00"), 1, 1.0),
        (2, _ts("2024-01-01 11:00:00"), 1, 3.0),
    ]
    df = spark.createDataFrame(rows, EVENTS_DDL)
    t = tumbling(df, "ts", "1 hour", keys=["user_id"])
    assert {c for c in t.columns} == {"window_start", "window_end", "user_id", "n"}
    assert sorted(r["n"] for r in t.collect()) == [1, 2]
    d = dedup_within_watermark(df, ["event_id"], "ts")
    assert d.count() == 2
    r = running_aggregate(df, "user_id", "value").collect()
    assert (r[0]["run_count"], r[0]["run_sum"], r[0]["run_max"]) == (3, 5.0, 3.0)


def test_app_micro_batch_body(spark, tmp_path):
    """The app's foreachBatch body over a real envelope stream: file
    stream of envelope rows -> process_batch -> outputs collected per
    micro-batch (what run_stream does against Kafka)."""
    app = App(name="stream-app")

    @app.consume(topic="in", sink_topics=("out",))
    def upper(v: FromValue[Str]) -> Message:
        return Message(value=v.upper().encode())

    env_dir = str(tmp_path / "env")
    ts = _ts("2024-01-01 10:00:00")
    spark.createDataFrame(
        [("in", 0, 0, ts, 0, None, b"hello", None),
         ("in", 0, 1, ts, 0, None, b"world", None)],
        M.ENVELOPE_DDL,
    ).write.mode("append").parquet(env_dir)

    stream = (
        spark.readStream.schema(M.ENVELOPE_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(env_dir)
    )
    collected: list = []

    def body(batch_df, batch_id: int) -> None:
        out, dlq = app.process_batch(batch_df)
        collected.extend(out.collect())

    q = stream.writeStream.foreachBatch(body).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(bytes(r["value"]) for r in collected)
    assert got == [b"HELLO", b"WORLD"]
    assert all(r["topic"] == "out" for r in collected)


def test_app_micro_batch_dlq(spark, tmp_path):
    """Malformed payloads dead-letter inside the streaming micro-batch
    body, raw bytes preserved — the stream never crashes."""
    app = App(name="dlq-stream-app")

    @app.consume(topic="in", sink_topics=("out",))
    def parse(v: FromValue[Json]) -> Message:
        return Message(value=b"ok")

    env_dir = str(tmp_path / "env2")
    ts = _ts("2024-01-01 10:00:00")
    spark.createDataFrame(
        [("in", 0, 0, ts, 0, None, b'{"fine": 1}', None),
         ("in", 0, 1, ts, 0, None, b"{broken", None)],
        M.ENVELOPE_DDL,
    ).write.mode("append").parquet(env_dir)

    oks: list = []
    dlqs: list = []

    def body(batch_df, batch_id: int) -> None:
        out, dlq = app.process_batch(batch_df)
        oks.extend(out.collect())
        dlqs.extend(dlq.collect())

    q = (
        spark.readStream.schema(M.ENVELOPE_DDL)
        .parquet(env_dir)
        .writeStream.foreachBatch(body)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert [bytes(r["value"]) for r in oks] == [b"ok"]
    assert len(dlqs) == 1
    assert bytes(dlqs[0]["value"]) == b"{broken"
    assert dlqs[0]["error"].startswith("deserialization:value")


def test_tumbling_ohlc_bars_append(spark, tdir):
    """OHLC aggs in a streaming tumbling window: open/close track the
    (ts, event_id) order across out-of-order batches, and the emitted
    bar matches the batch computation exactly."""
    from kaflow_spark.streaming.windows import ohlc_aggs

    name = f"t_{uuid.uuid4().hex[:8]}"
    # batch 1: out-of-order arrivals within the 10:00-10:05 window
    _write_chunk(
        spark,
        tdir,
        [
            (2, _ts("2024-01-01 10:03:00"), 1, 9.0),   # high
            (1, _ts("2024-01-01 10:00:30"), 1, 4.0),   # open (earliest ts)
        ],
    )
    agg = tumbling(
        _stream(spark, tdir),
        "ts",
        "5 minutes",
        keys=["user_id"],
        aggs=ohlc_aggs("value", "ts", "event_id"),
        watermark="10 minutes",
    )
    q = _run_query(agg, "append", name)
    try:
        q.processAllAvailable()
        # batch 2: a later-arriving event with an EARLIER close position
        # than event 2? No - ts 10:04 is the latest, so it becomes close;
        # also the low of the bar.
        _write_chunk(spark, tdir, [(3, _ts("2024-01-01 10:04:00"), 1, 2.0)])
        q.processAllAvailable()
        # batch 3: watermark push closes the window
        _write_chunk(spark, tdir, [(9, _ts("2024-01-01 11:00:00"), 1, 5.0)])
        q.processAllAvailable()
        rows = [
            r
            for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r["window_start"].minute == 0 and r["window_start"].hour == 10
        ]
        assert len(rows) == 1
        bar = rows[0]
        assert bar["open_v"] == 4.0
        assert bar["high_v"] == 9.0
        assert bar["low_v"] == 2.0
        assert bar["close_v"] == 2.0
        assert bar["n_events"] == 3
    finally:
        q.stop()


def test_streaming_zscore_anomalies_flags_outlier(spark, tdir):
    from kaflow_spark.streaming.stateful import streaming_zscore_anomalies

    name = f"z_{uuid.uuid4().hex[:8]}"
    ddl = "event_id bigint, event_type string, value double"
    path = tdir

    def chunk(rows):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode("append").parquet(path)

    # batch 1: 40 near-constant values — nothing flagged
    chunk([(i, "t", 10.00 + (i % 3) / 100.0) for i in range(40)])
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(path)
    )
    out = streaming_zscore_anomalies(stream, "event_type")
    q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
    try:
        q.processAllAvailable()
        assert spark.sql(f"SELECT * FROM {name}").count() == 0
        # batch 2: one wild value against the accumulated state
        chunk([(99, "t", 500.00)])
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        assert [(r["event_id"], r["value_cents"]) for r in rows] == [(99, 50000)]
    finally:
        q.stop()


def test_streaming_zscore_batch_fallback_matches_q132(spark, sf_dir):
    """One definition, two postures: the batch fallback IS q132."""
    from kaflow_spark.catalog import load
    from kaflow_spark.streaming.stateful import streaming_zscore_anomalies
    from kaflow_spark.operators.events import zscore_anomalies

    e = load(spark, sf_dir, "events")
    a = sorted(tuple(r) for r in streaming_zscore_anomalies(e, "event_type").collect())
    b = sorted(tuple(r) for r in zscore_anomalies(e, "event_type").collect())
    assert a == b


def test_streaming_value_trend_converges_to_batch(spark, tdir):
    """After all batches arrive, the streamed slope equals the batch
    operator over the same rows (mergeable sufficient statistics)."""
    from kaflow_spark.streaming.stateful import streaming_value_trend
    from kaflow_spark.operators.events import value_trend

    name = f"vt_{uuid.uuid4().hex[:8]}"
    ddl = "event_id bigint, event_type string, ts timestamp, value double"
    rows1 = [(d, "t", _ts(f"2024-01-{d+1:02d} 00:00:00"), 1.00 + 0.25 * d)
             for d in range(4)]
    rows2 = [(d, "t", _ts(f"2024-01-{d+1:02d} 00:00:00"), 1.00 + 0.25 * d)
             for d in range(4, 8)]
    spark.createDataFrame(rows1, ddl).coalesce(1).write.mode("append").parquet(tdir)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_value_trend(stream, "event_type")
    q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, ddl).coalesce(1).write.mode("append").parquet(tdir)
        q.processAllAvailable()
        last = spark.sql(
            f"SELECT * FROM {name} ORDER BY n DESC LIMIT 1"
        ).collect()[0]
        batch = value_trend(
            spark.createDataFrame(rows1 + rows2, ddl), "event_type"
        ).collect()[0]
        assert last["n"] == batch["n"] == 8
        assert last["slope_cents_per_day"] == batch["slope_cents_per_day"] == 25.0
    finally:
        q.stop()


def test_streaming_cents_match_batch_decimal_cast(spark):
    """Regression (review-caught): streaming cents must match Spark's
    CAST(double AS DECIMAL(18,2))*100 — HALF_UP on the shortest
    decimal representation. (v*100).round() fails both on half-cents
    (numpy half-even: 10.125 -> 1012) and on binary drift
    (0.615*100 = 61.4999… -> 61)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from kaflow_spark.streaming.stateful import _cents_half_up

    vals = [10.125, 0.615, -10.125, 2.675, 185.22, 0.005, -0.005]
    got = list(_cents_half_up(pd.Series(vals)))
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    want = [
        r["c"]
        for r in df.select(
            (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("c")
        ).collect()
    ]
    assert got == want, (got, want)


def test_streaming_gapfill_locf_backfills_silent_hours(spark, tdir):
    """Two batches: hours 10:xx and 13:xx — closing hour 10 emits its
    exact sum, hours 11 and 12 backfill as gaps repeating it."""
    from kaflow_spark.streaming.stateful import streaming_gapfill_locf

    name = f"gf_{uuid.uuid4().hex[:8]}"
    ddl = "event_id bigint, event_type string, ts timestamp, value double"

    def chunk(rows):
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode("append").parquet(tdir)

    chunk([
        (1, "t", _ts("2024-01-01 10:05:00"), 1.25),
        (2, "t", _ts("2024-01-01 10:40:00"), 2.00),
    ])
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_gapfill_locf(stream, "event_type")
    q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
    try:
        q.processAllAvailable()
        assert spark.sql(f"SELECT * FROM {name}").count() == 0  # hour still open
        chunk([(3, "t", _ts("2024-01-01 13:10:00"), 9.99)])
        q.processAllAvailable()
        rows = spark.sql(
            f"SELECT hour, filled_cents, is_gap FROM {name} ORDER BY hour"
        ).collect()
        got = [(r["hour"].hour, r["filled_cents"], r["is_gap"]) for r in rows]
        assert got == [(10, 325, False), (11, 325, True), (12, 325, True)]
    finally:
        q.stop()


def test_gapfill_timeout_branch_flushes_open_hour():
    """Direct kernel test of the flush-on-timeout contract (the
    sandbox's PySpark hangs on real ProcessingTimeTimeout eviction —
    minimal upstream repro hangs identically — so the branch is
    driven against a fake GroupState)."""
    from kaflow_spark.streaming.stateful import _gapfill_update

    class FakeState:
        def __init__(self, value):
            self._v = value
            self.hasTimedOut = True
            self.removed = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def remove(self):
            self.removed = True

    update = _gapfill_update("event_type", "ts", "value", timeout_ms=200)
    # open hour accumulated -> flushed exactly once, not a gap
    st = FakeState((36000, 325))
    out = list(update(("quiet",), iter([]), st))
    assert st.removed and len(out) == 1
    row = out[0].iloc[0]
    assert row["filled_cents"] == 325 and not row["is_gap"]
    assert row["hour"] == __import__("pandas").Timestamp(36000, unit="s")
    # no state -> nothing to flush
    st2 = FakeState(None)
    assert list(update(("quiet",), iter([]), st2)) == [] and st2.removed


def test_streaming_scd2_closes_runs_across_batches(spark, tdir):
    from kaflow_spark.streaming.stateful import streaming_scd2
    from kaflow_spark.operators.events import scd2_intervals

    name = f"sc_{uuid.uuid4().hex[:8]}"
    ddl = "event_id bigint, user_id bigint, event_type string, ts timestamp"
    rows1 = [
        (1, 7, "view", _ts("2024-01-01 10:00:00")),
        (2, 7, "view", _ts("2024-01-01 10:05:00")),
    ]
    rows2 = [
        (3, 7, "click", _ts("2024-01-01 10:10:00")),
        (4, 7, "purchase", _ts("2024-01-01 10:20:00")),
    ]
    spark.createDataFrame(rows1, ddl).coalesce(1).write.mode("append").parquet(tdir)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_scd2(stream, "user_id", "event_type")
    q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
    try:
        q.processAllAvailable()
        assert spark.sql(f"SELECT * FROM {name}").count() == 0  # run open
        spark.createDataFrame(rows2, ddl).coalesce(1).write.mode("append").parquet(tdir)
        q.processAllAvailable()
        got = sorted(
            (r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        # the CLOSED intervals must equal the batch operator's closed rows
        batch = scd2_intervals(
            spark.createDataFrame(rows1 + rows2, ddl), "user_id", "event_type"
        ).filter("valid_to IS NOT NULL")
        want = sorted(
            (r["event_type"], r["valid_from"], r["valid_to"], r["n_events"])
            for r in batch.collect()
        )
        assert got == want and len(got) == 2  # view run + click run closed
    finally:
        q.stop()


def test_scd2_timeout_branch_flushes_current_run():
    """Kernel test: eviction flushes the open run as CURRENT
    (valid_to null) — fake GroupState, same sandbox gate as gapfill."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _scd2_update

    class FakeState:
        def __init__(self, v):
            self._v, self.hasTimedOut, self.removed = v, True, False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def remove(self):
            self.removed = True

    update = _scd2_update("user_id", "event_type", "ts", "event_id", 200)
    st = FakeState(("view", 1_700_000_000_000_000, 3))
    out = list(update((7,), iter([]), st))
    assert st.removed and len(out) == 1
    row = out[0].iloc[0]
    assert row["event_type"] == "view" and row["n_events"] == 3
    assert pd.isna(row["valid_to"])


def test_streaming_cusum_converges_to_batch(spark, tdir):
    """After the stream closes, the final emission equals the batch
    cusum_shifts row-for-row on the same data — including a period
    whose total arrives SPLIT across two micro-batches (the upstream
    per-period aggregation is distributive, so partials accumulate in
    state)."""
    from kaflow_spark.streaming.stateful import streaming_cusum
    from kaflow_spark.operators.events import cusum_shifts

    ddl = "g string, day bigint, cents bigint"
    rows1 = [("t", d, 100) for d in range(5)] + [("t", 4, 60)]
    rows2 = [("t", 4, 40)] + [("t", d, 200) for d in range(5, 10)]
    spark.createDataFrame(rows1, ddl).coalesce(1).write.mode("append").parquet(tdir)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_cusum(stream, "g", "day", "cents", pct=10)
    results = {}
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(
            lambda bdf, bid: results.__setitem__(bid, bdf.collect())
        )
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, ddl).coalesce(1).write.mode(
            "append"
        ).parquet(tdir)
        q.processAllAvailable()
    finally:
        q.stop()
    final = sorted(tuple(r) for r in results[max(results)])
    batch_in = (
        spark.createDataFrame(rows1 + rows2, ddl)
        .groupBy("g", "day")
        .agg(F.sum("cents").alias("cents"))
    )
    want = sorted(
        tuple(r)
        for r in cusum_shifts(batch_in, "g", "day", "cents", pct=10)
        .select("g", "day", "cents", "cusum_pos", "cusum_neg", "shift_flag")
        .collect()
    )
    assert final == want and len(want) == 10
    # the detector actually fired on the level shift
    assert any(r[5] for r in want)


def test_cusum_kernel_state_mechanics():
    """Direct kernel drive with a fake GroupState: empty-state output
    equals the batch operator, same-period partials accumulate, and
    the timeout branch evicts (the sandbox PySpark hangs on real
    ProcessingTimeTimeout eviction — kernel tested directly)."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _cusum_update

    class FakeState:
        def __init__(self, value, timed_out=False):
            self._v = value
            self.hasTimedOut = timed_out
            self.removed = False
            self.updated = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.updated = v

        def remove(self):
            self.removed = True

    update = _cusum_update("g", "day", "cents", 10, None)
    # hand case: [10, 10, 40] -> N=3 T=60, devs (-30,-30,60),
    # S (-30,-60,0), pos (0,0,60), neg (30,60,0)
    st = FakeState(None)
    pdf = pd.DataFrame({"day": [0, 1, 2, 2], "cents": [10, 10, 15, 25]})
    out = list(update(("t",), iter([pdf]), st))
    assert st.updated == ([0, 1, 2], [10, 10, 40])
    got = out[0]
    assert list(got["cusum_pos"]) == [0, 0, 60]
    assert list(got["cusum_neg"]) == [30, 60, 0]
    # second batch merges into existing state arrays
    st2 = FakeState(([0, 1, 2], [10, 10, 40]))
    out2 = list(
        update(("t",), iter([pd.DataFrame({"day": [2], "cents": [10]})]), st2)
    )
    assert st2.updated == ([0, 1, 2], [10, 10, 50])
    assert len(out2[0]) == 3
    # timeout branch: evict, emit nothing
    st3 = FakeState(([0], [5]), timed_out=True)
    assert list(update(("t",), iter([]), st3)) == [] and st3.removed


def test_streaming_cusum_batch_fallback_matches_q179_operator(spark):
    """On a batch frame streaming_cusum IS the batch operator."""
    from kaflow_spark.operators.events import cusum_shifts
    from kaflow_spark.streaming.stateful import streaming_cusum

    ddl = "g string, day bigint, cents bigint"
    rows = [("t", d, 100 if d < 5 else 200) for d in range(10)]
    df = spark.createDataFrame(rows, ddl)
    a = sorted(tuple(r) for r in streaming_cusum(df, "g", "day", "cents").collect())
    b = sorted(tuple(r) for r in cusum_shifts(df, "g", "day", "cents").collect())
    assert a == b and len(a) == 10


def test_cusum_kernel_horizon_bounds_state():
    """Round 9: with a retention horizon the kernel evicts periods
    that fell out of the trailing window — state stays bounded across
    an unbounded period stream, and the emitted (windowed-CUSUM)
    series equals the batch operator over the trailing periods."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _cusum_update

    class FakeState:
        def __init__(self, value):
            self._v = value
            self.hasTimedOut = False
            self.updated = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.updated = v
            self._v = v

        def remove(self):
            self._v = None

    update = _cusum_update("g", "day", "cents", 10, None, horizon=5)
    st = FakeState(None)
    last = None
    # 50 periods, one batch each: state must never exceed 5 entries
    for d in range(50):
        out = list(
            update(
                ("t",),
                iter([pd.DataFrame({"day": [d], "cents": [100 + d]})]),
                st,
            )
        )
        assert len(st.updated[0]) <= 5
        last = out[0]
    assert sorted(last["day"]) == [45, 46, 47, 48, 49]


def test_streaming_cusum_horizon_matches_batch_on_trailing_window(spark):
    """Closed stream with horizon == batch operator restricted to each
    group's trailing-horizon periods (both postures via the same
    function: the batch fallback applies the same trailing filter)."""
    from kaflow_spark.operators.events import cusum_shifts
    from kaflow_spark.streaming.stateful import (
        _cusum_update,
        streaming_cusum,
    )
    import pandas as pd

    ddl = "g string, day bigint, cents bigint"
    rows = [("t", d, 100 if d < 12 else 300) for d in range(15)]

    # batch fallback with horizon
    df = spark.createDataFrame(rows, ddl)
    got = sorted(
        tuple(r)
        for r in streaming_cusum(
            df, "g", "day", "cents", pct=10, horizon=6
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in cusum_shifts(
            df.filter("day > 8"), "g", "day", "cents", pct=10
        ).collect()
    )
    assert got == want and len(got) == 6

    # kernel fed batch-by-batch converges to the same trailing answer
    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

    update = _cusum_update("g", "day", "cents", 10, None, horizon=6)
    st = FakeState()
    last = None
    for _, d, c in rows:
        out = list(
            update(("t",), iter([pd.DataFrame({"day": [d], "cents": [c]})]), st)
        )
        last = out[0]
    stream_final = sorted(
        (r.day, r.cents, r.cusum_pos, r.cusum_neg, r.shift_flag)
        for r in last.itertuples()
    )
    batch_final = sorted((t[1], t[2], t[3], t[4], t[5]) for t in want)
    assert stream_final == batch_final


def test_streaming_spike_converges_to_batch(spark, tdir):
    """Round 9: streaming spike monitor — after the stream closes the
    latest emission per (group, day) equals the batch spike_days
    operator row-for-row, including a day whose total arrives split
    across micro-batches."""
    from kaflow_spark.operators.events import spike_days
    from kaflow_spark.streaming.stateful import streaming_spike

    ddl = "g string, day bigint, cents bigint"
    rows1 = [("t", d, 100 + (d % 3)) for d in range(6)] + [("t", 6, 70)]
    rows2 = [("t", 6, 80)] + [("t", 7, 500), ("t", 8, 101), ("t", 9, 99)]
    spark.createDataFrame(rows1, ddl).coalesce(1).write.mode("append").parquet(tdir)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_spike(stream, "g", "day", "cents")
    latest = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            latest[(r["g"], r["day"])] = (
                r["cents"], r["baseline_med"], r["ratio_bp"], r["spike"]
            )

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, ddl).coalesce(1).write.mode(
            "append"
        ).parquet(tdir)
        q.processAllAvailable()
    finally:
        q.stop()
    batch_in = (
        spark.createDataFrame(rows1 + rows2, ddl)
        .groupBy("g", "day")
        .agg(F.sum("cents").alias("cents"))
    )
    want = {
        (r["g"], r["day"]): (
            r["cents"], r["baseline_med"], r["ratio_bp"], r["spike"]
        )
        for r in spike_days(batch_in, "g", "day", "cents").collect()
    }
    assert latest == want and len(want) >= 5
    # the planted 5x day actually flags
    assert latest[("t", 7)][3] is True
    # the split-arrival day accumulated to 150 (not 80)
    assert latest[("t", 6)][0] == 150


def test_spike_kernel_state_bounded_and_windowed():
    """Kernel drive with a fake GroupState: state never exceeds the
    15 trailing periods (8 emittable + 7 baseline — no horizon knob),
    and the baseline excludes the current day."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _spike_update

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False
            self.updated = None

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.updated = v
            self._v = v

        def remove(self):
            self._v = None

    update = _spike_update("g", "day", "cents", 13, 3, None)
    st = FakeState()
    last = None
    for d in range(40):
        out = list(
            update(
                ("t",),
                iter([pd.DataFrame({"day": [d], "cents": [100]})]),
                st,
            )
        )
        assert len(st.updated[0]) <= 15
        if out:
            last = out[0]
    # steady state: flat series, ratio 10000, no spikes
    assert list(last["ratio_bp"]) == [10000] * len(last)
    assert not any(last["spike"])


def test_spike_kernel_negative_values_truncating_division():
    """Negative day values (anticipated in q199's docs: refunds can
    drive a day's cents negative) must ratio with truncate-toward-zero
    division, matching the batch operator's Spark `div` and the q200
    oracle's DuckDB integer `//` — Python's floor `//` would be off by
    one basis point on every negative day."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _spike_update

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

    update = _spike_update("g", "day", "cents", 13, 3, None)
    st = FakeState()
    # baseline of 3 days at 7, then a day at -5: Spark/DuckDB give
    # -50000 div/ // 7 = -7142 (truncate); Python floor gives -7143
    series = [(0, 7), (1, 7), (2, 7), (3, -5)]
    last = None
    for d, v in series:
        out = list(
            update(
                ("t",),
                iter([pd.DataFrame({"day": [d], "cents": [v]})]),
                st,
            )
        )
        if out:
            last = out[0]
    by_day = dict(zip(last["day"], last["ratio_bp"]))
    assert by_day[3] == -7142  # truncating; floor division says -7143
    assert -(-(-5 * 10000) // 7) == -7142 and (-5 * 10000) // 7 == -7143


def test_streaming_wau_converges_to_batch(spark, tdir):
    """Round 10: streaming rolling-WAU — after the stream closes the
    latest emission per (group, day) equals the batch rolling_wau
    operator row-for-row, including duplicate activity rows split
    across micro-batches."""
    from kaflow_spark.operators.events import rolling_wau
    from kaflow_spark.streaming.stateful import streaming_wau

    ddl = "g string, day bigint, user bigint"
    rows1 = [
        ("t", d, u) for d in range(5) for u in range(d + 1)
    ] + [("t", 2, 0)]  # duplicate activity: must not double-count
    rows2 = [("t", 5, 9), ("t", 7, 1), ("t", 7, 2), ("t", 8, 1)]
    spark.createDataFrame(rows1, ddl).coalesce(1).write.mode("append").parquet(tdir)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_wau(stream, "g", "day", "user")
    latest = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            latest[(r["g"], r["day"])] = r["wau"]

    q = out.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, ddl).coalesce(1).write.mode(
            "append"
        ).parquet(tdir)
        q.processAllAvailable()
    finally:
        q.stop()
    batch_in = spark.createDataFrame(rows1 + rows2, ddl).distinct()
    want = {
        (r["g"], r["day"]): r["wau"]
        for r in rolling_wau(batch_in, "g", "day", "user").collect()
    }
    assert latest == want and len(want) >= 7
    # day 7: users {1, 2} active that day; window [1..7] also covers
    # users from days 1-5
    assert latest[("t", 7)] == len(
        {u for _, d, u in rows1 + rows2 if 1 <= d <= 7}
    )


def test_streaming_returning_rate_converges_to_batch(spark, tdir):
    """Round 10: streaming returning-user rate — closed stream ==
    batch returning_rate row-for-row across all four output columns."""
    from kaflow_spark.operators.events import returning_rate
    from kaflow_spark.streaming.stateful import streaming_returning_rate

    ddl = "g string, day bigint, user bigint"
    rows1 = [("t", 0, 1), ("t", 0, 2), ("t", 1, 1), ("t", 2, 3)]
    rows2 = [("t", 3, 1), ("t", 3, 4), ("t", 4, 2), ("t", 4, 3)]
    spark.createDataFrame(rows1, ddl).coalesce(1).write.mode("append").parquet(tdir)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_returning_rate(stream, "g", "day", "user", past=28)
    latest = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            latest[(r["g"], r["day"])] = (
                r["n_active"], r["n_returning"], r["returning_bp"]
            )

    q = out.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, ddl).coalesce(1).write.mode(
            "append"
        ).parquet(tdir)
        q.processAllAvailable()
    finally:
        q.stop()
    batch_in = spark.createDataFrame(rows1 + rows2, ddl).distinct()
    want = {
        (r["g"], r["day"]): (
            r["n_active"], r["n_returning"], r["returning_bp"]
        )
        for r in returning_rate(batch_in, "g", "day", "user", past=28).collect()
    }
    assert latest == want and len(want) == 5
    # day 0: nobody has a past; day 1: user 1 returns (1/1); day 4:
    # users 2 and 3 both returning (2/2)
    assert latest[("t", 0)] == (2, 0, 0)
    assert latest[("t", 1)] == (1, 1, 10000)
    assert latest[("t", 4)] == (2, 2, 10000)


class _FakeGroupState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.updated = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.updated = v
        self._v = v

    def remove(self):
        self._v = None


def test_activity_kernel_state_bounded():
    """Kernel drive with a fake GroupState: the (user, day) pair set
    never spans more than emit_horizon + lookback trailing days, for
    both modes, across 80 days of per-day activity."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _activity_update

    for mode, span, bound in (("wau", 7, 8 + 6), ("returning", 28, 8 + 28)):
        update = _activity_update("g", "day", "user", mode, span, 8, None)
        st = _FakeGroupState()
        for d in range(80):
            pdf = pd.DataFrame({"day": [d] * 3, "user": [d % 5, 7, 9]})
            list(update(("t",), iter([pdf]), st))
            users, days = st.updated
            assert len(set(days)) <= bound, (mode, d)
            assert max(days) - min(days) < bound, (mode, d)
        # steady state: 3 distinct users active every day
        assert len(set(zip(users, days))) <= 3 * bound + 2


def test_activity_kernel_wau_counts_window_exactly():
    """WAU at day d counts distinct users over [d-6, d] only — a user
    last seen 7 days ago is out."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _activity_update

    update = _activity_update("g", "day", "user", "wau", 7, 8, None)
    st = _FakeGroupState()
    list(update(("t",), iter([pd.DataFrame({"day": [0], "user": [1]})]), st))
    out = list(
        update(("t",), iter([pd.DataFrame({"day": [6, 7], "user": [2, 3]})]), st)
    )[0]
    got = dict(zip(out["day"], out["wau"]))
    assert got[6] == 2  # users 1 (day 0) and 2 (day 6) within [0..6]
    assert got[7] == 2  # user 1 aged out of [1..7]; users 2, 3 in


def test_streaming_growth_converges_to_batch(spark, tdir):
    """Round 10: streaming growth accounting — closed stream == batch
    growth_accounting row-for-row across all five cohort counts,
    including a resurrection (gap > 1 day) split across batches."""
    from kaflow_spark.operators.events import growth_accounting
    from kaflow_spark.streaming.stateful import streaming_growth

    ddl = "g string, day bigint, user bigint"
    rows1 = [("t", 0, 1), ("t", 0, 2), ("t", 1, 1), ("t", 1, 3)]
    rows2 = [("t", 2, 1), ("t", 3, 2), ("t", 3, 4), ("t", 4, 2)]
    spark.createDataFrame(rows1, ddl).coalesce(1).write.mode("append").parquet(tdir)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_growth(stream, "g", "day", "user")
    latest = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            latest[(r["g"], r["day"])] = (
                r["n_active"], r["n_new"], r["n_retained"],
                r["n_resurrected"], r["n_churned"],
            )

    q = out.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, ddl).coalesce(1).write.mode(
            "append"
        ).parquet(tdir)
        q.processAllAvailable()
    finally:
        q.stop()
    batch_in = spark.createDataFrame(rows1 + rows2, ddl).distinct()
    want = {
        (r["g"], r["day"]): (
            r["n_active"], r["n_new"], r["n_retained"],
            r["n_resurrected"], r["n_churned"],
        )
        for r in growth_accounting(batch_in, "g", "day", "user").collect()
    }
    assert latest == want and len(want) == 5
    # identity on every row; day 3: user 2 RESURRECTED (last seen day
    # 0), user 4 new; day 2's churn = users 2... no: day 1 actives
    # {1,3}, day 2 active {1} -> churned = 1 (user 3)
    for v in latest.values():
        assert v[1] + v[2] + v[3] == v[0], v
    assert latest[("t", 0)] == (2, 2, 0, 0, 0)
    assert latest[("t", 3)] == (2, 1, 0, 1, 1)


def test_growth_kernel_state_shape():
    """Kernel drive: the recency component never spans more than
    emit_horizon + 1 trailing days; the first-seen component is
    exactly one entry per distinct user ever seen (the statistic's
    intrinsic floor)."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _growth_update

    update = _growth_update("g", "day", "user", 8, None)
    st = _FakeGroupState()
    for d in range(60):
        pdf = pd.DataFrame({"day": [d] * 2, "user": [d % 7, 100 + d]})
        out = list(update(("t",), iter([pdf]), st))
        fu, fd, ru, rd = st.updated
        assert len(set(rd)) <= 9, d
        assert len(fu) == len(set(fu))
        if out:
            o = out[0]
            for i in range(len(o)):
                assert (
                    o["n_new"][i] + o["n_retained"][i]
                    + o["n_resurrected"][i] == o["n_active"][i]
                )
    # 7 rotating + 60 unique users ever seen
    assert len(fu) == 7 + 60


def test_streaming_stickiness_converges_to_batch(spark, tdir):
    """Round 10: streaming DAU/MAU — closed stream == the batch q210
    kernel row-for-row across dau/mau/bp."""
    from kaflow_spark.streaming.stateful import streaming_stickiness

    ddl = "g string, day bigint, user bigint"
    rows1 = [("t", 0, 1), ("t", 0, 2), ("t", 1, 1)]
    rows2 = [("t", 2, 3), ("t", 3, 1), ("t", 3, 4)]
    spark.createDataFrame(rows1, ddl).coalesce(1).write.mode("append").parquet(tdir)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_stickiness(stream, "g", "day", "user", window=28)
    latest = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            latest[(r["g"], r["day"])] = (
                r["dau"], r["mau"], r["stickiness_bp"]
            )

    q = out.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, ddl).coalesce(1).write.mode(
            "append"
        ).parquet(tdir)
        q.processAllAvailable()
    finally:
        q.stop()
    batch_in = spark.createDataFrame(rows1 + rows2, ddl)
    want = {
        (r["g"], r["day"]): (r["dau"], r["mau"], r["stickiness_bp"])
        for r in streaming_stickiness(
            batch_in, "g", "day", "user", window=28
        ).collect()
    }
    assert latest == want and len(want) == 4
    # day 3: dau=2 (users 1, 4); mau=4 (users 1-4 within 28 days)
    assert latest[("t", 3)] == (2, 4, 5000)


# ---- round 11: out-of-order / late-arrival semantics for KPI twins ------
#
# Documented contract of the _activity_update family (wau /
# stickiness / returning) and _growth_update:
# - a late (user, day) pair whose day is still RETAINED (within
#   emit_horizon + lookback of the group's newest day) is absorbed:
#   its day and every retained day whose look-back covers it are
#   re-emitted corrected (update mode: latest emission wins);
# - a pair older than the retention boundary is DROPPED: no state
#   growth, no emission for that day, no perturbation of newer rows
#   (pair with an upstream watermark to bound how late that can be);
# - _growth_update's first-seen floor still LEARNS from a too-late
#   pair (cheap, one entry per user ever) so a later resurrection
#   classifies against the true first day.


def test_activity_kernel_late_day_within_horizon_corrects():
    """WAU: a late user for an already-emitted (but retained) day
    corrects that day AND every retained day whose 7-day window
    covers it."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _activity_update

    update = _activity_update("g", "day", "user", "wau", 7, 8, None)
    st = _FakeGroupState()
    b1 = pd.DataFrame({"day": list(range(10)), "user": list(range(100, 110))})
    out1 = list(update(("t",), iter([b1]), st))[0]
    first = dict(zip(out1["day"], out1["wau"]))
    # late arrival: user 999 on day 5 (retained: 5 > 9 - 8)
    b2 = pd.DataFrame({"day": [5], "user": [999]})
    out2 = list(update(("t",), iter([b2]), st))[0]
    got = dict(zip(out2["day"], out2["wau"]))
    pairs = {(100 + d, d) for d in range(10)} | {(999, 5)}
    for d in got:
        want = len({u for u, dd in pairs if d - 6 <= dd <= d})
        assert got[d] == want, (d, got[d], want)
    # every day whose window covers day 5 moved up by exactly one
    for d in range(5, 10):
        assert got[d] == first[d] + 1, d


def test_activity_kernel_too_late_day_dropped():
    """A pair older than the retention boundary is dropped: no state
    growth, no emission for it, newer rows unchanged."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _activity_update

    for mode, span in (("wau", 7), ("stickiness", 28), ("returning", 28)):
        lookback = span - 1 if mode in ("wau", "stickiness") else span
        update = _activity_update("g", "day", "user", mode, span, 8, None)
        st = _FakeGroupState()
        b1 = pd.DataFrame({"day": [0, 40], "user": [1, 2]})
        list(update(("t",), iter([b1]), st))
        users0, days0 = st.updated
        assert 0 not in days0  # day 0 already beyond 40's retention
        stale = 40 - (8 + lookback)  # exactly AT the boundary: evicted
        b2 = pd.DataFrame({"day": [stale], "user": [77]})
        out2 = list(update(("t",), iter([b2]), st))
        users1, days1 = st.updated
        assert stale not in days1 and 77 not in users1, mode
        assert sorted(zip(users1, days1)) == sorted(zip(users0, days0))
        emitted_days = set(out2[0]["day"]) if out2 else set()
        assert stale not in emitted_days, mode
        # the retained newest day is re-emitted unperturbed
        if mode == "wau":
            assert dict(zip(out2[0]["day"], out2[0]["wau"]))[40] == 1


def test_activity_kernel_out_of_order_batches_converge():
    """Returning rate: batch 2 delivers OLDER days than batch 1 (all
    within the horizon) — the late look-back data corrects already-
    emitted newer days, and the final answer equals the from-scratch
    computation on the union."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _activity_update

    update = _activity_update("g", "day", "user", "returning", 28, 8, None)
    st = _FakeGroupState()
    b1 = pd.DataFrame({"day": [8, 8], "user": [1, 2]})
    out1 = list(update(("t",), iter([b1]), st))[0]
    r1 = {
        d: (a, r, bp)
        for d, a, r, bp in zip(
            out1["day"], out1["n_active"], out1["n_returning"],
            out1["returning_bp"],
        )
    }
    assert r1[8] == (2, 0, 0)  # nobody has history yet
    # out-of-order: day 3 arrives after day 8 (retained: 3 > 8 - 8)
    b2 = pd.DataFrame({"day": [3], "user": [1]})
    out2 = list(update(("t",), iter([b2]), st))[0]
    r2 = {
        d: (a, r, bp)
        for d, a, r, bp in zip(
            out2["day"], out2["n_active"], out2["n_returning"],
            out2["returning_bp"],
        )
    }
    # day 8 re-emitted corrected: user 1 now has day-3 history
    assert r2[8] == (2, 1, 5000)
    assert r2[3] == (1, 0, 0)


def test_growth_kernel_late_pair_drops_recency_keeps_first_seen():
    """Growth: a too-late pair contributes nothing to the recency
    component (no emission, no state growth there) but DOES seed the
    first-seen floor, so the user's eventual return classifies as
    resurrected — not new."""
    import pandas as pd
    from kaflow_spark.streaming.stateful import _growth_update

    update = _growth_update("g", "day", "user", 8, None)
    st = _FakeGroupState()
    b1 = pd.DataFrame({"day": [40], "user": [1]})
    list(update(("t",), iter([b1]), st))
    # day 5 is far beyond the recency horizon (40 - 9)
    b2 = pd.DataFrame({"day": [5], "user": [9]})
    out2 = list(update(("t",), iter([b2]), st))
    fu, fd, ru, rd = st.updated
    assert 9 in fu and dict(zip(fu, fd))[9] == 5  # floor learned
    assert 5 not in rd  # recency dropped
    emitted = set(out2[0]["day"]) if out2 else set()
    assert 5 not in emitted
    # user 9 comes back on day 41: resurrected (first day 5 < 40),
    # NOT new — the learned floor is load-bearing
    b3 = pd.DataFrame({"day": [41], "user": [9]})
    out3 = list(update(("t",), iter([b3]), st))[0]
    row = {d: i for i, d in enumerate(out3["day"])}
    i = row[41]
    assert out3["n_resurrected"][i] == 1 and out3["n_new"][i] == 0


def test_streaming_wau_out_of_order_files_converge(spark, tdir):
    """Engine-level: micro-batches interleave days ACROSS groups and
    arrive out of order (file 2 older than file 1, within horizon);
    final latest-emission-per-(group, day) equals the batch operator
    on the union."""
    from kaflow_spark.operators.events import rolling_wau
    from kaflow_spark.streaming.stateful import streaming_wau

    ddl = "g string, day bigint, user bigint"
    rows1 = [("a", 6, 1), ("b", 3, 1), ("a", 7, 2)]
    rows2 = [("a", 2, 3), ("b", 1, 2), ("a", 3, 1)]  # older, retained
    spark.createDataFrame(rows1, ddl).coalesce(1).write.mode("append").parquet(tdir)
    stream = (
        spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_wau(stream, "g", "day", "user")
    latest = {}

    def sink(bdf, bid):
        for r in bdf.collect():
            latest[(r["g"], r["day"])] = r["wau"]

    q = out.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, ddl).coalesce(1).write.mode(
            "append"
        ).parquet(tdir)
        q.processAllAvailable()
    finally:
        q.stop()
    batch_in = spark.createDataFrame(rows1 + rows2, ddl).distinct()
    want = {
        (r["g"], r["day"]): r["wau"]
        for r in rolling_wau(batch_in, "g", "day", "user").collect()
    }
    assert latest == want and len(want) == 6
