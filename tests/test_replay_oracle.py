"""Round 9: close the stream-to-oracle loop DRIVER-STYLE.

The streaming twins are elsewhere asserted equal to their batch
operators; here a fixture events archive goes through the FULL app
replay surface (``App.run_replay``: envelope archive -> consume ->
sink parquet), the replayed sink bytes are parsed and driven through
``streaming_cusum`` as a REAL multi-batch stream, and the closed
stream's final answer is hashed against q179's DuckDB oracle SQL with
the driver's own pandas canonicalization (sort columns, stringify,
sha256) — the same gate CORRECTNESS_r{N} applies to batch queries.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from kaflow_spark.app import App, Message
from kaflow_spark.params import FromValue, Str


def _canon_hash(df: pd.DataFrame) -> str:
    """The driver harness's canonicalization: name-sorted columns,
    row-sorted values, cell-wise stringify, sha256 (driver_sim's
    _canon)."""
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols).reset_index(drop=True)
    s = df.astype(str)
    h = hashlib.sha256()
    for row in s.itertuples(index=False):
        h.update(("\x1f".join(row) + "\n").encode())
    return h.hexdigest()


def test_replayed_stream_cusum_hashes_against_q179_oracle(
    spark, sf_dir, tmp_path
):
    from kaflow_spark.catalog import load
    from kaflow_spark.oracle import duckdb_connect
    from kaflow_spark.queries import REGISTRY
    from kaflow_spark.streaming.stateful import streaming_cusum

    # 1. archive the fixture events as consume envelopes (raw fields;
    #    the cents/day math happens downstream of the replay, exactly
    #    where a production pipeline would put it)
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    envelopes = ev.select(
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestamp_type"),
        F.lit(None).cast("binary").alias("key"),
        F.encode(
            F.to_json(
                F.struct(
                    "event_type",
                    F.col("ts").cast("long").alias("ts_s"),
                    F.col("value").cast("string").alias("value"),
                )
            ),
            "UTF-8",
        ).alias("value"),
        F.lit(None)
        .cast("array<struct<key: string, value: binary>>")
        .alias("headers"),
    )
    archive = str(tmp_path / "archive")
    envelopes.write.parquet(archive)

    # 2. full replay through the app surface (consume -> sink)
    app = App(name="oracle-replay")

    @app.consume(topic="events", sink_topics=("events.out",))
    def passthrough(v: FromValue[Str]) -> Message:
        return Message(value=v.encode())

    outdir = str(tmp_path / "replayed")
    app.run_replay(spark, archive, outdir, str(tmp_path / "ckpt"))

    # 3. stage the replayed bytes as a MULTI-FILE stream source and
    #    drive the streaming operator for real (availableNow, one
    #    micro-batch per file — partial day sums accumulate in state)
    parsed = (
        spark.read.parquet(f"{outdir}/out")
        .select(
            F.from_json(
                F.decode("value", "UTF-8"),
                "event_type string, ts_s long, value string",
            ).alias("j")
        )
        .select(
            F.col("j.event_type").alias("event_type"),
            F.expr("j.ts_s div 86400").cast("long").alias("day"),
            F.expr(
                "CAST(CAST(j.value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
    )
    staged = str(tmp_path / "staged")
    parsed.repartition(4).write.parquet(staged)
    stream = (
        spark.readStream.schema("event_type string, day long, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    out = streaming_cusum(stream, "event_type", "day", "cents", pct=10)
    latest: dict[tuple, tuple] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            latest[(r["event_type"], r["day"])] = r

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    got = pd.DataFrame(
        {
            "event_type": [k[0] for k in latest],
            "day": [
                pd.Timestamp(k[1], unit="D").date() for k in latest
            ],
            "day_cents": [int(v["cents"]) for v in latest.values()],
            "cusum_pos": [int(v["cusum_pos"]) for v in latest.values()],
            "cusum_neg": [int(v["cusum_neg"]) for v in latest.values()],
            "shift_flag": [bool(v["shift_flag"]) for v in latest.values()],
        }
    )

    # 4. driver-style gate: pandas-canon hash vs the DuckDB oracle
    con = duckdb_connect(sf_dir)
    try:
        want = con.sql(REGISTRY["q179_cusum_changepoints"].oracle).df()
    finally:
        con.close()
    assert len(got) == len(want) > 0
    assert _canon_hash(got) == _canon_hash(want)


def test_streamed_ks_monitor_hashes_against_q183_oracle(
    spark, sf_dir, tmp_path
):
    """Second stream-to-oracle gate (q183): one source's documents
    arrive as a single micro-batch into ks_monitor with the REST of
    the corpus as the static reference — exactly the group-vs-rest
    split q183 scores — and the emitted row is hashed against the
    oracle's row for that source with the driver's canonicalization."""
    from kaflow_spark.catalog import load
    from kaflow_spark.oracle import duckdb_connect
    from kaflow_spark.queries import REGISTRY
    from kaflow_spark.streaming.curation import ks_monitor

    d = load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    target = d.select(F.min("source").alias("s")).first()["s"]
    ref = d.filter(F.col("source") != target).select("n_chars")
    live_dir = str(tmp_path / "live")
    d.filter(F.col("source") == target).select("n_chars").coalesce(
        1
    ).write.parquet(live_dir)

    rows = []
    handle = ks_monitor(ref, "n_chars", on_result=lambda b, r: rows.append(r))
    stream = spark.readStream.schema("n_chars bigint").parquet(live_dir)
    q = (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    assert len(rows) == 1
    row = rows[0]
    got = pd.DataFrame(
        {
            "source": [target],
            "n_group": [int(row.n_group)],
            "n_rest": [int(row.n_rest)],
            "ks_bp": [int(row.ks_bp)],
        }
    )

    con = duckdb_connect(sf_dir)
    try:
        want = (
            con.sql(REGISTRY["q183_ks_drift"].oracle)
            .df()
            .query("source == @target")
            .reset_index(drop=True)
        )
    finally:
        con.close()
    assert list(sorted(want.columns)) == list(sorted(got.columns))
    assert _canon_hash(got) == _canon_hash(want[got.columns])
