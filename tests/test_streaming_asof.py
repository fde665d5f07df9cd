"""Streaming as-of join over the REAL events table (sf0.001).

Semantics under test: for every purchase event, attach the value of
the latest click by the same user at-or-before the purchase within a
tolerance horizon — the classic "state of X as of event Y" stream
enrichment. Correctness oracle: the equivalent batch computation on
the same rows. Emission: append mode, so rows flush only when the
watermark passes their event time — the test appends a far-future
sentinel to both inputs to drain everything (documented in
streaming/asof.py).
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import functions as F

from kaflow_spark.catalog import load
from kaflow_spark.streaming.asof import asof_join_stream

SF = "/root/testdata/sf0.001"
EV_DDL = "user_id bigint, ts timestamp, value double"
TOLERANCE = "3 days"


def test_streaming_asof_matches_batch_on_events(spark, tmp_path, sf_dir):
    ev = load(spark, sf_dir or SF, "events").select("user_id", "ts", "value", "event_type")
    purchases = ev.filter("event_type = 'purchase'").drop("event_type")
    clicks = ev.filter("event_type = 'click'").drop("event_type")

    p_path, c_path = str(tmp_path / "purchase"), str(tmp_path / "click")
    purchases.write.parquet(p_path)
    clicks.write.parquet(c_path)

    left = (
        spark.readStream.schema(EV_DDL).parquet(p_path)
        .withColumnRenamed("value", "p_value")
        .withWatermark("ts", "1 minute")
    )
    right = (
        spark.readStream.schema(EV_DDL).parquet(c_path)
        .withColumnRenamed("value", "click_value")
        .withColumnRenamed("ts", "click_ts")
        .withWatermark("click_ts", "1 minute")
    )
    out = asof_join_stream(
        left, right, "user_id", "ts", "click_ts",
        ["click_value"], tolerance=TOLERANCE,
    )
    name = f"asof_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    # the left payload column must pass through the aggregation
    assert "p_value" in out.columns
    try:
        q.processAllAvailable()
        # flush: a sentinel past every real event advances both
        # watermarks beyond max(ts), releasing all in-flight rows
        future = dt.datetime(2030, 1, 1)
        spark.createDataFrame([(0, future, 0.0)], EV_DDL).write.mode(
            "append"
        ).parquet(p_path)
        spark.createDataFrame([(0, future, 0.0)], EV_DDL).write.mode(
            "append"
        ).parquet(c_path)
        q.processAllAvailable()
        got = {
            (r["user_id"], r["ts"], r["click_value"], r["click_ts"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r["ts"] < future  # exclude the sentinel's own row
        }
    finally:
        q.stop()

    # batch oracle: same as-of definition on the same rows
    c = clicks.select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    j = purchases.join(c, "user_id").filter(
        (F.col("click_ts") <= F.col("ts"))
        & (F.col("click_ts") >= F.col("ts") - F.expr(f"INTERVAL {TOLERANCE}"))
    )
    want = {
        (r["user_id"], r["ts"], r["click_value"], r["click_ts"])
        for r in j.groupBy("user_id", "ts")
        .agg(
            F.max_by("click_value", "click_ts").alias("click_value"),
            F.max("click_ts").alias("click_ts"),
        )
        .collect()
    }
    assert len(want) > 0, "fixture must produce at least one as-of match"
    assert got == want


def test_streaming_asof_left_outer_emits_unmatched(spark, tmp_path):
    """how='leftOuter': a left row with no right match in the horizon
    emits null-padded once its state evicts."""
    import datetime as dt

    def ts(s):
        return dt.datetime.fromisoformat(s + "+00:00")

    l_path, r_path = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(
        [(1, ts("2024-01-01 10:10:00"), 1.0), (3, ts("2024-01-01 10:15:00"), 3.0)],
        EV_DDL,
    ).write.parquet(l_path)
    spark.createDataFrame(
        [(1, ts("2024-01-01 10:05:00"), 11.0)], EV_DDL
    ).write.parquet(r_path)

    left = (
        spark.readStream.schema(EV_DDL).parquet(l_path)
        .withColumnRenamed("value", "l_value")
        .withWatermark("ts", "1 minute")
    )
    right = (
        spark.readStream.schema(EV_DDL).parquet(r_path)
        .withColumnRenamed("value", "r_value")
        .withColumnRenamed("ts", "r_ts")
        .withWatermark("r_ts", "1 minute")
    )
    out = asof_join_stream(
        left, right, "user_id", "ts", "r_ts", ["r_value"],
        tolerance="30 minutes", how="leftOuter",
    )
    name = f"asof_lo_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        future = dt.datetime(2030, 1, 1)
        for p in (l_path, r_path):
            spark.createDataFrame([(0, future, 0.0)], EV_DDL).write.mode(
                "append"
            ).parquet(p)
        q.processAllAvailable()
        q.processAllAvailable()
        got = {
            (r["user_id"], r["r_value"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r["ts"] < future
        }
    finally:
        q.stop()
    assert got == {(1, 11.0), (3, None)}


def test_streaming_asof_left_map_column_rides_along(spark, tmp_path):
    """A map-typed left payload column can't be a grouping key; it
    must pass through via first() instead of failing plan analysis."""
    import datetime as dt

    def ts(s):
        return dt.datetime.fromisoformat(s + "+00:00")

    L_DDL = "user_id bigint, ts timestamp, props map<string,string>"
    l_path, r_path = str(tmp_path / "lm"), str(tmp_path / "rm")
    spark.createDataFrame(
        [(1, ts("2024-01-01 10:10:00"), {"k": "v"})], L_DDL
    ).write.parquet(l_path)
    spark.createDataFrame(
        [(1, ts("2024-01-01 10:05:00"), 11.0)], EV_DDL
    ).write.parquet(r_path)
    left = (
        spark.readStream.schema(L_DDL).parquet(l_path)
        .withWatermark("ts", "1 minute")
    )
    right = (
        spark.readStream.schema(EV_DDL).parquet(r_path)
        .withColumnRenamed("value", "r_value")
        .withColumnRenamed("ts", "r_ts")
        .withWatermark("r_ts", "1 minute")
    )
    out = asof_join_stream(
        left, right, "user_id", "ts", "r_ts", ["r_value"],
        tolerance="30 minutes",
    )
    name = f"asof_map_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        future = dt.datetime(2030, 1, 1)
        spark.createDataFrame([(0, future, None)], L_DDL).write.mode(
            "append"
        ).parquet(l_path)
        spark.createDataFrame([(0, future, 0.0)], EV_DDL).write.mode(
            "append"
        ).parquet(r_path)
        q.processAllAvailable()
        q.processAllAvailable()
        rows = [
            r for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r["ts"] < future
        ]
    finally:
        q.stop()
    assert len(rows) == 1
    assert rows[0]["props"] == {"k": "v"} and rows[0]["r_value"] == 11.0
