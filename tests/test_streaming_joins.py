"""Streaming joins + complete output mode (SURVEY §2B streaming table).

- stream-static: per-batch hash join against a static dimension (the
  dim broadcasts; no state).
- stream-stream: inner join with watermarks on both sides and a time-
  range condition — state on both sides, evicted at the watermark.
- complete mode: full re-emission of a streaming aggregate.
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import functions as F

EVENTS_DDL = "event_id bigint, ts timestamp, user_id bigint, value double"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s + "+00:00")


def _write(spark, path: str, rows, ddl=EVENTS_DDL) -> None:
    spark.createDataFrame(rows, ddl).coalesce(1).write.mode("append").parquet(path)


def test_stream_static_join(spark, tmp_path):
    path = str(tmp_path / "ss")
    _write(
        spark,
        path,
        [(1, _ts("2024-01-01 10:00:00"), 7, 1.0), (2, _ts("2024-01-01 10:01:00"), 8, 2.0)],
    )
    users = spark.createDataFrame([(7, "alice"), (9, "carol")], "user_id bigint, name string")
    stream = spark.readStream.schema(EVENTS_DDL).parquet(path)
    joined = stream.join(F.broadcast(users), "user_id", "inner")
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = joined.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        assert [(r["user_id"], r["name"]) for r in rows] == [(7, "alice")]
    finally:
        q.stop()


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Clicks join impressions within a 10-minute window, both sides
    watermarked (bounded state)."""
    imp_path = str(tmp_path / "imp")
    clk_path = str(tmp_path / "clk")
    IMP_DDL = "ad_id bigint, imp_ts timestamp"
    CLK_DDL = "ad_id bigint, clk_ts timestamp"
    _write(
        spark,
        imp_path,
        [(1, _ts("2024-01-01 10:00:00")), (2, _ts("2024-01-01 10:00:00"))],
        IMP_DDL,
    )
    _write(
        spark,
        clk_path,
        [
            (1, _ts("2024-01-01 10:05:00")),  # within 10 min of imp
            (2, _ts("2024-01-01 11:00:00")),  # too late: no match
        ],
        CLK_DDL,
    )
    imps = (
        spark.readStream.schema(IMP_DDL).parquet(imp_path).withWatermark("imp_ts", "20 minutes")
    )
    clks = (
        spark.readStream.schema(CLK_DDL).parquet(clk_path).withWatermark("clk_ts", "20 minutes")
    )
    joined = imps.join(
        clks,
        (imps["ad_id"] == clks["ad_id"])
        & (clks["clk_ts"] >= imps["imp_ts"])
        & (clks["clk_ts"] <= imps["imp_ts"] + F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select(imps["ad_id"], "imp_ts", "clk_ts")
    name = f"s2s_{uuid.uuid4().hex[:8]}"
    q = joined.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        assert [r["ad_id"] for r in rows] == [1]  # only the in-window click
    finally:
        q.stop()


def test_complete_output_mode(spark, tmp_path):
    path = str(tmp_path / "cm")
    _write(spark, path, [(1, _ts("2024-01-01 10:00:00"), 7, 1.0)])
    stream = spark.readStream.schema(EVENTS_DDL).option("maxFilesPerTrigger", 1).parquet(path)
    counts = stream.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    name = f"cmp_{uuid.uuid4().hex[:8]}"
    q = counts.writeStream.format("memory").queryName(name).outputMode("complete").start()
    try:
        q.processAllAvailable()
        _write(spark, path, [(2, _ts("2024-01-01 10:01:00"), 7, 1.0)])
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        # complete mode re-emits the WHOLE result: latest snapshot n=2
        assert {(r["user_id"], r["n"]) for r in rows} == {(7, 2)}
    finally:
        q.stop()
