"""Streaming twin of q260's inverse-Simpson diversity: the statistic
is a pure function of accumulated per-(day, type) counts, so the
closed stream must equal the batch operator under ANY arrival order,
with no horizon or retention contract."""

from __future__ import annotations

import uuid

import pandas as pd
import pytest

DDL = "day string, event_type string, c bigint"


@pytest.fixture()
def tdir(tmp_path) -> str:
    return str(tmp_path / f"stream-{uuid.uuid4().hex[:8]}")


class FakeState:
    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False

    def update(self, v):
        self._v = v

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def remove(self):
        self.removed = True

    def setTimeoutDuration(self, ms):
        pass


def test_streaming_diversity_order_insensitive_converges(spark, tdir):
    from kaflow_spark.streaming.stateful import streaming_diversity

    rows = [
        ("d1", "view", 60), ("d1", "click", 30), ("d1", "buy", 10),
        ("d2", "view", 50), ("d2", "click", 50),
        # a (day, type) cell split across batches: partials accumulate
        ("d1", "view", 40),
    ]

    def run(order):
        d = str(tdir) + f"-{order}"
        data = rows if order == "fwd" else rows[::-1]
        spark.createDataFrame(data[:3], DDL).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        stream = (
            spark.readStream.schema(DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = streaming_diversity(stream, "day", "event_type", "c")
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
            spark.createDataFrame(data[3:], DDL).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            q.processAllAvailable()
        finally:
            q.stop()
        latest = {}
        for bid in sorted(results):
            for r in results[bid]:
                latest[r["day"]] = tuple(r)
        return sorted(latest.values())

    fwd = run("fwd")
    rev = run("rev")
    batch = streaming_diversity(
        spark.createDataFrame(rows, DDL), "day", "event_type", "c"
    )
    want = sorted(
        tuple(r)
        for r in batch.select(
            "day", "n_events", "n_types", "effective_types_micro"
        ).collect()
    )
    assert fwd == want and rev == want and len(want) == 2
    # d2 is perfectly even over 2 types: effective count == 2.0 exactly
    d2 = [r for r in want if r[0] == "d2"][0]
    assert d2[3] == 2_000_000


def test_diversity_kernel_accumulates_and_matches_formula():
    from kaflow_spark.streaming.stateful import _diversity_update

    update = _diversity_update("day", "event_type", "c", 100)
    st = FakeState()
    out = list(
        update(
            ("d1",),
            iter([pd.DataFrame([("d1", "a", 3)], columns=["day", "event_type", "c"])]),
            st,
        )
    )
    assert out[-1].iloc[0]["effective_types_micro"] == 1_000_000  # 1 type
    out = list(
        update(
            ("d1",),
            iter([pd.DataFrame(
                [("d1", "a", 1), ("d1", "b", 4)],
                columns=["day", "event_type", "c"],
            )]),
            st,
        )
    )
    row = out[-1].iloc[0]
    # acc = {a: 4, b: 4}; n=8, sumsq=32 -> 64*1e6//32 = 2.0 exactly
    assert row["n_events"] == 8 and row["n_types"] == 2
    assert row["effective_types_micro"] == 2_000_000
    # timeout branch evicts
    st.hasTimedOut = True
    assert list(update(("d1",), iter([]), st)) == [] and st.removed


def test_diversity_batch_fallback_matches_q260(spark, sf_dir):
    """On a batch frame streaming_diversity IS the q260 formulation."""
    from pyspark.sql import functions as F

    from kaflow_spark.catalog import load
    from kaflow_spark.queries import REGISTRY
    from kaflow_spark.streaming.stateful import streaming_diversity

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    c = (
        e.select(
            F.col("ts").cast("date").cast("string").alias("day"),
            "event_type",
        )
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    got = sorted(
        (r["day"], r["n_events"], r["n_types"], r["effective_types_micro"])
        for r in streaming_diversity(c, "day", "event_type", "c").collect()
    )
    want = sorted(
        (str(r["day"]), r["n_events"], r["n_types"], r["effective_types_micro"])
        for r in REGISTRY["q260_effective_type_diversity"].spark(
            spark, sf_dir
        ).collect()
    )
    assert got == want and len(want) > 5
