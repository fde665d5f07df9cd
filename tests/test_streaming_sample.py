"""Streaming twin of q257's weighted priority sampler (round-13): the
min-k reservoir is order-insensitive, so the closed stream must equal
the batch operator under ANY arrival order — plus bounded-state and
priority-parity pins."""

from __future__ import annotations

import uuid

import pandas as pd
import pytest

from pyspark.sql import functions as F

DDL = "g string, id bigint, w int"


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


def test_kernel_priority_matches_batch_operator(spark):
    """The kernel's Python md5-derived u/w key must reproduce the
    batch operator's Spark-side key EXACTLY — same selected set on
    the same data, driven directly."""
    from kaflow_spark.operators.curation import weighted_priority_sample_k
    from kaflow_spark.streaming.stateful import _weighted_sample_update

    rows = [("g", i, (i * 7) % 13 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, DDL)
    want = sorted(
        (r["id"], r["w"])
        for r in weighted_priority_sample_k(
            df, "g", "id", "w", 5, salt="s|"
        ).collect()
    )
    update = _weighted_sample_update("g", "id", "w", 5, "s|", None)
    st = FakeState()
    out = list(
        update(("g",), iter([pd.DataFrame(rows, columns=["g", "id", "w"])]), st)
    )
    got = sorted(zip(out[-1]["id"], out[-1]["weight"]))
    assert [(int(a), int(b)) for a, b in got] == want


def test_streaming_reservoir_order_insensitive_converges(spark, tdir):
    """Two arrival orders (forward and reversed) of the same rows,
    split across micro-batches, both converge to the batch sample —
    the no-late-data-contract property the min-k reservoir buys."""
    from kaflow_spark.streaming.stateful import streaming_weighted_sample

    rows = [("a", i, (i % 9) + 1) for i in range(60)] + [
        ("b", 100 + i, 50 - i) for i in range(40)
    ]

    def run(order):
        d = str(tdir) + f"-{order}"
        data = rows if order == "fwd" else rows[::-1]
        spark.createDataFrame(data[:30], DDL).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        stream = (
            spark.readStream.schema(DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = streaming_weighted_sample(
            stream, "g", "id", "w", 7, salt="r|"
        )
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
            spark.createDataFrame(data[30:], DDL).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            q.processAllAvailable()
        finally:
            q.stop()
        latest = {}
        for bid in sorted(results):
            for r in results[bid]:
                latest.setdefault(r["g"], {})
            for g in {r["g"] for r in results[bid]}:
                latest[g] = sorted(
                    (r["id"], r["weight"])
                    for r in results[bid]
                    if r["g"] == g
                )
        return latest

    fwd = run("fwd")
    rev = run("rev")
    batch = streaming_weighted_sample(
        spark.createDataFrame(rows, DDL), "g", "id", "w", 7, salt="r|"
    )
    want = {}
    for r in batch.collect():
        want.setdefault(r["g"], []).append((r["id"], r["weight"]))
    want = {g: sorted(v) for g, v in want.items()}
    assert fwd == want and rev == want
    assert len(want["a"]) == 7 and len(want["b"]) == 7


def test_reservoir_state_bounded_and_dedupes():
    from kaflow_spark.streaming.stateful import _weighted_sample_update

    update = _weighted_sample_update("g", "id", "w", 3, "s|", None)
    st = FakeState()
    for start in range(0, 1000, 100):
        rows = [("g", i, 5) for i in range(start, start + 100)]
        out = list(
            update(
                ("g",),
                iter([pd.DataFrame(rows, columns=["g", "id", "w"])]),
                st,
            )
        )
    keys, ids, weights = st.get
    assert len(ids) == 3  # bounded at k forever
    assert len(out[-1]) == 3
    # duplicate delivery of a reservoir id: no change
    dup = [("g", int(ids[0]), 5)]
    out2 = list(
        update(("g",), iter([pd.DataFrame(dup, columns=["g", "id", "w"])]), st)
    )
    assert sorted(out2[-1]["id"]) == sorted(int(i) for i in ids)
    # timeout branch evicts
    st.hasTimedOut = True
    assert list(update(("g",), iter([]), st)) == [] and st.removed
