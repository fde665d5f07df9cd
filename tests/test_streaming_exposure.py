"""Streaming twin of q242's credit-exposure replay (round-13, verdict
task 5): closed-stream equality vs the batch query, the bounded-state
late-arrival contract, and direct kernel mechanics with a fake
GroupState (the documented ProcessingTimeTimeout sandbox gate)."""

from __future__ import annotations

import datetime
import uuid

import pandas as pd
import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def tdir(tmp_path) -> str:
    return str(tmp_path / f"stream-{uuid.uuid4().hex[:8]}")

DDL = (
    "cust bigint, day bigint, okey bigint, price_cents bigint, "
    "start_cents bigint"
)


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
        self.timeout_set = ms


def _drive(update, batches, state):
    outs = []
    for rows in batches:
        pdf = pd.DataFrame(
            rows, columns=["cust", "day", "okey", "price_cents", "start_cents"]
        )
        outs.extend(list(update((7,), iter([pdf]), state)))
    return outs


def test_streaming_exposure_converges_to_batch(spark, tdir):
    """Closed stream == batch q242 aggregates row-for-row, including
    a customer whose orders arrive split across micro-batches and one
    who overdraws mid-stream."""
    from kaflow_spark.streaming.stateful import streaming_exposure

    rows1 = [
        (1, 10, 100, 500, 1000),
        (1, 11, 101, 700, 1000),  # bal -200: first overdraft day 11
        (2, 10, 200, 50, 300),
    ]
    rows2 = [
        (1, 12, 102, 100, 1000),
        (2, 12, 201, 100, 300),
        (3, 13, 300, 900, 400),  # single order, instant overdraft
    ]
    spark.createDataFrame(rows1, DDL).coalesce(1).write.mode("append").parquet(tdir)
    stream = (
        spark.readStream.schema(DDL).option("maxFilesPerTrigger", 1).parquet(tdir)
    )
    out = streaming_exposure(
        stream, "cust", "day", "okey", "price_cents", "start_cents"
    )
    results = {}
    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(lambda bdf, bid: results.__setitem__(bid, bdf.collect()))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, DDL).coalesce(1).write.mode(
            "append"
        ).parquet(tdir)
        q.processAllAvailable()
    finally:
        q.stop()
    latest = {}
    for bid in sorted(results):
        for r in results[bid]:
            latest[r["cust"]] = tuple(r)
    final = sorted(latest.values())
    batch = streaming_exposure(
        spark.createDataFrame(rows1 + rows2, DDL),
        "cust", "day", "okey", "price_cents", "start_cents",
    )
    want = sorted(
        tuple(r)
        for r in batch.select(
            "cust", "n_orders", "final_balance_cents",
            "min_balance_cents", "first_overdraft_day",
        ).collect()
    )
    assert final == want and len(want) == 3
    assert latest[1][4] == 11 and latest[3][4] == 13  # overdraft days
    assert latest[2][4] is None  # never overdrawn


def test_streaming_exposure_batch_fallback_matches_q242(spark, sf_dir):
    """On a batch frame streaming_exposure IS the q242 formulation:
    run it over the fixture orders x customer join and compare to the
    declared query (dates mapped to epoch days)."""
    from kaflow_spark.catalog import load
    from kaflow_spark.queries import REGISTRY
    from kaflow_spark.streaming.stateful import streaming_exposure

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("cust"),
        F.datediff("o_orderdate", F.lit("1970-01-01")).cast("bigint").alias("day"),
        F.col("o_orderkey").alias("okey"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("price_cents"),
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust"),
        F.expr(
            "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("start_cents"),
    )
    joined = o.join(F.broadcast(c), "cust")
    got = {
        r["cust"]: (
            r["n_orders"],
            r["final_balance_cents"],
            r["min_balance_cents"],
            r["first_overdraft_day"],
        )
        for r in streaming_exposure(
            joined, "cust", "day", "okey", "price_cents", "start_cents"
        ).collect()
    }
    want = {}
    for r in REGISTRY["q242_credit_exposure_replay"].spark(spark, sf_dir).collect():
        od = r["first_overdraft_date"]
        if od is not None and isinstance(od, datetime.datetime):
            od = od.date()
        want[r["c_custkey"]] = (
            r["n_orders"],
            r["final_balance_cents"],
            r["min_balance_cents"],
            None if od is None else (od - datetime.date(1970, 1, 1)).days,
        )
    assert got == want and len(want) > 50


def test_exposure_kernel_late_arrival_contract():
    """A late order INSIDE the horizon replays the trajectory exactly
    (the running minimum and overdraft day correct retroactively); one
    BEHIND the horizon is dropped; duplicate keys are ignored."""
    from kaflow_spark.streaming.stateful import _exposure_update

    update = _exposure_update(
        "cust", "day", "okey", "price_cents", "start_cents", 5, None
    )
    st = FakeState()
    out = _drive(
        update,
        [[(7, 10, 1, 400, 1000), (7, 20, 3, 400, 1000)]],
        st,
    )
    row = out[-1].iloc[0]
    # day 10 fell behind the horizon (hw 20 - 5) and is folded: base
    assert row["n_orders"] == 2 and row["min_balance_cents"] == 200
    assert pd.isna(row["first_overdraft_day"])

    # late order at day 18 (inside horizon): absorbed, replayed after
    # the folded base — balance dips 1000-400-400-300 = -100 at day 20
    # replay order (day 18 before day 20): min becomes -100? base had
    # folded day 10 (bal 600); tail: 18 -> 600-300=300, 20 -> -100
    out = _drive(update, [[(7, 18, 2, 300, 1000)]], st)
    row = out[-1].iloc[0]
    assert row["n_orders"] == 3
    assert row["final_balance_cents"] == -100
    assert row["min_balance_cents"] == -100
    assert row["first_overdraft_day"] == 20

    # duplicate delivery of key 2: ignored entirely
    out = _drive(update, [[(7, 18, 2, 300, 1000)]], st)
    assert out[-1].iloc[0]["n_orders"] == 3

    # a very late order behind the horizon (day 10 <= 20-5): dropped
    out = _drive(update, [[(7, 9, 4, 999, 1000)]], st)
    row = out[-1].iloc[0]
    assert row["n_orders"] == 3 and row["final_balance_cents"] == -100


def test_exposure_kernel_state_bounded_and_timeout_evicts():
    from kaflow_spark.streaming.stateful import _exposure_update

    update = _exposure_update(
        "cust", "day", "okey", "price_cents", "start_cents", 3, 200
    )
    st = FakeState()
    rows = [[(7, d, d, 10, 10_000)] for d in range(1, 40)]
    _drive(update, rows, st)
    start, n_base, sum_base, min_base, od_base, days, keys, prices = st.get
    assert len(days) <= 3 + 1  # horizon-bounded retained tail
    assert n_base + len(days) == 39  # nothing lost, everything folded
    assert sum_base + sum(prices) == 390

    # timeout eviction branch (driven directly — sandbox gate)
    st.hasTimedOut = True
    out = list(update((7,), iter([]), st))
    assert st.removed and out == []
