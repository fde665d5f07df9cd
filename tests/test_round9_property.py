"""Property tests for the round-9 operators against independent
pure-python references: triangle-salted self-pair enumeration vs
itertools.combinations on random bucket populations (including hot
buckets and singletons), basket lift vs a dict-based brute force, and
the CDC partition-evolution roundtrip on randomly churned keyed
snapshots with migrating partition values."""

from __future__ import annotations

import itertools
import random
from collections import defaultdict

from pyspark.sql import functions as F

from kaflow_spark.operators.events import basket_lift
from kaflow_spark.operators.skew import salted_self_pairs


def test_salted_self_pairs_random_buckets_all_salts(spark):
    rng = random.Random(9)
    rows = []
    next_id = 0
    for b in range(12):
        size = rng.choice([0, 1, 2, 3, 5, 17, 40])
        for _ in range(size):
            rows.append((f"b{b}", next_id))
            next_id += 1
    df = spark.createDataFrame(rows, "bucket string, id bigint")
    members = defaultdict(list)
    for b, i in rows:
        members[b].append(i)
    want = sorted(
        (b, min(x, y), max(x, y))
        for b, ids in members.items()
        for x, y in itertools.combinations(ids, 2)
    )
    for salt in (1, 2, 5, 16):
        got = sorted(
            (r["bucket"], r["id_a"], r["id_b"])
            for r in salted_self_pairs(df, ["bucket"], "id", salt=salt).collect()
        )
        assert got == want, f"salt={salt}"


def test_basket_lift_matches_brute_force(spark):
    rng = random.Random(17)
    items = list("abcdefg")
    rows = []
    for b in range(60):
        for it in rng.sample(items, rng.randint(0, 5)):
            # duplicates within a basket must collapse
            for _ in range(rng.randint(1, 2)):
                rows.append((b, it))
    df = spark.createDataFrame(rows, "bid bigint, item string")
    baskets = defaultdict(set)
    for b, it in rows:
        baskets[b].add(it)
    nonempty = [s for s in baskets.values() if s]
    n = len(nonempty)
    marg = defaultdict(int)
    pair = defaultdict(int)
    for s in nonempty:
        for it in s:
            marg[it] += 1
        for x, y in itertools.combinations(sorted(s), 2):
            pair[(x, y)] += 1
    want = {
        (x, y): (c, c * n * 10000 // (marg[x] * marg[y]))
        for (x, y), c in pair.items()
    }
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["lift_bp"])
        for r in basket_lift(df, ["bid"], "item").collect()
    }
    assert got == want


def test_cdc_partition_evolution_random_roundtrip(spark, tmp_path):
    """apply(diff(A, B, partition_col)) == B when a random subset of
    keys MIGRATES partitions between the snapshots."""
    from kaflow_spark.operators.cdc import merge_into_parquet, snapshot_diff

    rng = random.Random(31)
    ddl = "k bigint, part string, v bigint"
    old_rows = [(k, f"p{rng.randint(0, 3)}", rng.randint(0, 99)) for k in range(80)]
    new_rows = []
    for k, p, v in old_rows:
        r = rng.random()
        if r < 0.15:
            continue  # delete
        if r < 0.35:
            p = f"p{rng.randint(0, 3)}"  # maybe migrate partition
        if r < 0.55:
            v = rng.randint(0, 99)  # maybe update payload
        new_rows.append((k, p, v))
    new_rows += [(100 + i, f"p{rng.randint(0, 3)}", i) for i in range(10)]
    old = spark.createDataFrame(old_rows, ddl)
    new = spark.createDataFrame(new_rows, ddl)
    path = str(tmp_path / "t")
    old.write.partitionBy("part").parquet(path)
    diff = snapshot_diff(old, new, ["k"], partition_col="part")
    merge_into_parquet(spark, path, diff, ["k"], partition_col="part")
    got = sorted(
        tuple(r)
        for r in spark.read.parquet(path).select("k", "part", "v").collect()
    )
    assert got == sorted(new_rows)


def test_round9_operators_handle_empty_inputs(spark):
    """Empty frames flow through the new operators without errors and
    yield empty (or empty-compatible) results."""
    from kaflow_spark.operators.events import basket_lift, spike_days

    empty_b = spark.createDataFrame([], "bid bigint, item string")
    assert basket_lift(empty_b, ["bid"], "item").count() == 0

    empty_s = spark.createDataFrame([], "g string, day bigint, v bigint")
    assert spike_days(empty_s, "g", "day", "v").count() == 0

    empty_e = spark.createDataFrame([], "bucket string, id bigint")
    assert salted_self_pairs(empty_e, ["bucket"], "id", salt=4).count() == 0


def test_rolling_median_matches_pandas_reference(spark):
    """q193's rolling lower-median kernel vs an independent pandas
    rolling reference on random gappy series (RANGE frame: only days
    within 6 of the current one, observed days only)."""
    import pandas as pd

    rng = random.Random(5)
    rows = []
    for g in range(4):
        days = sorted(rng.sample(range(0, 60), 35))
        for d in days:
            rows.append((f"g{g}", d, rng.randint(-50, 500)))
    df = spark.createDataFrame(rows, "g string, day bigint, v bigint")

    from pyspark.sql.window import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("g").orderBy("day").rangeBetween(-6, 0)
    n = F.count(F.lit(1)).over(w)
    med = F.element_at(
        F.sort_array(F.collect_list("v").over(w)),
        F.floor((n + F.lit(1)) / F.lit(2)).cast("int"),
    )
    got = {
        (r["g"], r["day"]): r["m"]
        for r in df.select("g", "day", med.alias("m")).collect()
    }
    for g, d, _ in rows:
        window = sorted(v for gg, dd, v in rows if gg == g and d - 6 <= dd <= d)
        assert got[(g, d)] == window[(len(window) + 1) // 2 - 1]


def test_theil_sen_matches_numpy_reference(spark):
    """q195's lower-median pairwise slope vs a pure-python brute
    force on random series (signed truncating division)."""
    import itertools as it

    rng = random.Random(11)
    days = sorted(rng.sample(range(0, 90), 25))
    vals = [rng.randint(-1000, 1000) for _ in days]
    df = spark.createDataFrame(
        [("t", d, v) for d, v in zip(days, vals)],
        "event_type string, day_i bigint, day_cents bigint",
    )
    from pyspark.sql import functions as F

    a = df.select(
        "event_type",
        F.col("day_i").alias("di_a"),
        F.col("day_cents").alias("dc_a"),
    )
    b = df.select(
        "event_type",
        F.col("day_i").alias("di_b"),
        F.col("day_cents").alias("dc_b"),
    )
    slopes_df = (
        a.join(b, "event_type")
        .filter(F.col("di_a") < F.col("di_b"))
        .select(F.expr("(dc_b - dc_a) * 1000000 div (di_b - di_a)").alias("s"))
    )
    got = sorted(r["s"] for r in slopes_df.collect())

    # exact integer reference: trunc-toward-zero division (python //
    # FLOORS, so negative quotients need the sign fix-up)
    def tdiv(a_, b_):
        q = abs(a_) // abs(b_)
        return q if (a_ >= 0) == (b_ >= 0) else -q

    want = sorted(
        tdiv((v2 - v1) * 1000000, (d2 - d1))
        for (d1, v1), (d2, v2) in it.combinations(zip(days, vals), 2)
    )
    assert got == want
    m = got[(len(got) + 1) // 2 - 1]

    # and the declared query's selector picks exactly that element
    sel = (
        slopes_df.agg(
            F.sort_array(F.collect_list("s")).alias("ss"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.element_at(
                "ss", F.floor((F.col("n") + F.lit(1)) / F.lit(2)).cast("int")
            ).alias("m")
        )
        .first()["m"]
    )
    assert sel == m
