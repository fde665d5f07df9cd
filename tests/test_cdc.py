"""CDC change-set + parquet MERGE applier (operators/cdc.py).

The load-bearing property is the roundtrip: for any two keyed
snapshots A and B, ``apply(diff(A, B))`` over a parquet copy of A
yields exactly B — on the fixture events table's q170-style state
snapshots and on hand cases covering insert/update/delete, NULL
payload transitions, delete-emptied partitions, and the
untouched-partition-is-never-rewritten contract.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kaflow_spark.operators.cdc import merge_into_parquet, snapshot_diff

DDL = "user_id bigint, seg string, cents bigint"


def _rows(df):
    # partitioned reads surface the partition column last — compare
    # on a canonical name-sorted projection
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def _state_snapshot(spark, sf_dir, cutoff):
    """q170-style keeper: each user's last (event_type, cents) as of
    the cutoff, with a stable derived segment as partition column."""
    from pyspark.sql.window import Window

    from kaflow_spark.catalog import load

    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("value").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.filter(F.col("ts") <= F.lit(cutoff).cast(e.schema["ts"].dataType))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            # partition key: stable per user (derived from the key);
            # non-numeric so partition-dir type inference round-trips
            F.concat(F.lit("s"), F.pmod(F.col("user_id"), F.lit(4))).alias("seg"),
            "event_type",
            F.expr(
                "CAST(CASE WHEN value >= 0.0D"
                " THEN FLOOR(value * 100.0D + 0.5D)"
                " ELSE CEIL(value * 100.0D - 0.5D) END AS BIGINT)"
            ).alias("cents"),
        )
    )


def test_snapshot_diff_classifies_hand_case(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", None)], DDL
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 25), (4, "b", 40), (5, "c", 50)], DDL
    )
    d = snapshot_diff(old, new, ["user_id"])
    got = {r["user_id"]: (r["_change"], r["seg"], r["cents"]) for r in d.collect()}
    assert got == {
        2: ("update", "a", 25),
        3: ("delete", "b", 30),  # deletes carry the OLD row's payload
        4: ("update", "b", 40),  # NULL -> value is an update (null-safe)
        5: ("insert", "c", 50),
    }


def test_roundtrip_unpartitioned(spark, tmp_path):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], DDL
    )
    new = spark.createDataFrame(
        [(2, "a", 21), (3, "b", 30), (7, "z", 70)], DDL
    )
    path = str(tmp_path / "t")
    old.write.parquet(path)
    stats = merge_into_parquet(
        spark, path, snapshot_diff(old, new, ["user_id"]), ["user_id"]
    )
    assert _rows(spark.read.parquet(path)) == _rows(new)
    assert stats["upserts"] == 2 and stats["deletes"] == 1


def test_roundtrip_partitioned_prunes_untouched(spark, tmp_path):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)], DDL
    )
    # seg 'a': update; seg 'b': delete-emptied; seg 'c': untouched;
    # seg 'd': brand-new partition
    new = spark.createDataFrame(
        [(1, "a", 11), (2, "a", 20), (4, "c", 40), (9, "d", 90)], DDL
    )
    path = str(tmp_path / "t")
    old.write.partitionBy("seg").parquet(path)
    untouched = os.path.join(path, "seg=c")
    before = {
        f: os.path.getmtime(os.path.join(untouched, f))
        for f in os.listdir(untouched)
    }
    stats = merge_into_parquet(
        spark,
        path,
        snapshot_diff(old, new, ["user_id"]),
        ["user_id"],
        partition_col="seg",
    )
    assert _rows(spark.read.parquet(path)) == _rows(new)
    assert stats["partitions_rewritten"] == ["a", "b", "d"]
    # the untouched partition's files were not replaced
    after = {
        f: os.path.getmtime(os.path.join(untouched, f))
        for f in os.listdir(untouched)
    }
    assert before == after
    # the delete-emptied partition directory is gone
    assert not os.path.exists(os.path.join(path, "seg=b"))


@pytest.mark.parametrize("partitioned", [False, True])
def test_roundtrip_fixture_snapshots(spark, sf_dir, tmp_path, partitioned):
    """apply(diff(A, B)) == B on the events table's q170-style state
    snapshots at two cutoffs — real keys, real churn."""
    a = _state_snapshot(spark, sf_dir, "2024-01-15 00:00:00")
    b = _state_snapshot(spark, sf_dir, "2024-01-25 00:00:00")
    path = str(tmp_path / "state")
    if partitioned:
        a.write.partitionBy("seg").parquet(path)
    else:
        a.write.parquet(path)
    diff = snapshot_diff(a, b, ["user_id"])
    assert diff.count() > 0  # the fixture actually churns
    merge_into_parquet(
        spark,
        path,
        diff,
        ["user_id"],
        partition_col="seg" if partitioned else None,
    )
    got = spark.read.parquet(path).select("user_id", "seg", "event_type", "cents")
    assert _rows(got) == _rows(
        b.select("user_id", "seg", "event_type", "cents")
    )


def test_diff_of_identical_snapshots_is_empty(spark, sf_dir):
    a = _state_snapshot(spark, sf_dir, "2024-01-15 00:00:00")
    assert snapshot_diff(a, a, ["user_id"]).count() == 0


def test_partition_evolution_emits_delete_insert_pair(spark, tmp_path):
    """Round 9: a key whose partition value CHANGES must arrive as a
    delete-in-old + insert-in-new pair so the old partition's copy is
    actually removed — and the roundtrip must hold end-to-end."""
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], DDL
    )
    # user 2 moves a -> b (payload change too), user 3 stays put
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 21), (3, "b", 30)], DDL
    )
    d = snapshot_diff(old, new, ["user_id"], partition_col="seg")
    got = sorted(
        (r["user_id"], r["_change"], r["seg"], r["cents"]) for r in d.collect()
    )
    assert got == [
        (2, "delete", "a", 20),  # old partition copy removed
        (2, "insert", "b", 21),  # new partition copy added
    ]
    path = str(tmp_path / "t")
    old.write.partitionBy("seg").parquet(path)
    stats = merge_into_parquet(
        spark, path, d, ["user_id"], partition_col="seg"
    )
    assert _rows(spark.read.parquet(path)) == _rows(new)
    # both dirs were touched; the moved key left seg=a (only user 1
    # remains there) and landed in seg=b
    assert stats["partitions_rewritten"] == ["a", "b"]
    left = spark.read.parquet(os.path.join(path, "seg=a"))
    assert [r["user_id"] for r in left.collect()] == [1]


def test_partition_evolution_no_move_matches_plain_diff(spark):
    """With partition_col given but no key moving, the evolution path
    must classify identically to the plain path."""
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], DDL
    )
    new = spark.createDataFrame(
        [(2, "a", 25), (3, "b", 30), (5, "c", 50)], DDL
    )
    plain = snapshot_diff(old, new, ["user_id"])
    evo = snapshot_diff(old, new, ["user_id"], partition_col="seg")
    assert _rows(plain) == _rows(evo)


def test_broadcast_guard_falls_back_above_threshold(spark, tmp_path):
    """Round 9: a change-set whose key frame outgrows
    autoBroadcastJoinThreshold must NOT be force-broadcast (driver
    safety) — and the merge must still roundtrip via the planner's
    shuffle join."""
    old = spark.range(0, 2000).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("s"), F.pmod("id", F.lit(4))).alias("seg"),
        (F.col("id") * 3).alias("cents"),
    )
    new = old.withColumn(
        "cents",
        F.when(F.col("user_id") < 1500, F.col("cents") + 1).otherwise(
            F.col("cents")
        ),
    )
    path = str(tmp_path / "t")
    old.write.parquet(path)
    diff = snapshot_diff(old, new, ["user_id"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try:
        stats = merge_into_parquet(spark, path, diff, ["user_id"])
        assert stats["broadcast"] is False  # 1500 keys * ~28B > 1 KiB
        assert _rows(spark.read.parquet(path)) == _rows(new)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the same change-set under the default threshold broadcasts
    old.write.mode("overwrite").parquet(path)
    stats = merge_into_parquet(spark, path, diff, ["user_id"])
    assert stats["broadcast"] is True
    assert _rows(spark.read.parquet(path)) == _rows(new)


def test_duplicate_change_keys_raise_before_touching_target(spark, tmp_path):
    old = spark.createDataFrame([(1, "a", 10)], DDL)
    path = str(tmp_path / "t")
    old.write.parquet(path)
    bad = spark.createDataFrame(
        [(1, "a", 11, "update"), (1, "a", 12, "update")],
        DDL + f", {'_change'} string",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate"):
        merge_into_parquet(spark, path, bad, ["user_id"])
    # target untouched
    assert _rows(spark.read.parquet(path)) == _rows(old)


def test_non_pathsafe_partition_dtype_raises(spark, tmp_path):
    old = spark.createDataFrame(
        [(1, 0.5, 10)], "user_id bigint, seg double, cents bigint"
    )
    path = str(tmp_path / "t")
    old.write.partitionBy("seg").parquet(path)
    d = snapshot_diff(
        old,
        spark.createDataFrame(
            [(1, 0.5, 11)], "user_id bigint, seg double, cents bigint"
        ),
        ["user_id"],
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="string/integral"):
        merge_into_parquet(spark, path, d, ["user_id"], partition_col="seg")


def test_numeric_string_partition_value_roundtrips(spark, tmp_path):
    """Round 9 (advice): a numeric-looking STRING partition value is
    type-inferred int on read-back; the applier must read with the
    change-set's explicit schema so the union and anti-join line up."""
    ddl = "user_id bigint, seg string, cents bigint"
    old = spark.createDataFrame([(1, "3", 10), (2, "4", 20)], ddl)
    new = spark.createDataFrame([(1, "3", 11), (2, "4", 20)], ddl)
    path = str(tmp_path / "t")
    old.write.partitionBy("seg").parquet(path)
    merge_into_parquet(
        spark,
        path,
        snapshot_diff(old, new, ["user_id"]),
        ["user_id"],
        partition_col="seg",
    )
    got = spark.read.parquet(path).withColumn("seg", F.col("seg").cast("string"))
    assert _rows(got) == _rows(new)


def test_zero_padded_string_partition_keeps_untouched_rows(spark, tmp_path):
    """Round 10 (advice, high): 'seg=03' does NOT round-trip through
    partition-path type inference (inferred int 3, cast back '3' —
    the isin(['03']) filter then drops every untouched row of the
    touched partition and the rewrite loses them). The explicit-schema
    read must keep both the untouched row AND the string dtype."""
    ddl = "user_id bigint, seg string, cents bigint"
    old = spark.createDataFrame(
        [(1, "03", 10), (2, "03", 20), (3, "4", 30)], ddl
    )
    # only key 1 changes; key 2 shares the zero-padded partition and
    # must survive the rewrite
    new = spark.createDataFrame(
        [(1, "03", 11), (2, "03", 20), (3, "4", 30)], ddl
    )
    path = str(tmp_path / "t")
    old.write.partitionBy("seg").parquet(path)
    stats = merge_into_parquet(
        spark,
        path,
        snapshot_diff(old, new, ["user_id"]),
        ["user_id"],
        partition_col="seg",
    )
    assert stats["partitions_rewritten"] == ["03"]
    got = spark.read.schema(ddl).parquet(path)
    assert _rows(got) == _rows(new)
    assert os.path.isdir(os.path.join(path, "seg=03"))


def _flaky_rename(real_rename, allow, fail_after):
    """os.rename wrapper that lets the commit marker land, then raises
    after ``fail_after`` swap renames — the kill-between-partition-
    swaps crash."""
    calls = {"n": 0}

    def rename(src, dst):
        if dst.endswith(allow):
            return real_rename(src, dst)
        calls["n"] += 1
        if calls["n"] > fail_after:
            raise OSError("injected crash between partition swaps")
        return real_rename(src, dst)

    return rename


def test_crash_between_partition_swaps_rolls_forward(
    spark, tmp_path, monkeypatch
):
    """Round 10: kill the applier after the commit marker landed but
    between the two partition-directory swaps — the on-disk table is
    momentarily mixed-version, and recover_merge (also auto-invoked by
    the next merge) must roll it forward to exactly the new snapshot.
    Recovery itself is then crashed once more to prove idempotence."""
    import kaflow_spark.operators.cdc as cdc

    ddl = "user_id bigint, seg string, cents bigint"
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ddl
    )
    # both seg=a and seg=b are rewritten (two swap renames), seg=c is
    # untouched
    new = spark.createDataFrame(
        [(1, "a", 11), (2, "b", 21), (3, "c", 30)], ddl
    )
    path = str(tmp_path / "t")
    old.write.partitionBy("seg").parquet(path)
    diff = snapshot_diff(old, new, ["user_id"])

    real_rename = os.rename
    monkeypatch.setattr(
        cdc.os, "rename", _flaky_rename(real_rename, cdc._COMMIT_SUFFIX, 1)
    )
    with pytest.raises(OSError, match="injected"):
        merge_into_parquet(
            spark, path, diff, ["user_id"], partition_col="seg"
        )
    monkeypatch.setattr(cdc.os, "rename", real_rename)

    # the commit marker exists: the crash happened AFTER the commit
    # point, mid-swap — exactly the window the manifest closes
    assert os.path.exists(cdc._commit_path(path))

    # first recovery attempt also crashes (after zero further renames)
    monkeypatch.setattr(
        cdc.os, "rename", _flaky_rename(real_rename, cdc._COMMIT_SUFFIX, 0)
    )
    with pytest.raises(OSError, match="injected"):
        cdc.recover_merge(path)
    monkeypatch.setattr(cdc.os, "rename", real_rename)

    # second recovery completes; marker and staging are gone
    assert cdc.recover_merge(path) is not None
    assert not os.path.exists(cdc._commit_path(path))
    assert not any(
        d.startswith(".merge-staging-")
        for d in os.listdir(os.path.dirname(path))
    )
    assert _rows(spark.read.schema(ddl).parquet(path)) == _rows(new)
    # recovery after recovery is a no-op
    assert cdc.recover_merge(path) is None


def test_crash_before_commit_leaves_target_untouched(
    spark, tmp_path, monkeypatch
):
    """A crash BEFORE the commit-marker rename must leave the target
    byte-identical: the staged output is inert garbage and no marker
    exists, so there is nothing to recover."""
    import kaflow_spark.operators.cdc as cdc

    ddl = "user_id bigint, seg string, cents bigint"
    old = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], ddl)
    new = spark.createDataFrame([(1, "a", 11), (2, "b", 20)], ddl)
    path = str(tmp_path / "t")
    old.write.partitionBy("seg").parquet(path)

    def no_commit(target_path, manifest):
        raise OSError("injected crash before commit")

    monkeypatch.setattr(cdc, "_write_commit", no_commit)
    with pytest.raises(OSError, match="before commit"):
        merge_into_parquet(
            spark,
            path,
            snapshot_diff(old, new, ["user_id"]),
            ["user_id"],
            partition_col="seg",
        )
    monkeypatch.undo()
    assert cdc.recover_merge(path) is None
    assert _rows(spark.read.schema(ddl).parquet(path)) == _rows(old)


def test_crash_full_table_swap_rolls_forward(spark, tmp_path, monkeypatch):
    """Unpartitioned path: crash between the target->old and
    staging->target renames (the window that previously left NO
    table at all); recovery restores the new snapshot."""
    import kaflow_spark.operators.cdc as cdc

    ddl = "user_id bigint, seg string, cents bigint"
    old = spark.createDataFrame([(1, "a", 10), (2, "b", 20)], ddl)
    new = spark.createDataFrame([(1, "a", 11), (2, "b", 20)], ddl)
    path = str(tmp_path / "t")
    old.write.parquet(path)

    real_rename = os.rename
    monkeypatch.setattr(
        cdc.os, "rename", _flaky_rename(real_rename, cdc._COMMIT_SUFFIX, 1)
    )
    with pytest.raises(OSError, match="injected"):
        merge_into_parquet(
            spark, path, snapshot_diff(old, new, ["user_id"]), ["user_id"]
        )
    monkeypatch.setattr(cdc.os, "rename", real_rename)
    assert not os.path.exists(path)  # the hazard window, marker pending
    assert cdc.recover_merge(path) is not None
    assert _rows(spark.read.parquet(path)) == _rows(new)


# ---- round 11: compaction + stale-tmp hygiene ---------------------------


def _n_files(d):
    from kaflow_spark.operators.cdc import _data_files

    return len(_data_files(d))


def test_compact_partitioned_reduces_files_preserves_rows(spark, tmp_path):
    """A merge history leaves each hot partition with many small part
    files; compact_parquet rewrites each fragmented slice to its
    byte-target file count (1 here) without changing a row, and a
    second invocation is a no-op (already compact)."""
    from kaflow_spark.operators.cdc import compact_parquet

    ddl = "user_id bigint, seg string, cents bigint"
    rows = [(i, f"s{i % 3}", i * 10) for i in range(300)]
    df = spark.createDataFrame(rows, ddl)
    path = str(tmp_path / "t")
    # repartition(8) per partition dir = 8 small files in each slice
    df.repartition(8).write.partitionBy("seg").parquet(path)
    before = {s: _n_files(os.path.join(path, s)) for s in os.listdir(path) if s.startswith("seg=")}
    assert all(n > 1 for n in before.values()), before

    stats = compact_parquet(spark, path, partition_col="seg")
    assert sorted(stats["compacted"]) == ["seg=s0", "seg=s1", "seg=s2"]
    after = {s: _n_files(os.path.join(path, s)) for s in before}
    assert all(n == 1 for n in after.values()), after
    assert stats["files_after"] == 3
    got = spark.read.schema(ddl).parquet(path)
    assert _rows(got) == _rows(df)

    # idempotent second pass: nothing fragmented, nothing staged
    stats2 = compact_parquet(spark, path, partition_col="seg")
    assert stats2["compacted"] == []
    assert not any(
        d.startswith(".merge-staging-")
        for d in os.listdir(os.path.dirname(path))
    )


def test_compact_unpartitioned_full_swap(spark, tmp_path):
    from kaflow_spark.operators.cdc import compact_parquet

    ddl = "user_id bigint, seg string, cents bigint"
    df = spark.createDataFrame(
        [(i, "x", i) for i in range(200)], ddl
    )
    path = str(tmp_path / "t")
    df.repartition(6).write.parquet(path)
    assert _n_files(path) == 6
    stats = compact_parquet(spark, path)
    assert stats["compacted"] == ["."] and stats["files_after"] == 1
    assert _n_files(path) == 1
    assert _rows(spark.read.parquet(path)) == _rows(df)


def test_compact_zero_padded_string_partition_safe(spark, tmp_path):
    """Compaction reads each slice by its LEAF directory (the files
    carry no partition column), so the numeric-looking string
    partition that required the explicit-schema fix in the merge
    cannot be re-typed here at all."""
    from kaflow_spark.operators.cdc import compact_parquet

    ddl = "user_id bigint, seg string, cents bigint"
    df = spark.createDataFrame(
        [(1, "03", 10), (2, "03", 20), (3, "3", 30)], ddl
    )
    path = str(tmp_path / "t")
    df.repartition(4).write.partitionBy("seg").parquet(path)
    compact_parquet(spark, path, partition_col="seg")
    got = spark.read.schema(ddl).parquet(path)
    assert _rows(got) == _rows(df)
    assert os.path.isdir(os.path.join(path, "seg=03"))
    assert os.path.isdir(os.path.join(path, "seg=3"))


def test_compact_crash_after_commit_rolls_forward(
    spark, tmp_path, monkeypatch
):
    """Kill the compactor between its commit-marker rename and the
    slice swaps: recover_merge rolls the compaction forward through
    the SAME manifest machinery as the merge."""
    import kaflow_spark.operators.cdc as cdc

    ddl = "user_id bigint, seg string, cents bigint"
    df = spark.createDataFrame(
        [(i, f"s{i % 2}", i) for i in range(100)], ddl
    )
    path = str(tmp_path / "t")
    df.repartition(5).write.partitionBy("seg").parquet(path)

    real_rename = os.rename
    monkeypatch.setattr(
        cdc.os, "rename", _flaky_rename(real_rename, cdc._COMMIT_SUFFIX, 0)
    )
    with pytest.raises(OSError, match="injected"):
        cdc.compact_parquet(spark, path, partition_col="seg")
    monkeypatch.setattr(cdc.os, "rename", real_rename)

    assert os.path.exists(cdc._commit_path(path))
    assert cdc.recover_merge(path) is not None
    assert not os.path.exists(cdc._commit_path(path))
    for s in ("seg=s0", "seg=s1"):
        assert _n_files(os.path.join(path, s)) == 1
    assert _rows(spark.read.schema(ddl).parquet(path)) == _rows(df)


def test_stale_commit_tmp_cleaned(spark, tmp_path):
    """A writer that died between writing .merge-commit.json.tmp and
    renaming it leaves a permanent orphan; recover_merge deletes it
    when no committed marker exists (and still reports nothing to
    recover)."""
    import kaflow_spark.operators.cdc as cdc

    path = str(tmp_path / "t")
    spark.createDataFrame([(1, 10)], "k bigint, v bigint").write.parquet(path)
    tmp = cdc._commit_path(path) + ".tmp"
    with open(tmp, "w") as f:
        f.write("{}")
    assert cdc.recover_merge(path) is None
    assert not os.path.exists(tmp)
