"""CDC change-set computation and application (MERGE INTO for plain
parquet).

q170 (queries/audits.py) computes the event-sourced snapshot diff; the
two operators here close the loop for arbitrary keyed tables:

- :func:`snapshot_diff` — frame-level diff of two keyed snapshots into
  the canonical change-set (``insert`` / ``update`` / ``delete`` rows
  carrying the NEW payload, deletes carrying only keys);
- :func:`merge_into_parquet` — apply that change-set to a parquet
  target, the rewrite-matched-partitions pattern: with a partition
  column, ONLY partitions containing touched keys are read, merged and
  replaced (I/O proportional to touched partitions, not table size);
  without one, the whole table is a single "partition".

On a platform with a transactional table format (Delta / Iceberg /
Hudi) ``MERGE INTO`` subsumes :func:`merge_into_parquet` — this
operator demonstrates the same plan shape (broadcast the bounded
change-set, anti-join out replaced keys, union upserts) against plain
directories, which is also exactly what those formats' copy-on-write
path executes per file group. The swap is staged-write + directory
rename, so a crash mid-apply leaves the target either old or new,
never half-rewritten (per partition).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

STATUS_COL = "_change"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    *,
    partition_col: str | None = None,
) -> DataFrame:
    """Change-set that turns snapshot ``old`` into snapshot ``new``:
    one row per differing key with ``_change`` in
    ``insert`` (key only in new) / ``update`` (both, payload differs)
    / ``delete`` (key only in old), payload columns carrying the NEW
    values — except deletes, which carry the OLD row's values (the
    new side has none, and the applier needs the old partition value
    to locate the row being removed). Unchanged keys are absent — the
    change-set is bounded by the churn, not the table.

    With ``partition_col`` (a payload column the target is
    partitioned by), an update that MOVES a key to a different
    partition value emits a delete-in-old + insert-in-new PAIR
    instead of a single update — both sides are in hand here, and
    the pair is what lets :func:`merge_into_parquet` remove the old
    partition's copy (a bare update row carries only the new
    partition and would leave the old copy behind). The split
    happens in the same single pass (an array-of-changes explode),
    not a second join.

    Payload comparison is null-safe (``<=>`` per column), so NULL ->
    value and value -> NULL both classify as ``update``. Both inputs
    must be keyed snapshots (one row per key); a duplicate key fans
    out through the full-outer join here, and
    :func:`merge_into_parquet` raises on the resulting non-unique
    change keys before touching the target."""
    payload = [c for c in new.columns if c not in key_cols]
    if payload != [c for c in old.columns if c not in key_cols]:
        raise ValueError(
            f"snapshot schemas differ: {old.columns} vs {new.columns}"
        )
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in key_cols],
        *[F.col(c).alias(f"_old_{c}") for c in payload],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *key_cols, *payload, F.lit(True).alias("_in_new")
    )
    cond = [n[k].eqNullSafe(o[f"_o_{k}"]) for k in key_cols]
    j = n.join(o, cond, "full_outer")
    same_payload = (
        F.lit(True)
        if not payload
        else F.expr(
            " AND ".join(f"(`{c}` <=> `_old_{c}`)" for c in payload)
        )
    )
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(same_payload, F.lit(None))
        .otherwise(F.lit("update"))
    )
    keyed = [
        F.coalesce(n[k], F.col(f"_o_{k}")).alias(k) for k in key_cols
    ]
    if partition_col is None or partition_col in key_cols:
        # partition stable per key (or no partitioning) — one row per
        # differing key, deletes carrying the old payload
        carried = [
            F.when(
                F.col(STATUS_COL) == "delete", F.col(f"_old_{c}")
            )
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ]
        return (
            j.withColumn(STATUS_COL, status)
            .filter(F.col(STATUS_COL).isNotNull())
            .select(*keyed, *carried, STATUS_COL)
        )
    if partition_col not in payload:
        raise ValueError(
            f"partition_col {partition_col!r} not a snapshot column"
        )
    # partition-evolution path: each joined row yields an ARRAY of
    # change structs (usually one; two when the key moved partition),
    # exploded in the same pass — no second join, no diamond
    def _chg(tag: str, prefix: str):
        return F.struct(
            F.lit(tag).alias(STATUS_COL),
            *[F.col(f"{prefix}{c}").alias(c) for c in payload],
        )

    moved = ~F.col(partition_col).eqNullSafe(F.col(f"_old_{partition_col}"))
    arr = (
        F.when(F.col(STATUS_COL) == "insert", F.array(_chg("insert", "")))
        .when(F.col(STATUS_COL) == "delete", F.array(_chg("delete", "_old_")))
        .when(moved, F.array(_chg("delete", "_old_"), _chg("insert", "")))
        .otherwise(F.array(_chg("update", "")))
    )
    return (
        j.withColumn(STATUS_COL, status)
        .filter(F.col(STATUS_COL).isNotNull())
        .select(*keyed, F.explode(arr).alias("_c"))
        .select(*key_cols, "_c.*")
        .select(*key_cols, *payload, STATUS_COL)
    )


def merge_into_parquet(
    spark: SparkSession,
    target_path: str,
    changes: DataFrame,
    key_cols: list[str],
    *,
    partition_col: str | None = None,
) -> dict:
    """Apply a :func:`snapshot_diff` change-set to a parquet
    directory; returns ``{"partitions_rewritten": [...],
    "upserts": n, "deletes": n, "broadcast": bool}``.

    Rewrite-matched-partitions: with ``partition_col`` (the target
    was written ``partitionBy(partition_col)`` and every change row
    carries it — deletes included: :func:`snapshot_diff` carries the
    OLD row's values on delete rows precisely so the applier can
    locate the partition being removed from), only the
    partition directories named by the change-set are scanned
    (partition pruning via an IN filter on the bounded value list),
    merged, and swapped. Untouched partitions are never read or
    written. Without ``partition_col`` the whole table rewrites —
    correct, and the honest cost of plain parquet upserts on an
    unpartitioned layout.

    Partition-evolution support: a key that moved partitions must
    arrive as the delete-in-old + insert-in-new PAIR that
    :func:`snapshot_diff` emits when given ``partition_col`` — the
    delete row's old partition value puts the old directory in the
    touched set, the insert lands in the new one. A change-set built
    WITHOUT that option still applies correctly only while the
    partition value is stable per key (the table formats'
    partition-pruned-merge constraint).

    ``partition_col`` must be a string or integral column: touched
    directories are matched by rendering each distinct value as
    ``str(value)`` against the URL-unescaped ``col=value`` dir name,
    and only those two families render identically in Python and in
    Spark's partition-path escaping (date/timestamp/float/Decimal do
    not — a mismatch would leave a stale dir in place and fail the
    staged rename). For the same reason the read-back target's
    partition column (whose type Spark INFERS from the path — a
    numeric-looking string partition comes back int) is cast back to
    the change-set's dtype before the merge, so the anti-join and
    union compare like against like.

    Change keys must be unique per (key, kind) — one upsert and/or
    one delete per key; a duplicate (e.g. from diffing a non-keyed
    snapshot, which fans out through the full-outer join) raises
    here BEFORE any directory is touched rather than silently
    merging a corrupted change-set.

    Merge plan per touched slice: anti-join the slice against the
    bounded-churn change keys — broadcast ONLY while the keys'
    estimated bytes fit ``spark.sql.autoBroadcastJoinThreshold``
    (a pathological change-set above it falls back to the planner's
    shuffle join instead of OOMing the driver; the returned
    ``broadcast`` flag records which path ran) — then union the
    upsert rows: the copy-on-write file-group plan of the table
    formats. The result is staged to a sibling temp directory and
    directory-renamed in, so a reader never sees a half-applied
    partition; ``catalog.clear_load_cache()`` runs after the swap
    (CLAUDE.md trap 10 — cached frames over a rewritten path are
    stale)."""
    from kaflow_spark.catalog import clear_load_cache

    payload = [c for c in changes.columns if c not in (*key_cols, STATUS_COL)]
    changes = changes.persist()
    try:
        upserts = changes.filter(F.col(STATUS_COL) != "delete").drop(STATUS_COL)
        n_up = upserts.count()
        n_del = changes.filter(F.col(STATUS_COL) == "delete").count()
        # one job over the persisted bounded change-set: a key may
        # carry at most one upsert and one delete (the evolution pair)
        dup = (
            changes.groupBy(
                *key_cols, (F.col(STATUS_COL) == "delete").alias("_is_del")
            )
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "change-set has duplicate keys (was the input snapshot "
                "keyed? snapshot_diff fans out on duplicate-key inputs)"
            )
        keys = changes.select(*key_cols).distinct()

        if partition_col is not None:
            if partition_col not in (*key_cols, *payload):
                raise ValueError(
                    f"partition_col {partition_col!r} not in change-set"
                )
            part_type = changes.schema[partition_col].dataType
            if part_type.typeName() not in (
                "string", "byte", "short", "integer", "long"
            ):
                raise ValueError(
                    f"partition_col {partition_col!r} is {part_type.simpleString()}; "
                    "only string/integral partition columns render "
                    "identically in Python and Spark partition paths "
                    "(date/timestamp/float/Decimal do not) — repartition "
                    "the table on a string/int derivation or use the "
                    "unpartitioned path"
                )
            parts = [
                r[0]
                for r in changes.select(partition_col).distinct().collect()
            ]
            target = (
                spark.read.parquet(target_path)
                # partition-dir type inference round-trip (see docstring)
                .withColumn(partition_col, F.col(partition_col).cast(part_type))
                .filter(F.col(partition_col).isin(parts))
            )
        else:
            parts = []
            target = spark.read.parquet(target_path)

        # driver-safety guard: broadcast the change keys only while
        # their estimated size fits the session's broadcast threshold
        n_keys = n_up + n_del
        _width = {"byte": 1, "boolean": 1, "short": 2, "integer": 4,
                  "float": 4, "long": 8, "double": 8, "date": 4,
                  "timestamp": 8}
        est_bytes = n_keys * (
            sum(
                _width.get(f.dataType.typeName(), 24)
                for f in keys.schema.fields
            )
            + 20
        )
        threshold = int(
            spark._jsparkSession.sessionState().conf().autoBroadcastJoinThreshold()
        )
        do_broadcast = 0 < est_bytes <= threshold
        join_keys = F.broadcast(keys) if do_broadcast else keys
        kept = target.join(join_keys, key_cols, "left_anti")
        merged = kept.unionByName(upserts.select(*kept.columns))

        staging = os.path.join(
            os.path.dirname(target_path.rstrip("/")),
            f".merge-staging-{uuid.uuid4().hex[:8]}",
        )
        writer = merged.write.mode("overwrite")
        if partition_col is not None:
            writer = writer.partitionBy(partition_col)
        writer.parquet(staging)

        if partition_col is not None:
            # remove every TOUCHED partition dir first — a partition
            # fully emptied by deletes has no staging dir to move in,
            # and must not survive by omission. Dir names are Spark's
            # URL-escaped `col=value`; match on the unescaped value.
            from urllib.parse import unquote

            touched = {str(p) for p in parts}
            prefix = f"{partition_col}="
            for d in os.listdir(target_path):
                if d.startswith(prefix) and unquote(d[len(prefix):]) in touched:
                    shutil.rmtree(os.path.join(target_path, d))
            for d in os.listdir(staging):
                if d.startswith(prefix):
                    os.rename(
                        os.path.join(staging, d), os.path.join(target_path, d)
                    )
            shutil.rmtree(staging)
        else:
            old = f"{target_path}.old-{uuid.uuid4().hex[:8]}"
            os.rename(target_path, old)
            os.rename(staging, target_path)
            shutil.rmtree(old)
        clear_load_cache()
        return {
            "partitions_rewritten": sorted(map(str, parts)),
            "upserts": n_up,
            "deletes": n_del,
            "broadcast": do_broadcast,
        }
    finally:
        changes.unpersist()
