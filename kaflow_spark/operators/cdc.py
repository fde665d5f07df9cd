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
path executes per file group. The swap is two-phase: staged write,
then an fsync'd commit manifest whose rename is the commit point —
a crash before it leaves the target untouched, a crash after it is
rolled forward idempotently by :func:`recover_merge` (the
table-format commit-log pattern on plain directories).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

STATUS_COL = "_change"

# commit marker written as a SIBLING of the target directory (the
# unpartitioned path renames the target itself, so the marker cannot
# live inside it): `<target>.merge-commit.json`
_COMMIT_SUFFIX = ".merge-commit.json"


def _commit_path(target_path: str) -> str:
    return target_path.rstrip("/") + _COMMIT_SUFFIX


def _write_commit(target_path: str, manifest: dict) -> str:
    """Atomically publish the commit manifest: write to a temp sibling,
    fsync, rename into place — the rename IS the commit point. Before
    it, the merge never happened (staging is inert garbage); after it,
    :func:`recover_merge` rolls the swap forward idempotently."""
    path = _commit_path(target_path)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
    return path


def _apply_commit(target_path: str, manifest: dict) -> None:
    """Execute (or RE-execute after a crash) a published commit.

    Every step is idempotent, so this can be killed at any point and
    re-run to completion:

    - ``drop`` names (touched partitions fully emptied by deletes, and
      the whole-table path's old directory) are removed if present;
    - ``replace`` names move from staging into the target: while the
      staged dir still exists the target's copy (if any) is the OLD
      version — remove it and rename the staged dir in; once the
      staged dir is gone the move already happened — skip;
    - the whole-table path (``mode == "full"``) resumes its two-rename
      swap from whichever rename it died between (the states are
      disjoint: staging+target present = not started; staging present,
      target absent = mid-swap);
    - staging leftovers are removed, then the marker itself — the
      marker goes LAST so a crash inside recovery just recovers again.
    """
    staging = manifest["staging"]
    if manifest["mode"] == "full":
        old = manifest["old"]
        if os.path.exists(staging):
            if os.path.exists(target_path):
                os.rename(target_path, old)
            os.rename(staging, target_path)
        if os.path.exists(old):
            shutil.rmtree(old)
    else:
        for name in manifest["drop"]:
            dst = os.path.join(target_path, name)
            if os.path.exists(dst):
                shutil.rmtree(dst)
        for name in manifest["replace"]:
            src = os.path.join(staging, name)
            if os.path.exists(src):
                dst = os.path.join(target_path, name)
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                os.rename(src, dst)
    if os.path.exists(staging):
        shutil.rmtree(staging)
    os.remove(_commit_path(target_path))


def recover_merge(target_path: str) -> dict | None:
    """Roll forward a :func:`merge_into_parquet` apply that crashed
    after its commit point: if the target has a pending commit marker,
    re-execute the swap idempotently and return the manifest; return
    ``None`` when there is nothing to do (the cheap common case — one
    ``os.path.exists``). :func:`merge_into_parquet` calls this first,
    so the next merge self-heals; long-lived readers of a
    merge-managed table should call it before reading (a crashed
    applier otherwise leaves the table mixed-version until the next
    merge). A crash BEFORE the commit point needs no recovery: the
    target was never touched, and the orphaned ``.merge-staging-*``
    directory is inert garbage (invisible to Spark readers, removed by
    the next completed merge's cleanup of its own staging only). One
    exception to the inert-garbage rule is cleaned here: a writer
    that died BETWEEN writing ``.merge-commit.json.tmp`` and renaming
    it leaves the tmp as a permanent orphan (the next
    ``_write_commit`` would overwrite it, but a table that never
    merges again keeps it forever) — when no committed marker exists,
    the stale tmp is deleted."""
    path = _commit_path(target_path)
    if not os.path.exists(path):
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            os.remove(tmp)
        return None
    with open(path) as f:
        manifest = json.load(f)
    _apply_commit(target_path, manifest)
    from kaflow_spark.catalog import clear_load_cache

    clear_load_cache()
    return manifest


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
    staged rename). The target is read back with the change-set's
    EXPLICIT schema rather than letting Spark infer the partition
    column's type from the path: inference retypes a numeric-looking
    string partition (``seg=03`` comes back int 3), and no cast can
    recover the original ``'03'`` — the touched-partition filter
    would then silently drop every untouched row of that partition
    from the rewrite (data loss, covered in test_cdc).

    Crash safety: the swap is two-phase. The merged output is staged
    to a sibling temp directory; a commit manifest (the exact list of
    directories to drop and move) is then fsync'd and renamed to
    ``<target>.merge-commit.json`` — that rename is the commit point.
    A crash BEFORE it leaves the target byte-identical (staging is
    inert garbage); a crash AFTER it is rolled forward by
    :func:`recover_merge` — invoked automatically at the start of the
    next merge, and callable by readers — whose every step is
    idempotent, so repeated crashes during recovery still converge to
    the fully-merged table. Single-writer per target is assumed (as
    with any directory-swap scheme).

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

    # self-heal: roll forward any commit a previous applier crashed
    # mid-swap (idempotent no-op in the common case)
    recover_merge(target_path)

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
            # read with the change-set's EXPLICIT schema: Spark's
            # partition-path type inference otherwise retypes a
            # numeric-looking string partition (int 3 for 'seg=03'),
            # and a cast BACK from the inferred value loses the
            # original text — '03' becomes '3', the isin() filter
            # drops every untouched row of the touched partition, and
            # the merge rewrites the directory without them (silent
            # data loss, reproduced in test_cdc). With a user schema
            # the raw path string is cast directly to the declared
            # type, so '03' stays '03'.
            target = (
                spark.read.schema(changes.drop(STATUS_COL).schema)
                .parquet(target_path)
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

        # publish the swap plan as a commit manifest, THEN execute it:
        # a crash before the marker rename leaves the target untouched
        # (staging is garbage); a crash after it is rolled forward
        # idempotently by recover_merge / the next merge (the
        # table-format commit-log pattern on plain directories).
        if partition_col is not None:
            # every TOUCHED partition dir is removed (a partition
            # fully emptied by deletes has no staging dir to move in,
            # and must not survive by omission); staged dirs move in.
            # Dir names are Spark's URL-escaped `col=value`; match on
            # the unescaped value.
            from urllib.parse import unquote

            touched = {str(p) for p in parts}
            prefix = f"{partition_col}="
            staged = {
                d for d in os.listdir(staging) if d.startswith(prefix)
            }
            existing = {
                d
                for d in os.listdir(target_path)
                if d.startswith(prefix)
                and unquote(d[len(prefix):]) in touched
            }
            manifest = {
                "mode": "partitioned",
                "staging": staging,
                "replace": sorted(staged),
                "drop": sorted(existing - staged),
            }
        else:
            manifest = {
                "mode": "full",
                "staging": staging,
                "old": f"{target_path}.old-{uuid.uuid4().hex[:8]}",
            }
        _write_commit(target_path, manifest)
        _apply_commit(target_path, manifest)
        clear_load_cache()
        return {
            "partitions_rewritten": sorted(map(str, parts)),
            "upserts": n_up,
            "deletes": n_del,
            "broadcast": do_broadcast,
        }
    finally:
        changes.unpersist()


def _data_files(d: str) -> list[str]:
    """Parquet data files in one directory level (Spark part files;
    skips _SUCCESS / dotfile markers and partition subdirectories)."""
    return [
        f
        for f in os.listdir(d)
        if not f.startswith(("_", "."))
        and os.path.isfile(os.path.join(d, f))
    ]


def compact_parquet(
    spark: SparkSession,
    target_path: str,
    *,
    partition_col: str | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction for a merge-managed parquet table, under
    the SAME two-phase commit manifest as :func:`merge_into_parquet`.

    Every merge rewrites its touched partitions with up to
    ``spark.sql.shuffle.partitions`` part files, so a long merge
    history degrades each hot partition into hundreds of tiny files
    (footer-read and task-granularity overhead at scan time — the
    table-format maintenance problem that OPTIMIZE/rewrite_data_files
    exists for). This rewrites each fragmented slice coalesced to
    ``ceil(bytes / target_file_bytes)`` files.

    Slices are read by their LEAF directory path (the files
    themselves, which do not contain the partition column), so the
    partition value is never decoded — the compacted files move back
    under the same ``col=value`` directory name, and the
    string-vs-inferred-int partition-path hazard that
    :func:`merge_into_parquet` documents cannot arise here at all.
    Only slices whose current file count EXCEEDS their target count
    are rewritten; an already-compact table is a no-op (no staging,
    no manifest).

    Crash safety is the merge's exactly: all compacted slices are
    staged first, then one fsync'd commit manifest (mode
    ``partitioned``: replace-only, nothing dropped; unpartitioned
    tables use the ``full`` two-rename swap) is renamed into place as
    the single commit point and applied; a crash before the rename
    leaves the table untouched, after it :func:`recover_merge` rolls
    the swap forward idempotently (crash-injection covered in
    test_cdc). Single-writer per target, like the merge.

    Returns ``{"compacted": [slice, ...], "files_before": n,
    "files_after": n}``.
    """
    from kaflow_spark.catalog import clear_load_cache

    recover_merge(target_path)

    if partition_col is not None:
        prefix = f"{partition_col}="
        slices = sorted(
            d
            for d in os.listdir(target_path)
            if d.startswith(prefix)
            and os.path.isdir(os.path.join(target_path, d))
        )
    else:
        slices = [""]

    plan = []  # (slice_name, n_files_now, n_files_target)
    for s in slices:
        d = os.path.join(target_path, s) if s else target_path
        files = _data_files(d)
        if not files:
            continue
        total = sum(os.path.getsize(os.path.join(d, f)) for f in files)
        n_target = max(1, -(-total // target_file_bytes))  # ceil div
        if len(files) > n_target:
            plan.append((s, len(files), n_target))
    if not plan:
        return {"compacted": [], "files_before": 0, "files_after": 0}

    staging = os.path.join(
        os.path.dirname(target_path.rstrip("/")),
        f".merge-staging-{uuid.uuid4().hex[:8]}",
    )
    files_before = 0
    for s, n_now, n_target in plan:
        src = os.path.join(target_path, s) if s else target_path
        dst = os.path.join(staging, s) if s else staging
        files_before += n_now
        (
            spark.read.parquet(src)
            .coalesce(int(n_target))
            .write.mode("overwrite")
            .parquet(dst)
        )
    if partition_col is not None:
        manifest = {
            "mode": "partitioned",
            "staging": staging,
            "replace": [s for s, _, _ in plan],
            "drop": [],
        }
    else:
        manifest = {
            "mode": "full",
            "staging": staging,
            "old": f"{target_path}.old-{uuid.uuid4().hex[:8]}",
        }
    _write_commit(target_path, manifest)
    _apply_commit(target_path, manifest)
    clear_load_cache()
    files_after = 0
    for s, _, _ in plan:
        d = os.path.join(target_path, s) if s else target_path
        files_after += len(_data_files(d))
    return {
        "compacted": [s or "." for s, _, _ in plan],
        "files_before": files_before,
        "files_after": files_after,
    }
