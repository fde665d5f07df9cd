"""Exactly-once foreachBatch sink pattern.

Spark's Kafka/file sinks are at-least-once under foreachBatch: after a
failure the same (epoch) batch is re-delivered with the SAME batch_id.
Exactly-once therefore = make the batch write idempotent, keyed on
batch_id — the pattern the reference delegates to Kafka transactions
(kaflow/applications.py:69-71) re-expressed for Spark's recovery model
(SURVEY §7 hard-parts table).

``IdempotentBatchWriter`` records committed batch ids in a commit-log
directory next to the checkpoint; a re-delivered batch id is skipped.
The log write happens AFTER the user write succeeds, so a crash
between write and commit re-runs the batch — the user write must
itself be idempotent-per-batch (e.g. overwrite a batch-keyed partition
or produce with batch-scoped keys), which this wrapper makes easy by
passing batch_id through.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


class IdempotentBatchWriter:
    """foreachBatch wrapper that skips re-delivered micro-batches.

    Usage::

        writer = IdempotentBatchWriter(commit_dir, write_fn)
        stream.writeStream.foreachBatch(writer).option(
            "checkpointLocation", ckpt).start()

    where ``write_fn(df, batch_id)`` performs an idempotent write
    (overwrite of a batch-keyed location, upsert, ...).
    """

    def __init__(
        self, commit_dir: str, write_fn: Callable[[DataFrame, int], None]
    ) -> None:
        # NB: markers use local-filesystem semantics. foreachBatch runs
        # on the DRIVER, so on a cluster point commit_dir at driver-
        # durable storage (or a fuse-mounted object store / NFS path,
        # e.g. next to the checkpoint dir).
        self.commit_dir = commit_dir
        self.write_fn = write_fn
        os.makedirs(commit_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.commit_dir, f"{batch_id}.committed")

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        if self.committed(batch_id):
            return  # re-delivered after recovery: already fully written
        self.write_fn(df, batch_id)
        # commit marker AFTER the write: crash in between re-runs the
        # batch, which the batch-keyed write absorbs
        with open(self._marker(batch_id), "w") as f:
            f.write("ok")


def batch_keyed_parquet_writer(base_path: str) -> Callable[[DataFrame, int], None]:
    """A ready-made idempotent write_fn: each micro-batch overwrites
    its own batch_id=<n> subdirectory — replays converge to the same
    bytes."""

    def write(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{base_path}/batch_id={batch_id}")

    return write
