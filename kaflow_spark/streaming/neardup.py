"""Streaming near-duplicate suppression — LSH dedup across micro-batches.

A composite the built-in operators can't express: drop documents that
are NEAR-duplicates (MinHash similarity ≥ threshold) of anything seen
earlier in the stream. Exact streaming dedup (dropDuplicates) only
catches byte-identical keys; this catches paraphrases/boilerplate.

Shape (all stages shuffle-partitionable):

1. signature: MinHash per doc (the batch kernel from operators.dedup)
2. band explode: (band, bucket) keys — same LSH banding as batch
3. ``applyInPandasWithState`` keyed by (band, bucket): state holds the
   signatures seen in that bucket; each incoming doc is compared
   against them, emitting (doc_id, dup_of, est_jaccard) verdicts
4. verdict aggregation: a doc is a near-dup if ANY band matched

State is per-bucket and capped (``max_state_per_bucket``, FIFO) so a
hot bucket cannot grow without bound; a processing-time timeout can
additionally expire idle buckets. At 100 TB/day the state store is
RocksDB (session posture) and the bucket key space shards across
executors like any grouped state.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kaflow_spark.operators.dedup import minhash_signature

_VERDICT_DDL = "doc_id bigint, dup_of bigint, est_jaccard double"
# state: parallel arrays of doc ids and their (flattened) signatures
_STATE_DDL = "ids array<bigint>, sigs array<bigint>, width int"


def _banded_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_k: int,
    num_hashes: int,
    bands: int,
    seed: int,
) -> DataFrame:
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(text_col, shingle_k, num_hashes, seed).alias("_sig"),
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.slice(F.col("_sig"), b * rows_per_band + 1, rows_per_band)
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", "_sig", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "_sig", "bb.band", "bb.bucket")


def streaming_near_dup_verdicts(
    stream: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.7,
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_state_per_bucket: int = 256,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-band near-dup verdicts for a document stream.

    Output: one row per (doc, matching band) with the best match in
    that band's bucket, or a no-match row per band. Aggregate with
    ``near_dup_flags`` for per-doc verdicts.
    """
    banded = _banded_signatures(
        stream,
        id_col,
        text_col,
        shingle_k=shingle_k,
        num_hashes=num_hashes,
        bands=bands,
        seed=seed,
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        import numpy as np

        if state.exists:
            ids, flat, width = state.get
            seen_ids = list(ids)
            seen = (
                np.asarray(flat, dtype=np.int64).reshape(-1, width)
                if len(flat)
                else np.empty((0, width), dtype=np.int64)
            )
        else:
            seen_ids = []
            width = num_hashes
            seen = np.empty((0, width), dtype=np.int64)
        out = []
        for pdf in pdfs:
            # NB: not itertuples — it mangles underscore-leading names
            for doc_id, raw_sig in zip(pdf["doc_id"], pdf["_sig"]):
                sig = np.asarray(raw_sig, dtype=np.int64)
                if len(seen):
                    agree = (seen == sig[None, :]).mean(axis=1)
                    best = int(agree.argmax())
                    if agree[best] >= threshold:
                        out.append(
                            {
                                "doc_id": int(doc_id),
                                "dup_of": seen_ids[best],
                                "est_jaccard": float(agree[best]),
                            }
                        )
                        continue  # near-dup: do NOT add to state
                out.append(
                    {"doc_id": int(doc_id), "dup_of": None, "est_jaccard": None}
                )
                seen_ids.append(int(doc_id))
                seen = np.vstack([seen, sig[None, :]])
        # FIFO cap so a hot bucket cannot grow unboundedly
        if len(seen_ids) > max_state_per_bucket:
            drop = len(seen_ids) - max_state_per_bucket
            seen_ids = seen_ids[drop:]
            seen = seen[drop:]
        state.update((seen_ids, [int(x) for x in seen.ravel()], width))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(out, columns=["doc_id", "dup_of", "est_jaccard"])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        update, _VERDICT_DDL, _STATE_DDL, "append", timeout
    )


def near_dup_flags(verdicts: DataFrame) -> DataFrame:
    """Aggregate per-band verdicts to per-doc flags: a doc is a
    near-dup if ANY band matched; keeps the strongest match."""
    return verdicts.groupBy("doc_id").agg(
        F.max_by("dup_of", F.coalesce("est_jaccard", F.lit(-1.0))).alias("dup_of"),
        F.max("est_jaccard").alias("est_jaccard"),
    )
