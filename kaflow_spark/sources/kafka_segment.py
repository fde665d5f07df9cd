"""Spark 4 Python DataSource over Kafka-style segment archives.

Batch AND streaming reader for the `segments.py` format, registered as
``format("kafka_segment")``. This is the broker-less stand-in for the
reference's live Kafka source (`kaflow/applications.py` consumer): the
envelope schema is ENVELOPE_DDL, so the frames drop straight into
`App.process_batch` / `App.process_stream`.

Scale design:
- one InputPartition per segment FILE — on a cluster each executor
  reads its own files; no driver-side data movement (the driver reads
  only the few-byte per-file headers for planning);
- topic-equality/IN pushdown skips whole files at planning time
  (`pushFilters`), the custom-source analog of partition pruning;
- offset/timestamp range predicates skip files whose sidecar min/max
  index (`segments.write_index` — the analog of a Kafka segment's
  .index/.timeindex) proves no overlap; the predicates stay in the
  plan for row-level re-application, exactly like parquet row-group
  pruning;
- streaming offsets are {"idx": N} over the lexicographically sorted
  file list: append-only archives advance the index, a restart resumes
  from the checkpointed index, and `readBetweenOffsets` re-reads an
  exact file span deterministically -> exactly-once replay per record.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from kaflow_spark.message import ENVELOPE_DDL
from kaflow_spark.sources.segments import (
    iter_segment,
    list_segments,
    read_header,
    read_index,
)


def _ts(ms: int) -> _dt.datetime:
    """ms-since-epoch -> naive UTC datetime (session TZ is UTC)."""
    return _dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc).replace(
        tzinfo=None
    )


# canonical envelope column order; the `columns` option may list any
# subset (any order) and the emitted schema keeps THIS order so the
# frame shape is deterministic regardless of how the option was written
_ENVELOPE_FIELDS: tuple[tuple[str, str], ...] = (
    ("topic", "string"),
    ("partition", "int"),
    ("offset", "bigint"),
    ("timestamp", "timestamp"),
    ("timestamp_type", "int"),
    ("key", "binary"),
    ("value", "binary"),
    ("headers", "array<struct<key: string, value: binary>>"),
)
_PAYLOAD_COLS = {"key", "value", "headers"}


def _parse_columns(options: dict) -> list[str] | None:
    """Validated, canonically-ordered projection from the ``columns``
    option, or None for the full envelope."""
    raw = options.get("columns")
    if raw is None:
        return None
    want = {c.strip() for c in str(raw).split(",") if c.strip()}
    known = {n for n, _ in _ENVELOPE_FIELDS}
    bad = want - known
    if bad:
        raise ValueError(
            f"kafka_segment: unknown columns {sorted(bad)}; "
            f"envelope columns are {sorted(known)}"
        )
    if not want:
        raise ValueError("kafka_segment: columns option is empty")
    return [n for n, _ in _ENVELOPE_FIELDS if n in want]


def _parse_corrupt(options: dict, columns: list[str] | None) -> str:
    """Corruption policy for a reader. An explicit ``corrupt`` option
    ("record" | "raise") wins. The default is "record" (torn tail ->
    one CORRUPT_HEADER sentinel row that App.process_batch DLQ-routes)
    — UNLESS the projection strips the ``headers`` column: then the
    sentinel would surface as an unmarked (offset=-1, 1970) row inside
    offset/lag audits, so the safe default flips to "raise"."""
    raw = options.get("corrupt")
    if raw is not None:
        mode = str(raw).strip().lower()
        if mode not in ("record", "raise"):
            raise ValueError(
                f"kafka_segment: corrupt option must be 'record' or "
                f"'raise', got {raw!r}"
            )
        return mode
    marker_visible = columns is None or "headers" in columns
    return "record" if marker_visible else "raise"


def _rows(
    path: str, columns: list[str] | None = None, corrupt: str = "record"
) -> Iterator[tuple]:
    """Decoded rows in envelope (or projected) column order. A
    metadata-only projection (no key/value/headers) walks record
    length prefixes without materializing payload bytes — the
    explicit column-pruning path, since this Spark build's Python
    DataSource API does not forward Catalyst's column pruning to the
    reader (verified: reader() receives the full schema and BatchScan
    lists every column even under a narrow Project)."""
    payload = columns is None or bool(set(columns) & _PAYLOAD_COLS)
    # corrupt="record": a torn tail becomes ONE sentinel envelope row
    # (CORRUPT_HEADER + raw bytes) that process_batch DLQ-routes,
    # instead of an exception killing the whole batch/micro-batch;
    # corrupt="raise" fails fast (the default when the projection
    # strips the headers marker — see _parse_corrupt)
    for topic, part, offset, ts_ms, tstype, key, value, headers in iter_segment(
        path, payload=payload, corrupt=corrupt
    ):
        full = {
            "topic": topic,
            "partition": part,
            "offset": offset,
            "timestamp": _ts(ts_ms),
            "timestamp_type": tstype,
            "key": key,
            "value": value,
            "headers": headers,
        }
        if columns is None:
            yield (
                topic,
                part,
                offset,
                full["timestamp"],
                tstype,
                key,
                value,
                headers,
            )
        else:
            yield tuple(full[c] for c in columns)


@dataclass
class SegmentPartition(InputPartition):
    path: str


def _topics_from_filters(filters: Sequence[Filter]) -> set[str] | None:
    """The set of topics the pushed filters allow, or None = all."""
    allowed: set[str] | None = None
    for f in filters:
        if isinstance(f, EqualTo) and f.attribute == ("topic",):
            vals = {f.value}
        elif isinstance(f, In) and f.attribute == ("topic",):
            vals = set(f.value)
        else:
            continue
        allowed = vals if allowed is None else (allowed & vals)
    return allowed


def _to_ms_floor(v: Any) -> int:
    """Filter literal -> ms-since-epoch, rounded DOWN (conservative
    lower bound). Naive datetimes are session-TZ UTC."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        us = int(v.timestamp() * 1_000_000)
        return us // 1000
    return int(v)


def _to_ms_ceil(v: Any) -> int:
    """Filter literal -> ms-since-epoch, rounded UP (conservative
    upper bound)."""
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        us = int(v.timestamp() * 1_000_000)
        return -((-us) // 1000)
    return int(v)


def _bounds_from_filters(
    filters: Sequence[Filter],
) -> dict[str, tuple[int | None, int | None]]:
    """Conservative inclusive (lo, hi) bounds per range column
    ("offset" in record units, "timestamp" in ms) implied by the
    pushed filters. Used ONLY to skip whole segment files whose
    sidecar min/max range cannot overlap — Spark re-applies the
    predicates row-level, so widening is always safe and timestamp
    literals are floor/ceil'd to the sidecar's ms grain."""
    bounds: dict[str, tuple[int | None, int | None]] = {}
    for f in filters:
        if not isinstance(
            f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
        ):
            continue
        if f.attribute == ("offset",):
            col, is_ts = "offset", False
        elif f.attribute == ("timestamp",):
            col, is_ts = "timestamp", True
        else:
            continue
        if not isinstance(f.value, (int, _dt.datetime)):
            continue  # unexpected literal type: never skip on it
        lo, hi = bounds.get(col, (None, None))
        if isinstance(f, EqualTo):
            flo = _to_ms_floor(f.value) if is_ts else int(f.value)
            fhi = _to_ms_ceil(f.value) if is_ts else int(f.value)
            lo = flo if lo is None else max(lo, flo)
            hi = fhi if hi is None else min(hi, fhi)
        elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
            flo = _to_ms_floor(f.value) if is_ts else int(f.value)
            if isinstance(f, GreaterThan) and not is_ts:
                flo += 1  # exact for integer offsets; ts stays widened
            lo = flo if lo is None else max(lo, flo)
        else:  # LessThan / LessThanOrEqual
            fhi = _to_ms_ceil(f.value) if is_ts else int(f.value)
            if isinstance(f, LessThan) and not is_ts:
                fhi -= 1
            hi = fhi if hi is None else min(hi, fhi)
        bounds[col] = (lo, hi)
    return bounds


def _index_overlaps(
    idx: tuple[int, int, int, int, int] | None,
    bounds: dict[str, tuple[int | None, int | None]],
) -> bool:
    """False only when the sidecar PROVES no record can match. A
    missing sidecar (idx None) always overlaps."""
    if idx is None:
        return True
    min_off, max_off, min_ts, max_ts, _n = idx
    for col, (file_lo, file_hi) in (
        ("offset", (min_off, max_off)),
        ("timestamp", (min_ts, max_ts)),
    ):
        lo, hi = bounds.get(col, (None, None))
        if lo is None and hi is None:
            continue
        if file_lo > file_hi:
            return False  # empty segment: nothing can match a bound
        if lo is not None and file_hi < lo:
            return False
        if hi is not None and file_lo > hi:
            return False
    return True


class SegmentBatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.directory = options["path"]
        self.columns = _parse_columns(options)
        self.corrupt = _parse_corrupt(options, self.columns)
        self._topics: set[str] | None = None
        self._bounds: dict[str, tuple[int | None, int | None]] = {}

    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        self._topics = _topics_from_filters(filters)
        self._bounds = _bounds_from_filters(filters)
        # topic-equality/IN filters are fully absorbed (file skipping in
        # partitions()). offset/timestamp range filters are absorbed
        # PARTIALLY — they skip non-overlapping files via the sidecar
        # min/max index (parquet row-group pruning, one level up) but
        # stay in the returned list so Spark re-applies them row-level
        # inside kept files. Everything else stays in Spark's plan.
        return [
            f
            for f in filters
            if not (isinstance(f, (EqualTo, In)) and f.attribute == ("topic",))
        ]

    def partitions(self) -> Sequence[InputPartition]:
        paths = list_segments(self.directory)
        if self._topics is not None:
            paths = [p for p in paths if read_header(p)[0] in self._topics]
        if self._bounds:
            paths = [p for p in paths if _index_overlaps(read_index(p), self._bounds)]
        # empty archives still need one no-op partition
        return [SegmentPartition(p) for p in paths] or [SegmentPartition("")]

    def read(self, partition: SegmentPartition) -> Iterator[tuple]:
        if not partition.path:
            return iter(())
        return _rows(partition.path, self.columns, self.corrupt)


class SegmentStreamReader(DataSourceStreamReader):
    """File-index offsets over the sorted archive listing; each
    micro-batch plans one InputPartition per newly-appeared file, so
    record decoding happens on EXECUTORS (the driver only lists the
    directory). A restart resumes from the checkpointed index and
    re-plans the exact same file span — exactly-once replay per
    record over an append-only archive."""

    def __init__(self, options: dict) -> None:
        self.directory = options["path"]
        self.columns = _parse_columns(options)
        self.corrupt = _parse_corrupt(options, self.columns)

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        return {"idx": len(list_segments(self.directory))}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        paths = list_segments(self.directory)[start["idx"] : end["idx"]]
        return [SegmentPartition(p) for p in paths] or [SegmentPartition("")]

    def read(self, partition: SegmentPartition) -> Iterator[tuple]:
        if not partition.path:
            return iter(())
        return _rows(partition.path, self.columns, self.corrupt)

    def commit(self, end: dict) -> None:
        pass  # archives are immutable; nothing to clean up


@dataclass
class SegmentCommit(WriterCommitMessage):
    paths: tuple[str, ...] = ()


class SegmentWriter(DataSourceWriter):
    """``df.write.format("kafka_segment")`` — each task groups its rows
    by (topic, partition) and writes one segment file per group, named
    ``{topic}-{partition}-{taskId}.seg`` so concurrent tasks never
    collide. Executor-side, no driver data movement; `abort` deletes
    every file the failed attempt reported. Rows must be envelope-
    shaped (ENVELOPE_DDL) — exactly what the batch/stream readers and
    `App.process_batch` produce/consume."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.directory = options["path"]
        self.overwrite = overwrite

    def write(self, iterator: Iterator) -> "SegmentCommit":
        import os

        from pyspark import TaskContext

        from kaflow_spark.sources.segments import write_segment

        tid = TaskContext.get().partitionId() if TaskContext.get() else 0
        groups: dict[tuple[str, int], list[dict]] = {}
        for row in iterator:
            ts = row["timestamp"]
            ms = int(ts.timestamp() * 1000) if ts is not None else 0
            headers = [
                (h["key"], bytes(h["value"]) if h["value"] is not None else None)
                for h in (row["headers"] or [])
            ]
            part = row["partition"] if row["partition"] is not None else 0
            groups.setdefault((row["topic"], part), []).append(
                {
                    "offset": row["offset"] if row["offset"] is not None else 0,
                    "ts_ms": ms,
                    "timestamp_type": row["timestamp_type"] or 0,
                    "key": bytes(row["key"]) if row["key"] is not None else None,
                    "value": bytes(row["value"]) if row["value"] is not None else None,
                    "headers": headers,
                }
            )
        os.makedirs(self.directory, exist_ok=True)
        paths = []
        for (topic, part), recs in sorted(groups.items()):
            p = os.path.join(self.directory, f"{topic}-{part}-{tid:05d}.seg")
            write_segment(p, topic, part, recs)
            paths.append(p)
        return SegmentCommit(tuple(paths))

    def commit(self, messages: list) -> None:
        pass  # files are final on task success

    def abort(self, messages: list) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            for p in m.paths:
                for victim in (p, p + ".idx"):
                    try:
                        os.remove(victim)
                    except OSError:
                        pass


class KafkaSegmentDataSource(DataSource):
    """``spark.read.format("kafka_segment").option("path", dir)`` and
    the same via ``readStream`` — envelope-schema records from a
    segment archive directory."""

    @classmethod
    def name(cls) -> str:
        return "kafka_segment"

    def schema(self) -> str:
        cols = _parse_columns(dict(self.options))
        if cols is None:
            return ENVELOPE_DDL
        types = dict(_ENVELOPE_FIELDS)
        return ", ".join(f"{c} {types[c]}" for c in cols)

    def reader(self, schema: StructType) -> SegmentBatchReader:
        return SegmentBatchReader(dict(self.options))

    def streamReader(self, schema: StructType) -> SegmentStreamReader:
        return SegmentStreamReader(dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> SegmentWriter:
        return SegmentWriter(dict(self.options), overwrite)


def register(spark: Any) -> None:
    spark.dataSource.register(KafkaSegmentDataSource)


def read_segments(
    spark: Any,
    directory: str,
    columns: Sequence[str] | None = None,
    corrupt: str | None = None,
):
    """Batch envelope frame from a segment archive. ``columns``
    projects at the SOURCE (canonical envelope order): a metadata-only
    projection never materializes key/value/header bytes — use it for
    offset/lag audits over large archives. ``corrupt`` sets the torn-
    tail policy ("record" = DLQ-routable sentinel row, "raise" = fail
    fast); the default is "record" for full-envelope reads and "raise"
    when the projection strips the ``headers`` marker column (see
    `_parse_corrupt`).

    .. versionchanged:: round 7
       Projected reads (``columns=...`` without ``headers``) over an
       archive containing a torn tail now RAISE by default instead of
       returning an unmarked (offset=-1, epoch-1970) sentinel row.
       Pipelines that want the old best-effort behavior must opt back
       in explicitly with ``corrupt="record"`` (and should include
       ``headers`` so the sentinel is identifiable)."""
    register(spark)
    r = spark.read.format("kafka_segment").option("path", directory)
    if columns is not None:
        r = r.option("columns", ",".join(columns))
    if corrupt is not None:
        r = r.option("corrupt", corrupt)
    return r.load()


def stream_segments(spark: Any, directory: str):
    """Streaming envelope frame from a segment archive."""
    register(spark)
    return spark.readStream.format("kafka_segment").option("path", directory).load()
