"""Kafka-style segment archive files (pure-python format layer).

The reference consumes live Kafka topics (`kaflow/applications.py` —
aiokafka consumer). In this sandbox there is no broker, so the durable
equivalent is a *segment archive*: a directory of append-only binary
files, one topic-partition span per file, holding full record
envelopes (offset, timestamp, key, value, headers) — the same shape a
Kafka log segment stores on a broker's disk. `kafka_segment.py` exposes
these through Spark 4's Python DataSource API as both a batch and a
streaming source.

Format (all integers big-endian):

    file   := magic topic_hdr partition_i32 record*
    magic  := b"KSEG1\\x00"
    topic_hdr := u16 len + utf8 bytes
    record := offset_i64  ts_ms_i64  tstype_i32
              key_i32-len  key-bytes      (-1 length => NULL)
              val_i32-len  val-bytes      (-1 length => NULL)
              nheaders_i32
              (u16 hkey-len + utf8, val_i32-len + bytes)*

The per-file topic/partition header is what makes topic-equality
pushdown a file SKIP (the reader never opens non-matching segments) —
mirroring how Kafka consumers subscribe per topic.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterable, Iterator
from typing import Any

MAGIC = b"KSEG1\x00"

_I32 = struct.Struct(">i")
_U16 = struct.Struct(">H")
_REC_FIXED = struct.Struct(">qqi")  # offset, ts_ms, timestamp_type


def _write_bytes(out: list[bytes], b: bytes | None) -> None:
    if b is None:
        out.append(_I32.pack(-1))
    else:
        out.append(_I32.pack(len(b)))
        out.append(b)


def encode_record(
    offset: int,
    ts_ms: int,
    key: bytes | None,
    value: bytes | None,
    headers: Iterable[tuple[str, bytes | None]] = (),
    timestamp_type: int = 0,
) -> bytes:
    parts: list[bytes] = [_REC_FIXED.pack(offset, ts_ms, timestamp_type)]
    _write_bytes(parts, key)
    _write_bytes(parts, value)
    hdrs = list(headers)
    parts.append(_I32.pack(len(hdrs)))
    for hk, hv in hdrs:
        kb = hk.encode("utf-8")
        parts.append(_U16.pack(len(kb)))
        parts.append(kb)
        _write_bytes(parts, hv)
    return b"".join(parts)


def write_segment(
    path: str,
    topic: str,
    partition: int,
    records: Iterable[dict[str, Any]],
) -> int:
    """Write one segment file; returns the record count.

    Each record dict: offset, ts_ms, key, value, headers (list of
    (str, bytes) pairs), optional timestamp_type.
    """
    n = 0
    tb = topic.encode("utf-8")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(_U16.pack(len(tb)))
        f.write(tb)
        f.write(_I32.pack(partition))
        for r in records:
            f.write(
                encode_record(
                    r["offset"],
                    r["ts_ms"],
                    r.get("key"),
                    r.get("value"),
                    r.get("headers", ()),
                    r.get("timestamp_type", 0),
                )
            )
            n += 1
    return n


def read_header(path: str) -> tuple[str, int, int]:
    """(topic, partition, data_offset) from a segment file; reads only
    the first few bytes — this is what pushdown file-skipping costs."""
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path}: not a KSEG1 segment file")
        (tlen,) = _U16.unpack(f.read(2))
        topic = f.read(tlen).decode("utf-8")
        (partition,) = _I32.unpack(f.read(4))
        return topic, partition, f.tell()


def _read_sized(buf: bytes, pos: int) -> tuple[bytes | None, int]:
    (n,) = _I32.unpack_from(buf, pos)
    pos += 4
    if n < 0:
        return None, pos
    return buf[pos : pos + n], pos + n


def iter_segment(
    path: str,
) -> Iterator[tuple[str, int, int, int, int, bytes | None, bytes | None, list]]:
    """Yield (topic, partition, offset, ts_ms, tstype, key, value,
    headers) for every record in one segment file."""
    topic, partition, start = read_header(path)
    with open(path, "rb") as f:
        f.seek(start)
        buf = f.read()
    pos = 0
    end = len(buf)
    while pos < end:
        offset, ts_ms, tstype = _REC_FIXED.unpack_from(buf, pos)
        pos += _REC_FIXED.size
        key, pos = _read_sized(buf, pos)
        value, pos = _read_sized(buf, pos)
        (nh,) = _I32.unpack_from(buf, pos)
        pos += 4
        headers = []
        for _ in range(nh):
            (klen,) = _U16.unpack_from(buf, pos)
            pos += 2
            hk = buf[pos : pos + klen].decode("utf-8")
            pos += klen
            hv, pos = _read_sized(buf, pos)
            headers.append((hk, hv))
        yield topic, partition, offset, ts_ms, tstype, key, value, headers


def list_segments(directory: str) -> list[str]:
    """Sorted .seg paths — sort order IS the streaming offset order, so
    it must be stable across listings (lexicographic)."""
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(".seg")
    )
