"""Record envelope types (parity: /root/reference/kaflow/message.py:8-23).

``Message`` is the producer-facing raw-bytes record; ``ReadMessage`` is
the deserialized handler-facing view. In the Spark engine these are the
row shape of the envelope DataFrame (FIXTURES.md A1), but handlers
written against the reference API receive exactly these named tuples.
"""

from __future__ import annotations

from typing import Any, NamedTuple


class ReadMessage(NamedTuple):
    """Deserialized record view injected into handlers."""

    value: Any | None = None
    key: Any | None = None
    headers: dict[str, Any] | None = None
    offset: int | None = None
    partition: int | None = None
    timestamp: int | None = None  # epoch millis, like the reference


class Message(NamedTuple):
    """Raw-bytes record a handler returns for publishing."""

    value: bytes | None = None
    key: bytes | None = None
    headers: dict[str, bytes] | None = None
    offset: int | None = None
    partition: int | None = None
    timestamp: int | None = None


# Spark envelope column order shared by the app compiler and TestClient.
ENVELOPE_COLUMNS = (
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestamp_type",
    "key",
    "value",
    "headers",
)

ENVELOPE_DDL = (
    "topic string, partition int, offset bigint, timestamp timestamp, "
    "timestamp_type int, key binary, value binary, "
    "headers array<struct<key: string, value: binary>>"
)

OUTPUT_DDL = (
    "topic string, value binary, key binary, "
    "headers array<struct<key: string, value: binary>>"
)
