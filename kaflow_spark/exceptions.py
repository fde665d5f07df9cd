"""Engine exceptions (parity: /root/reference/kaflow/exceptions.py:13-16)."""

from __future__ import annotations

from kaflow_spark.message import Message


class KaflowSparkException(Exception):
    pass


class DeserializationError(KaflowSparkException):
    """Value/key/header decode failure; carries the raw record so the
    dead-letter channel can preserve it (the reference attaches the
    original ConsumerRecord the same way)."""

    def __init__(self, part: str, raw: Message, cause: Exception) -> None:
        super().__init__(f"failed to deserialize {part}: {cause}")
        self.part = part
        self.raw = raw
        self.cause = cause
