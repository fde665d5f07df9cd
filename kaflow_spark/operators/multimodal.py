"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payloads plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so payload bytes cross into
Python once per batch, vectorized.

The actual codec step is STUBBED: the image/audio libraries are not
in this container, so ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless a library is importable, and the
tested path uses ``fake_decode`` — a deterministic parser of the
engine's own synthetic payload format. The Spark-side plumbing
(schemas, batching, partition behavior, UDF signatures) is real and
is what the tests cover.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_META_DDL = "mime string, width int, height int, duration_ms bigint"
MEDIA_DDL = f"payload binary, meta struct<{MEDIA_META_DDL}>"

# decoded-feature schema appended by decode stages
DECODED_DDL = (
    "media_id bigint, mime string, width int, height int, "
    "n_bytes int, checksum string"
)

_MAGIC = b"KSMM"  # kaflow-spark multimodal fake container


def make_fake_payload(media_id: int, mime: str, width: int, height: int) -> bytes:
    """Deterministic synthetic payload: magic + header + seeded body.
    Stands in for a real JPEG/WAV container in tests."""
    header = struct.pack(
        ">4sII16s", _MAGIC, width, height, mime.encode()[:16].ljust(16, b"\x00")
    )
    body = hashlib.sha256(f"{media_id}:{mime}:{width}x{height}".encode()).digest()
    return header + body * 4


def attach_fake_media(df: DataFrame, id_col: str) -> DataFrame:
    """Attach a payload+meta media column derived from the id column —
    gives every pipeline test a realistic binary-column shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            rows = []
            for i in ids:
                w, h = 64 + (i % 8) * 16, 64 + (i % 5) * 16
                rows.append(
                    {
                        "media_id": i,
                        "payload": make_fake_payload(i, "image/fake", w, h),
                        "meta": {
                            "mime": "image/fake",
                            "width": w,
                            "height": h,
                            "duration_ms": None,
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    return df.select(F.col(id_col)).mapInPandas(
        gen, f"media_id bigint, {MEDIA_DDL}"
    )


def fake_decode(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """The tested decode stage: parses the fake container header and
    emits per-media features. Real decoders drop in by replacing the
    body of ``_decode_one`` — batching/schema/partitioning identical."""

    def _decode_one(media_id: int, payload: bytes) -> dict:
        magic, width, height, mime = struct.unpack(">4sII16s", payload[:28])
        if magic != _MAGIC:
            raise ValueError("bad media payload")
        return {
            "media_id": media_id,
            "mime": mime.rstrip(b"\x00").decode(),
            "width": width,
            "height": height,
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
        }

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _decode_one(int(r.media_id), bytes(getattr(r, payload_col)))
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "mime",
                    "width",
                    "height",
                    "n_bytes",
                    "checksum",
                ],
            )

    return df.mapInPandas(stage, DECODED_DDL)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode — requires an image library that is NOT in
    this container. The plumbing is ``fake_decode``'s; only the codec
    body differs."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding needs Pillow; use fake_decode for plumbing "
            "tests in this environment"
        ) from exc
    raise NotImplementedError("wire PIL.Image.open into fake_decode's stage")


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real audio decode — requires an audio library (soundfile /
    librosa) that is NOT in this container. Same stage shape as
    ``fake_decode``."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "audio decoding needs soundfile; use audio_features for "
            "plumbing tests in this environment"
        ) from exc
    raise NotImplementedError("wire soundfile.read into fake_decode's stage")


AUDIO_FEATURES_DDL = "media_id bigint, n_windows int, energy array<double>"


def audio_features(
    df: DataFrame, payload_col: str = "payload", window_bytes: int = 64
) -> DataFrame:
    """Audio feature-extraction plumbing: windows the payload body and
    emits a per-window energy-like statistic (deterministic byte mean
    standing in for RMS over PCM frames). The batching, schema, and
    array-column output match what a real mel/RMS extractor produces.
    """

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_rows = []
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                body = bytes(getattr(r, payload_col))[28:]
                wins = [
                    body[i : i + window_bytes]
                    for i in range(0, max(len(body), 1), window_bytes)
                ]
                energy = [
                    (sum(w) / len(w)) if w else 0.0 for w in wins
                ]
                out_rows.append(
                    {
                        "media_id": r.media_id,
                        "n_windows": len(wins),
                        "energy": energy,
                    }
                )
            yield pd.DataFrame(out_rows, columns=["media_id", "n_windows", "energy"])
            out_rows = []

    return df.mapInPandas(stage, AUDIO_FEATURES_DDL)


def frame_sample(df: DataFrame, payload_col: str = "payload", n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling: slices the payload body into
    ``n_frames`` equal windows and fingerprints each — the shape of a
    video keyframe sampler, minus the codec."""
    body = F.expr(f"substring({payload_col}, 29, 2147483647)")
    total = F.length(body)
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    # frame k covers bytes [k*len/n, (k+1)*len/n)
    frames = F.transform(
        idx,
        lambda i: F.md5(
            body.substr(
                (i * total / n_frames).cast("int") + 1,
                F.greatest((total / n_frames).cast("int"), F.lit(1)),
            ).cast("binary")
        ),
    )
    return df.withColumn("frame_hashes", frames)
