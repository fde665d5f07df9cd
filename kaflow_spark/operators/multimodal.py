"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` payloads plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so payload bytes cross into
Python once per batch, vectorized.

``decode_image`` and ``decode_audio`` are REAL decoders with no
third-party dependency: PNG (stdlib ``zlib`` inflate + PNG scanline
un-filtering, 8-bit gray/RGB/RGBA) and WAV (RIFF/fmt/data chunk walk
+ PCM16/PCM8 sample stats via stdlib ``audioop``-free integer math).
Other containers (JPEG, FLAC, …) need a codec library this container
lacks and raise a per-format ``ValueError``; ``fake_decode`` remains
for plumbing tests with the synthetic KSMM container. Matching
pure-python encoders (``make_png_payload``/``make_wav_payload``)
generate valid fixtures so the decode path is roundtrip-tested.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


def _decode_stage(
    df: DataFrame, payload_col: str, decode_one, cols: list[str], ddl: str
) -> DataFrame:
    """Shared Arrow-batched decode scaffold: run ``decode_one(media_id,
    payload) -> dict`` over every row, one python call per Arrow batch.
    All decoders (fake/PNG/WAV) share this one stage so batching and
    null/batch-shape behavior can only be fixed in one place."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                decode_one(int(r.media_id), bytes(getattr(r, payload_col)))
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(out, columns=cols)

    return df.mapInPandas(stage, ddl)


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

    cols = ["media_id", "mime", "width", "height", "n_bytes", "checksum"]
    return _decode_stage(df, payload_col, _decode_one, cols, DECODED_DDL)


# ---------------------------------------------------------------- PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def make_png_payload(media_id: int, width: int, height: int) -> bytes:
    """Minimal valid 8-bit RGB PNG with a deterministic pixel pattern
    seeded by ``media_id`` (stdlib-only encoder, filter type 0)."""
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # scanline filter: None
        for x in range(width):
            raw.append((x * 3 + y + media_id) & 0xFF)
            raw.append((x + y * 7 + media_id * 5) & 0xFF)
            raw.append((x * 11 + y * 13 + media_id) & 0xFF)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering (types 0-4, incl. Paeth)."""
    stride = width * bpp
    out = bytearray(stride * height)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        base = y * stride
        prev = base - stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if y:
                for i in range(stride):
                    line[i] = (line[i] + out[prev + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev + i] if y else 0
                line[i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = out[prev + i] if y else 0
                c = out[prev + i - bpp] if (y and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[base : base + stride] = line
    return out


def decode_png(payload: bytes) -> dict:
    """Pure-stdlib PNG decode: chunk walk, inflate, un-filter, pixel
    stats. Supports 8-bit depth, color types 0/2/4/6, no interlace.
    (Front half shared with :func:`resize_png` via
    :func:`_png_pixels`.)"""
    width, height, channels, pixels = _png_pixels(payload)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        # integer mean over all samples in centi-units for determinism
        "mean_px_centi": (sum(pixels) * 100) // max(len(pixels), 1),
    }


IMAGE_DECODED_DDL = (
    "media_id bigint, mime string, width int, height int, channels int, "
    "mean_px_centi bigint, n_bytes int, checksum string"
)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real image decode, dependency-free for PNG (stdlib zlib +
    un-filtering); falls back to Pillow for other containers when it
    is importable, else raises a per-format ``ValueError``. Same
    Arrow-batched ``mapInPandas`` stage shape as ``fake_decode``."""

    def _decode_one(media_id: int, payload: bytes) -> dict:
        if payload[:8] == _PNG_MAGIC:
            px = decode_png(payload)
            mime = "image/png"
        else:
            try:
                import io

                from PIL import Image
            except ImportError:
                raise ValueError(
                    "unsupported image container (pure-python path "
                    "handles PNG; other formats need Pillow)"
                ) from None
            im = Image.open(io.BytesIO(payload))
            data = list(im.convert("RGB").getdata())
            flat = [v for p in data for v in p]
            px = {
                "width": im.width,
                "height": im.height,
                "channels": 3,
                "mean_px_centi": (sum(flat) * 100) // max(len(flat), 1),
            }
            mime = f"image/{(im.format or 'unknown').lower()}"
        return {
            "media_id": media_id,
            "mime": mime,
            **px,
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
        }

    cols = [
        "media_id",
        "mime",
        "width",
        "height",
        "channels",
        "mean_px_centi",
        "n_bytes",
        "checksum",
    ]
    return _decode_stage(df, payload_col, _decode_one, cols, IMAGE_DECODED_DDL)


# ---------------------------------------------------------------- WAV


def make_wav_payload(
    media_id: int, n_samples: int, sample_rate: int = 16000
) -> bytes:
    """Valid mono PCM16 WAV with a deterministic triangle-ish wave
    seeded by ``media_id`` (stdlib-only encoder)."""
    period = 64 + (media_id % 64)
    samples = bytearray()
    for i in range(n_samples):
        phase = i % period
        v = (phase * 2048 - 32768 // 2) % 65536 - 32768
        samples += struct.pack("<h", v)
    data = bytes(samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


AUDIO_DECODED_DDL = (
    "media_id bigint, mime string, sample_rate int, channels int, "
    "bits int, n_samples bigint, duration_ms bigint, rms_milli bigint"
)


def decode_wav(payload: bytes) -> dict:
    """Pure-stdlib WAV decode: RIFF chunk walk, PCM8/PCM16 sample
    stats (integer RMS in milli-units for determinism)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = channels = bits = None
    data = b""
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("malformed WAV: fmt chunk shorter than 16 bytes")
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits not in (8, 16):
                raise ValueError(
                    f"unsupported WAV (fmt={audio_fmt} bits={bits}); "
                    "only PCM 8/16-bit"
                )
            if channels == 0 or rate == 0:
                raise ValueError(
                    f"malformed WAV (channels={channels} rate={rate})"
                )
        elif tag == b"data":
            data = body
    if rate is None:
        raise ValueError("WAV missing fmt chunk")
    if bits == 16:
        vals = struct.unpack(f"<{len(data) // 2}h", data[: len(data) & ~1])
    else:
        vals = tuple(b - 128 for b in data)
    n = len(vals) // channels
    sq = sum(v * v for v in vals)
    rms_milli = int((sq * 1_000_000 // max(len(vals), 1)) ** 0.5)
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "rms_milli": rms_milli,
    }


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real audio decode, dependency-free for WAV/PCM; other
    containers raise ``ValueError`` unless soundfile is importable.
    Same stage shape as ``fake_decode``."""

    def _decode_one(media_id: int, payload: bytes) -> dict:
        if payload[:4] == b"RIFF":
            st = decode_wav(payload)
            mime = "audio/wav"
        else:
            try:
                import io

                import soundfile as sf
            except ImportError:
                raise ValueError(
                    "unsupported audio container (pure-python path "
                    "handles WAV/PCM; other formats need soundfile)"
                ) from None
            buf, rate = sf.read(io.BytesIO(payload))
            n = len(buf)
            st = {
                "sample_rate": int(rate),
                "channels": buf.shape[1] if buf.ndim > 1 else 1,
                "bits": 16,
                "n_samples": n,
                "duration_ms": n * 1000 // int(rate),
                "rms_milli": int(((buf**2).mean() ** 0.5) * 32768_000),
            }
            mime = "audio/unknown"
        return {"media_id": media_id, "mime": mime, **st}

    cols = [
        "media_id",
        "mime",
        "sample_rate",
        "channels",
        "bits",
        "n_samples",
        "duration_ms",
        "rms_milli",
    ]
    return _decode_stage(df, payload_col, _decode_one, cols, AUDIO_DECODED_DDL)


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
    # materialize the body + length once per row: expressions
    # referenced inside a transform() lambda are re-evaluated per
    # element, which would copy the payload once per frame. Prefixed
    # temp names so a caller column can't be clobbered by the drop.
    bcol, lcol = "__ks_frame_body", "__ks_frame_blen"
    stage = df.withColumn(
        bcol, F.expr(f"substring({payload_col}, 29, 2147483647)")
    ).withColumn(lcol, F.length(bcol))
    body, total = F.col(bcol), F.col(lcol)
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
    return stage.withColumn("frame_hashes", frames).drop(bcol, lcol)


# -------------------------------------------------------------- resize


def _png_pixels(payload: bytes) -> tuple[int, int, int, bytearray]:
    """Chunk-walk + inflate + un-filter to the flat sample array —
    the shared front half of :func:`decode_png` and
    :func:`resize_png`. Same support envelope (8-bit, color types
    0/2/4/6, no interlace); raises ``ValueError`` otherwise."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat = 8, bytearray()
    width = height = channels = -1
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            if len(data) < 13:
                raise ValueError("malformed PNG: IHDR shorter than 13 bytes")
            width, height, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            if depth != 8 or ctype not in _PNG_CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={ctype} "
                    f"interlace={interlace}); only 8-bit non-interlaced"
                )
            channels = _PNG_CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if width < 0:
        raise ValueError("malformed PNG: missing IHDR chunk")
    return (
        width,
        height,
        channels,
        _png_unfilter(zlib.decompress(bytes(idat)), width, height, channels),
    )


_PNG_CTYPE_OF_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _png_encode(
    pixels: bytes, width: int, height: int, channels: int
) -> bytes:
    """Stdlib PNG encoder (filter type 0 per scanline) — the
    ``make_png_payload`` writer generalized to arbitrary pixels."""
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _PNG_CTYPE_OF_CHANNELS[channels], 0, 0, 0
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor PNG resize, stdlib-only: decode to the
    flat sample array, sample source coordinates at the fixed grid
    ``src = (dst * in_dim) // out_dim`` (deterministic integer
    arithmetic — no float rounding to diverge across platforms),
    re-encode. Channel count is preserved."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize dimensions must be positive")
    w, h, ch, px = _png_pixels(payload)
    stride = w * ch
    out = bytearray(out_w * out_h * ch)
    o = 0
    for dy in range(out_h):
        sy = (dy * h) // out_h
        row = sy * stride
        for dx in range(out_w):
            sx = row + ((dx * w) // out_w) * ch
            out[o : o + ch] = px[sx : sx + ch]
            o += ch
    return _png_encode(bytes(out), out_w, out_h, ch)


IMAGE_RESIZED_DDL = (
    "media_id bigint, payload binary, width int, height int, channels int"
)


def resize_image(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
) -> DataFrame:
    """Image resize as an Arrow-batched ``mapInPandas`` stage — the
    third stage of the brief's multimodal quartet (decode /
    feature-extract / RESIZE / frame-sample). The PNG path is REAL
    (stdlib decode -> integer nearest-neighbor -> stdlib re-encode);
    other containers raise ``ValueError`` per the environment gate
    (no Pillow in this container — the Spark-side plumbing, schema,
    batch shape and partitioning are the deliverable and are fully
    exercised on PNG). Output rows carry the RESIZED payload as a
    binary column plus its dimensions, ready for a downstream
    decode/feature stage — the thumbnail-pipeline shape
    (scan -> resize -> feature) with nothing but binary and ints
    crossing stage boundaries."""

    def _resize_one(media_id: int, payload: bytes) -> dict:
        resized = resize_png(payload, out_w, out_h)
        w, h, ch, _ = _png_pixels(resized)
        return {
            "media_id": media_id,
            "payload": resized,
            "width": w,
            "height": h,
            "channels": ch,
        }

    cols = ["media_id", "payload", "width", "height", "channels"]
    return _decode_stage(df, payload_col, _resize_one, cols, IMAGE_RESIZED_DDL)


# --------------------------------------------------------------- dHash
# Perceptual-hash image near-duplicate detection (round 14): the
# multimodal twin of the lexical/semantic dedup families. dHash
# (difference hash) is the integer-only perceptual hash — resize to a
# 9x8 grayscale grid, emit one bit per horizontal gradient — which
# composes exactly from machinery this module already has: the
# deterministic nearest-neighbor integer grid of resize_png
# (src = (dst * in) // out) and an integer luma. Hashes land in the
# existing Hamming entity-matching machinery
# (operators/dedup.hamming_pairs): a pair within BIT distance d
# differs in at most d HEX characters, so char-pigeonhole blocking on
# the 16-hex key is recall-complete for bit distance <= d, and the
# exact bit_count refine keeps precision 1. Engine-tested against an
# O(n^2) brute force on a planted fixture (no DuckDB twin: the PNG
# decode has no SQL expression — stated, like the multimodal quartet).


def dhash64(payload: bytes) -> int:
    """64-bit difference hash of a PNG payload, integer-only and
    engine-deterministic: sample a 9x8 grid with the resize_png
    coordinate convention (``src = (dst * dim) // out`` — no float
    rounding), grayscale via integer luma ((299 R + 587 G + 114 B)
    div 1000; first channel when not RGB), one bit per horizontal
    neighbor comparison (left < right). Returned as SIGNED int64
    (bigint-storable); :func:`image_dhash` also emits the 16-hex
    form the Hamming blocking keys on. Raises ``ValueError`` for
    non-PNG payloads (the decode_image support envelope)."""
    w, h, ch, px = _png_pixels(payload)
    stride = w * ch
    grid = []
    for gy in range(8):
        sy = (gy * h) // 8
        row = []
        for gx in range(9):
            sx = (gx * w) // 9
            o = sy * stride + sx * ch
            if ch >= 3:
                g = (
                    299 * px[o] + 587 * px[o + 1] + 114 * px[o + 2]
                ) // 1000
            else:
                g = px[o]
            row.append(g)
        grid.append(row)
    bits = 0
    for gy in range(8):
        for gx in range(8):
            bits = (bits << 1) | (1 if grid[gy][gx] < grid[gy][gx + 1] else 0)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


IMAGE_DHASH_DDL = "media_id bigint, dhash bigint, dhash_hex string"


def image_dhash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-image dHash64: ``(media_id, dhash, dhash_hex)`` — the same
    Arrow-batched ``mapInPandas`` stage shape as the decoders (the
    decode IS the cost; hashing the 9x8 grid is arithmetic)."""

    def _one(media_id: int, payload: bytes) -> dict:
        d = dhash64(payload)
        return {
            "media_id": media_id,
            "dhash": d,
            "dhash_hex": format(d & ((1 << 64) - 1), "016x"),
        }

    return _decode_stage(
        df,
        payload_col,
        _one,
        ["media_id", "dhash", "dhash_hex"],
        IMAGE_DHASH_DDL,
    )


def image_near_dup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    *,
    max_bits: int = 6,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Image near-duplicate pairs ``(id_a, id_b, bit_hamming)`` with
    dHash bit distance <= ``max_bits`` — decode + hash once per
    image, then the two-level pigeonhole Hamming blocking on the
    16-hex key (``hamming_pairs``: recall 1 for char distance <=
    ``max_bits``, and bit distance <= d implies char distance <= d,
    so no true pair can be blocked away), then the exact bit_count
    refine over the pair's own keys (``keep_keys=True`` — no re-join
    against the corpus-sized hash table). Scale shape: images never
    shuffle — only (id, 16-char key) rows enter the blocking join;
    the verify is 16 nibble XOR-popcounts per surviving candidate.
    Precision 1 at the HASH level by construction; semantic precision
    is dHash's (gradient-identical images collide — the standard
    perceptual-hash contract)."""
    from kaflow_spark.operators.dedup import hamming_pairs

    hashes = image_dhash(df, payload_col)
    cand = hamming_pairs(
        hashes,
        "media_id",
        "dhash_hex",
        max_dist=max_bits,
        max_bucket=max_bucket,
        keep_keys=True,
    )
    bit_ham = F.expr(
        "aggregate(transform(sequence(1, 16), i -> "
        "bit_count(CAST(conv(substring(key_a, i, 1), 16, 10) AS INT) ^ "
        "CAST(conv(substring(key_b, i, 1), 16, 10) AS INT))), "
        "CAST(0 AS BIGINT), (a, v) -> a + CAST(v AS BIGINT))"
    )
    return (
        cand.select("id_a", "id_b", bit_ham.alias("bit_hamming"))
        .filter(F.col("bit_hamming") <= max_bits)
    )
