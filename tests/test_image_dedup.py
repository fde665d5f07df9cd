"""Perceptual-hash image near-dup (round 14): dHash64 + pigeonhole
Hamming blocking + exact bit refine, attested against an O(n^2) brute
force on a planted fixture — recall AND precision 1 at the hash level
by construction (the q146 discipline). No DuckDB oracle: the PNG
decode has no SQL expression (stated, like the multimodal quartet)."""

from __future__ import annotations

import itertools

from kaflow_spark.operators.multimodal import (
    _png_encode,
    _png_pixels,
    dhash64,
    image_near_dup_pairs,
    make_png_payload,
)


def _varied_png(i: int, w: int, h: int) -> bytes:
    """Structurally distinct noise image per id — make_png_payload's
    per-id variation is an additive constant, which a gradient hash
    ignores by design (all bases collide); noise gives every image
    its own gradient structure so the fixture has real negatives."""
    import random

    rnd = random.Random(i * 7919 + 13)
    return _png_encode(
        bytes(rnd.randrange(256) for _ in range(w * h * 3)), w, h, 3
    )


def _perturbed(payload: bytes, delta: int, region: int = 6) -> bytes:
    """A lightly-edited copy: bump a small top-left patch by delta
    (clipped) — the compression/re-encode/crop-ish noise perceptual
    hashing is built to survive."""
    w, h, ch, px = _png_pixels(payload)
    px = bytearray(px)
    for y in range(min(region, h)):
        for x in range(min(region, w) * ch):
            i = y * w * ch + x
            px[i] = min(255, px[i] + delta)
    return _png_encode(bytes(px), w, h, ch)


def _fixture() -> dict[int, bytes]:
    imgs = {i: _varied_png(i, 32, 24) for i in range(40)}
    for i in range(8):
        # near-dups of the first 8 bases; stronger edit on two of
        # them so planted distances span 0..max_bits
        imgs[1000 + i] = _perturbed(imgs[i], 2 if i < 6 else 90)
    return imgs


def _brute_pairs(imgs: dict[int, bytes], max_bits: int):
    hashes = {i: dhash64(p) & ((1 << 64) - 1) for i, p in imgs.items()}
    out = {}
    for a, b in itertools.combinations(sorted(hashes), 2):
        d = bin(hashes[a] ^ hashes[b]).count("1")
        if d <= max_bits:
            out[(a, b)] = d
    return out


def test_dhash_is_deterministic_and_resize_invariant_convention():
    p = make_png_payload(3, 32, 24)
    assert dhash64(p) == dhash64(p)
    # grayscale PNG path (channels=1) also hashes
    w, h, ch, px = _png_pixels(p)
    gray = bytes(
        (299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2]) // 1000
        for i in range(0, len(px), 3)
    )
    assert isinstance(dhash64(_png_encode(gray, w, h, 1)), int)


def test_image_near_dup_matches_brute_force(spark):
    imgs = _fixture()
    want = _brute_pairs(imgs, 6)
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in sorted(imgs.items())],
        "media_id bigint, payload binary",
    )
    got = {
        (r["id_a"], r["id_b"]): r["bit_hamming"]
        for r in image_near_dup_pairs(df, max_bits=6).collect()
    }
    assert got == want
    # the planted light edits are found; the fixture is non-trivial
    # in both directions (some pairs, far from all pairs)
    for i in range(6):
        assert (i, 1000 + i) in got, i
    n = len(imgs)
    assert 0 < len(got) < n * (n - 1) // 4


def test_strong_edit_exceeds_threshold(spark):
    """The delta=90 patch flips enough gradient bits that at a TIGHT
    threshold the pair drops out — the operator filters on exact bit
    distance, not blocking luck. (Self-checked against brute force:
    whatever the true distance, operator == brute at max_bits=1.)"""
    imgs = _fixture()
    want = _brute_pairs(imgs, 1)
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in sorted(imgs.items())],
        "media_id bigint, payload binary",
    )
    got = {
        (r["id_a"], r["id_b"]): r["bit_hamming"]
        for r in image_near_dup_pairs(df, max_bits=1).collect()
    }
    assert got == want
