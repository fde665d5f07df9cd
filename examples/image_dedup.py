"""Multimodal (image) dedup pipeline on kaflow_spark (round 14).

Perceptual near-duplicate detection over an image column — the
multimodal member of the near-dup family (MinHash/SimHash/prefix/
winnowing lexical, IVF-cosine semantic, dHash perceptual): decode
PNG payloads (stdlib-real), dHash64 each (integer 9x8 gradient
grid), block with the two-level pigeonhole Hamming machinery the
entity-resolution family already uses, exact bit-distance refine,
then connected components + keeper — the same downstream shape as
the lexical q83/q137 pipeline, over binary media.

stages:
  corpus  — synthesize a deterministic PNG corpus (fixture pattern
            per media_id) + planted light-edit near-dups
  hash    — dHash64 per image (Arrow-batched mapInPandas; images
            never shuffle — only (id, 16-hex key) rows move)
  pairs   — pigeonhole-blocked candidates, exact bit_count refine
  cluster — connected components over the pair set; keep-lowest-id
            per cluster; surviving image count

    PYTHONPATH=/root/repo python examples/image_dedup.py
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kaflow_spark import get_spark
from kaflow_spark.operators.graph import connected_components
from kaflow_spark.operators.multimodal import (
    _png_encode,
    _png_pixels,
    image_dhash,
    image_near_dup_pairs,
)


def _varied_png(i: int, w: int, h: int) -> bytes:
    """Structurally distinct noise image per id. The fixture
    make_png_payload pattern varies only by an ADDITIVE constant per
    media_id — which a gradient hash ignores by design (every base
    collided into one cluster when this example first ran on it);
    per-id noise gives each image its own gradient structure."""
    import random

    rnd = random.Random(i * 7919 + 13)
    return _png_encode(
        bytes(rnd.randrange(256) for _ in range(w * h * 3)), w, h, 3
    )


def _perturbed(payload: bytes, delta: int) -> bytes:
    w, h, ch, px = _png_pixels(payload)
    px = bytearray(px)
    for y in range(6):
        for x in range(6 * ch):
            i = y * w * ch + x
            px[i] = min(255, px[i] + delta)
    return _png_encode(bytes(px), w, h, ch)


def main() -> None:
    spark = get_spark("image-dedup", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- corpus: 120 distinct images + 20 planted light edits
    imgs = {i: _varied_png(i, 48, 32) for i in range(120)}
    for i in range(20):
        imgs[10_000 + i] = _perturbed(imgs[i], 2)
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in sorted(imgs.items())],
        "media_id bigint, payload binary",
    )
    print(f"corpus: {len(imgs)} images ({len(imgs) - 120} planted edits)")

    # ---- hash: one Arrow decode+hash pass
    hashes = image_dhash(df)
    n_hashes = hashes.count()
    print(f"hashed: {n_hashes} dHash64 keys")

    # ---- pairs: blocked + refined
    pairs = image_near_dup_pairs(df, max_bits=6).persist()
    rows = pairs.collect()
    planted_found = sum(
        1 for r in rows if r["id_b"] - r["id_a"] == 10_000
    )
    print(
        f"pairs: {len(rows)} within 6 bits "
        f"({planted_found}/20 planted edits found)"
    )
    assert planted_found == 20, "planted recall must be total"

    # ---- cluster + keeper: the q83/q137 downstream, on images
    cc = connected_components(pairs, "id_a", "id_b")
    keep = cc.groupBy("component").agg(
        F.min("node").alias("keeper"), F.count("*").alias("size")
    )
    n_dropped = cc.count() - keep.count()
    print(
        f"clusters: {keep.count()} (keep-lowest-id), "
        f"{n_dropped} images dropped, "
        f"{len(imgs) - n_dropped} survive"
    )
    pairs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
