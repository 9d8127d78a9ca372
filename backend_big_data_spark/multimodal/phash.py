"""Perceptual difference-hash (dHash) image near-duplication.

The image twin of the text MinHash pipeline: decode → 64-bit perceptual
fingerprint (Arrow-batched Python, the only non-JVM stage) → banded
blocking + exact Hamming verify (pure Catalyst: ``shiftrightunsigned``,
``xor``, ``bit_count``). dHash (row-wise brightness gradients over an
8×8 downsample; public technique, cf. the widely-documented
dHash/aHash/pHash family) is brightness-shift invariant and survives
re-encoding/resizing — the near-dup signal exact sha256 fingerprints
(`binary_ops.fingerprint_binary`) cannot give.

Scale shape: hashing is one map pass (no shuffle). Pair generation
NEVER compares all pairs — the 64-bit hash splits into four 16-bit
bands and only rows sharing a band meet (pigeonhole: Hamming distance
≤ 3 guarantees ≥ 1 equal band, so blocking is lossless for the default
radius). The band join is a shuffle on 16-bit keys; the verify is a
map-side ``bit_count(xor)``. Identical to the MinHash LSH band
discipline in `text/dedup.py`.

Determinism: grayscale and pooling are integer arithmetic (``// 1000``
luma, block-sum ``//`` area) — no float rounding anywhere, so the same
payload hashes identically on any platform.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Hamming radius for which 4-band blocking is provably lossless.
DEFAULT_MAX_DISTANCE = 3


def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash of an (H, W, C) uint8 raster.

    Integer-only: luma = (299R + 587G + 114B) // 1000; average-pool to an
    8×9 grid (8 rows × 9 columns — the standard dHash shape: 9 columns
    give 8 horizontal comparisons per row) by block-sum // block-area,
    row edges at i·H//8, column edges at j·W//9;
    bit (r, c) = 1 iff grid[r][c+1] > grid[r][c]. Images narrower or
    shorter than the grid are rejected (ValueError → quarantine row)."""
    h, w = arr.shape[0], arr.shape[1]
    if h < 8 or w < 9:
        raise ValueError(f"image {w}x{h} too small for dhash (need >= 9x8)")
    a = arr.astype(np.int64)
    if arr.shape[2] >= 3:
        gray = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    else:
        gray = a[:, :, 0]
    ys = [i * h // 8 for i in range(9)]
    xs = [j * w // 9 for j in range(10)]
    grid = np.empty((8, 9), dtype=np.int64)
    for r in range(8):
        for c in range(9):
            block = gray[ys[r] : ys[r + 1], xs[c] : xs[c + 1]]
            grid[r, c] = int(block.sum()) // block.size
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | int(grid[r, c + 1] > grid[r, c])
    return bits - (1 << 64) if bits >= (1 << 63) else bits  # signed 64-bit


def dhash_image_batch(media: DataFrame, codec: str = "png") -> DataFrame:
    """(media_id, payload) → (media_id long, dhash long): decode via the
    named built-in codec (`multimodal/{png,ppm,jpeg}.py`) and dHash the
    raster. Malformed payloads yield a NULL-dhash quarantine row — the
    same convention as `binary_ops.decode_image_batch`."""
    if codec not in ("ppm", "png", "jpeg"):
        raise ValueError(f"unknown built-in codec {codec!r}")

    def compute(batches):
        import pandas as pd

        from backend_big_data_spark.multimodal.jpeg import decode_jpeg
        from backend_big_data_spark.multimodal.png import decode_png
        from backend_big_data_spark.multimodal.ppm import decode_ppm

        decode = {"ppm": decode_ppm, "png": decode_png, "jpeg": decode_jpeg}[codec]
        for pdf in batches:
            out = {"media_id": [], "dhash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    out["dhash"].append(dhash64(decode(bytes(payload or b""))))
                except (ValueError, struct.error):
                    out["dhash"].append(None)
            # nullable Int64, NOT a plain DataFrame: one quarantine None in
            # the batch would coerce the column to float64 and silently
            # zero the low bits of every co-batched hash > 2^53 — the
            # corrupted hash then misses its own near-dups forever
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="Int64"),
                    "dhash": pd.array(out["dhash"], dtype="Int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        compute, schema="media_id long, dhash long"
    )


def hamming_near_dup_pairs(
    hashes: DataFrame, max_distance: int = DEFAULT_MAX_DISTANCE
) -> DataFrame:
    """All (media_id_a < media_id_b) pairs with Hamming(dhash) ≤
    ``max_distance`` — banded blocking, exact verify, zero Python.

    For ``max_distance`` ≤ 3 the 4×16-bit band split is lossless
    (pigeonhole); larger radii trade recall exactly like wider LSH
    bands would, and the docstring contract is the place that says so."""
    if max_distance > 3:
        raise ValueError(
            "4-band blocking is only lossless for max_distance <= 3; "
            "re-band (8 x 8-bit) before raising the radius"
        )
    h = hashes.filter(F.col("dhash").isNotNull())
    # band identity = (position, value): tag by position via posexplode
    bands = h.select(
        "media_id",
        "dhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("dhash"), 16 * i).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for i in range(4)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_idx") == F.col("b.band_idx"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.media_id") < F.col("b.media_id"),
            ],
        )
        .select(
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .dropDuplicates(["media_id_a", "media_id_b"])
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_distance)
        .select("media_id_a", "media_id_b", "hamming")
    )


__all__ = [
    "DEFAULT_MAX_DISTANCE",
    "dhash64",
    "dhash_image_batch",
    "hamming_near_dup_pairs",
]
