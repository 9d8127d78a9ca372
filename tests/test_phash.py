"""Perceptual dHash near-dup: hash determinism, brightness invariance,
banded-blocking completeness at radius <= 3, quarantine convention."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from backend_big_data_spark.multimodal.phash import (
    dhash64,
    dhash_image_batch,
    hamming_near_dup_pairs,
)
from backend_big_data_spark.multimodal.png import encode_png


def _img(seed: int, w: int = 32, h: int = 24) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_dhash_deterministic_and_brightness_invariant():
    base = _img(1)
    assert dhash64(base) == dhash64(base.copy())
    # uniform brightness shift leaves every gradient sign unchanged —
    # pre-clip the BASE at 215 so adding 40 saturates no pixel and the
    # pooled-block ordering is preserved exactly
    clipped = np.clip(base, 0, 215).astype(np.uint8)
    brighter = (clipped.astype(np.int16) + 40).astype(np.uint8)
    assert dhash64(clipped) == dhash64(brighter)
    assert dhash64(base) != dhash64(_img(2))


def test_dhash_batch_exact_when_cobatched_with_quarantine(spark):
    """A quarantine None in the SAME Arrow batch must not degrade the
    other hashes: a plain pandas int column with a None coerces to
    float64, which silently zeroes the low bits of any hash > 2^53 —
    the corrupted hash then misses its own near-dups forever. Force a
    single partition so the None co-batches with a real image."""
    from backend_big_data_spark.multimodal.phash import dhash_image_batch
    from backend_big_data_spark.multimodal.ppm import encode_ppm

    img = _img(21, 32, 24)
    want = dhash64(img)
    assert abs(want) > (1 << 53)  # the seed was picked to need low bits
    media = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img))), (2, bytearray(b"garbage"))],
        "media_id long, payload binary",
    ).coalesce(1)
    got = {r.media_id: r.dhash for r in dhash_image_batch(media, "ppm").collect()}
    assert got == {1: want, 2: None}


def test_dhash_small_image_rejected():
    with pytest.raises(ValueError):
        dhash64(np.zeros((4, 4, 3), dtype=np.uint8))


def test_phash_pipeline_finds_near_dups(spark):
    base = _img(7, 40, 32)
    # near-dup: flip a single pixel slightly — at most a couple of
    # gradient bits move
    tweaked = base.copy()
    tweaked[5, 5, 0] = np.uint8((int(tweaked[5, 5, 0]) + 3) % 256)
    other = _img(8, 40, 32)
    media = _media(
        spark,
        [
            (1, bytearray(encode_png(base))),
            (2, bytearray(encode_png(tweaked))),
            (3, bytearray(encode_png(other))),
            (4, bytearray(b"not a png")),  # quarantine
        ],
    )
    hashes = dhash_image_batch(media, codec="png")
    rows = {r.media_id: r.dhash for r in hashes.collect()}
    assert rows[4] is None
    assert rows[1] == dhash64(base)  # driver-side replay agrees
    pairs = hamming_near_dup_pairs(hashes).collect()
    got = {(r.media_id_a, r.media_id_b): r.hamming for r in pairs}
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert all(k == (1, 2) for k in got)  # distinct images not paired


def test_banded_blocking_is_lossless_at_radius_3(spark):
    """Every pair within Hamming 3 must surface: compare the banded path
    against a brute-force cross join on crafted hash values."""
    vals = [
        (1, 0x0123456789ABCDEF),
        (2, 0x0123456789ABCDEE),  # distance 1 from id 1
        (3, 0x0123456789ABCD0F),  # distance 3 from id 1
        (4, -0x0123456789ABCDF0),  # far from everything
        (5, 0x0123456789ABCDEF),  # identical to id 1
    ]
    df = spark.createDataFrame(vals, "media_id long, dhash long")
    got = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in hamming_near_dup_pairs(df, max_distance=3).collect()
    }
    a = df.alias("a")
    b = df.alias("b")
    brute = (
        a.crossJoin(b)
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("x"),
            F.col("b.media_id").alias("y"),
            F.bit_count(
                F.col("a.dhash").bitwiseXOR(F.col("b.dhash"))
            ).cast("int").alias("d"),
        )
        .filter(F.col("d") <= 3)
    )
    want = {(r.x, r.y): r.d for r in brute.collect()}
    assert got == want and (1, 5) in got and got[(1, 5)] == 0


def test_radius_above_blocking_guarantee_rejected(spark):
    df = spark.createDataFrame([(1, 7)], "media_id long, dhash long")
    with pytest.raises(ValueError):
        hamming_near_dup_pairs(df, max_distance=5)
