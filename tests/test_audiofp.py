"""Audio envelope-hash and video majority-signature near-dup: hash
determinism + invariances, surgical bit-flip construction, majority-fold
suppression of minority frames, quarantine convention, nullable-Int64
co-batch exactness (the dhash float64-coercion lesson)."""

from __future__ import annotations

import numpy as np
import pytest

from backend_big_data_spark.multimodal.audiofp import (
    audio_fp_batch,
    audio_near_dup_pairs,
    envelope_hash64,
    video_near_dup_pairs,
    video_sig64,
    video_sig_batch,
)
from backend_big_data_spark.multimodal.phash import dhash64
from backend_big_data_spark.multimodal.ppm import encode_ppm, encode_ppmv
from backend_big_data_spark.multimodal.wav import encode_wav


def _clip(seed: int, n: int = 7200) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(-20000, 20000, size=n).astype(np.int16)


def _grid_clip(v: np.ndarray, win: int = 25) -> np.ndarray:
    """72 constant windows from an 8x9 value grid — envelope == grid."""
    return np.repeat(v.reshape(-1), win).astype(np.int16)


def _v(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 251, size=(8, 9)).astype(np.int64)


def test_envelope_hash_deterministic_and_scaling_sensitive():
    a = _clip(1)
    assert envelope_hash64(a) == envelope_hash64(a.copy())
    assert envelope_hash64(a) != envelope_hash64(_clip(2))
    # uniform resampling (each sample doubled) preserves window MEANS
    assert envelope_hash64(np.repeat(a, 2)) == envelope_hash64(a)


def test_envelope_hash_mono_mixdown_and_short_clip():
    a = _clip(3)
    stereo = np.stack([a, a], axis=1)
    assert envelope_hash64(stereo) == envelope_hash64(a)
    with pytest.raises(ValueError):
        envelope_hash64(_clip(4, n=50))  # < 72 samples


def test_envelope_hash_last_window_flip_is_surgical():
    """Adjusting window (r, 8) flips exactly bit (r, 7) — the analytic
    construction the oracle-gated registry query relies on."""
    v = _v(5)
    base = envelope_hash64(_grid_clip(v))
    for n_flips in range(4):
        w = v.copy()
        for r in range(n_flips):
            v7, v8 = int(w[r, 7]), int(w[r, 8])
            w[r, 8] = v7 if v8 > v7 else v7 + 1
        ham = bin((base ^ envelope_hash64(_grid_clip(w))) & ((1 << 64) - 1)).count("1")
        assert ham == n_flips


def test_video_sig_majority_suppresses_minority_frame():
    """Two agreeing frames out-vote one noise frame: the signature equals
    the base frame's dHash, and changing ONLY the noise frame leaves the
    signature unchanged."""

    def raster(v):
        g = np.repeat(np.repeat(v.astype(np.uint8), 2, 0), 2, 1)
        return np.stack([g] * 3, axis=2)

    base, noise_a, noise_b = _v(6), _v(7), _v(8)
    h_base = dhash64(raster(base))
    sig_a = video_sig64([h_base, h_base, dhash64(raster(noise_a))])
    sig_b = video_sig64([h_base, h_base, dhash64(raster(noise_b))])
    assert sig_a == h_base == sig_b
    with pytest.raises(ValueError):
        video_sig64([])


def test_audio_fp_batch_exact_when_cobatched_with_quarantine(spark):
    """A quarantine None sharing the Arrow batch must not degrade the
    other fingerprints through float64 coercion (needs |fp| > 2^53)."""
    for seed in range(1, 50):
        clip = _clip(seed)
        want = envelope_hash64(clip)
        if abs(want) > (1 << 53):
            break
    else:
        pytest.fail("no seed produced a high-bit fingerprint")
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(clip, 8000))), (2, bytearray(b"garbage"))],
        "media_id long, payload binary",
    ).coalesce(1)
    got = {r.media_id: r.afp64 for r in audio_fp_batch(media).collect()}
    assert got == {1: want, 2: None}


def test_audio_near_dup_pairs_end_to_end(spark):
    """WAV encode → fingerprint → banded pairs finds exactly the near
    variant at its constructed distance; the far variant (8 flips, two
    per band) is excluded."""
    v = _v(9)
    near, far = v.copy(), v.copy()
    for r in range(2):
        v7, v8 = int(near[r, 7]), int(near[r, 8])
        near[r, 8] = v7 if v8 > v7 else v7 + 1
    for r in range(8):
        v7, v8 = int(far[r, 7]), int(far[r, 8])
        far[r, 8] = v7 if v8 > v7 else v7 + 1
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(_grid_clip(v), 8000))),
            (2, bytearray(encode_wav(_grid_clip(near), 8000))),
            (3, bytearray(encode_wav(_grid_clip(far), 8000))),
        ],
        "media_id long, payload binary",
    )
    pairs = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in audio_near_dup_pairs(audio_fp_batch(media)).collect()
    }
    assert pairs == {(1, 2): 2}


def test_video_sig_batch_quarantine_and_pairs(spark):
    """Container parse failures and zero-frame videos quarantine; intact
    3-frame videos pair by majority signature."""

    def raster(v):
        g = np.repeat(np.repeat(v.astype(np.uint8), 2, 0), 2, 1)
        return np.stack([g] * 3, axis=2)

    v = _v(10)
    near = v.copy()
    v7, v8 = int(near[0, 7]), int(near[0, 8])
    near[0, 8] = v7 if v8 > v7 else v7 + 1
    noise = _v(11)
    vid = encode_ppmv([raster(v), raster(v), raster(noise)], fps=4)
    vid_near = encode_ppmv([raster(near), raster(near), raster(noise)], fps=4)
    media = spark.createDataFrame(
        [
            (1, bytearray(vid)),
            (2, bytearray(vid_near)),
            (3, bytearray(b"not a video")),
            (4, bytearray(encode_ppmv([], fps=4))),
        ],
        "media_id long, payload binary",
    )
    sigs = video_sig_batch(media)
    got = {r.media_id: r.vsig64 for r in sigs.collect()}
    assert got[3] is None and got[4] is None
    assert got[1] is not None and got[2] is not None
    pairs = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in video_near_dup_pairs(sigs).collect()
    }
    assert pairs == {(1, 2): 1}


def test_video_sig_batch_skips_undecodable_frames(spark):
    """A corrupt frame loses its vote but the video still hashes: with
    one of three frames corrupt, majority degrades to 2-frame strict
    majority (ties -> 0)."""
    import struct

    def raster(v):
        g = np.repeat(np.repeat(v.astype(np.uint8), 2, 0), 2, 1)
        return np.stack([g] * 3, axis=2)

    v, noise = _v(12), _v(13)
    good = encode_ppm(raster(v))
    bad = b"P6 corrupt"
    payload = (
        b"PPV1"
        + struct.pack("<H", 4)
        + struct.pack("<I", len(good))
        + good
        + struct.pack("<I", len(bad))
        + bad
        + struct.pack("<I", len(good))
        + encode_ppm(raster(noise))
    )
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    (row,) = video_sig_batch(media).collect()
    h1, h2 = dhash64(raster(v)), dhash64(raster(noise))
    assert row.vsig64 == video_sig64([h1, h2])
