"""Energy-envelope fingerprints: audio and video near-duplication.

Completes the multimodal dedup family (`phash.py` covers images): every
modality gets a 64-bit perceptual fingerprint computed in one Arrow-batched
map pass, and every modality shares the SAME pair generator —
`phash.hamming_near_dup_pairs` (4×16-bit band blocking + exact
``bit_count(xor)`` verify, lossless for Hamming ≤ 3 by pigeonhole).

- ``envelope_hash64``: the audio analog of dHash. Mean-absolute-amplitude
  envelope pooled onto an 8×9 grid (72 equal time windows read row-major),
  bit (r, c) = 1 iff grid[r][c+1] > grid[r][c]. Encoding-invariant (PCM
  in, integer math throughout), amplitude-SCALING sensitive but
  amplitude-SHIFT tolerant the way dHash tolerates brightness shifts:
  only the *ordering* of adjacent window energies matters. Public
  technique family: energy-envelope / band-energy audio fingerprints
  (Chromaprint-style sign-of-delta bits, minus the FFT — the time-domain
  envelope keeps the whole path integer-deterministic).
- ``video_sig64``: per-frame dHash (`phash.dhash64`) folded by per-bit
  strict majority vote across frames. Re-encoding a video or perturbing a
  minority of frames preserves the signature; changing the dominant
  content flips it.

Scale shape (identical to the image path): fingerprinting is one
``mapInPandas`` pass — no shuffle, payloads decoded exactly once, never
revisited. Pair generation is the shared banded join. Malformed payloads
yield a NULL-fingerprint quarantine row (the module-wide convention), and
the batch columns are built as pandas nullable Int64 so one quarantine
row cannot coerce co-batched hashes through float64 (the dhash lesson:
values > 2^53 would silently lose low bits).

Reference scope note: the reference engine (CiccioRomeo/backend-big-data)
has no audio/video surface; this module is part of the additive
training-data-pipeline capability set the build brief asks for.
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.multimodal.phash import (
    DEFAULT_MAX_DISTANCE,
    dhash64,
    hamming_near_dup_pairs,
)

#: envelope grid shape — 8 rows × 9 columns of time windows, row-major,
#: giving 8 sign-of-delta bits per row exactly like dHash.
_ROWS, _COLS = 8, 9
_WINDOWS = _ROWS * _COLS


def envelope_hash64(arr: np.ndarray) -> int:
    """64-bit energy-envelope hash of int16 PCM ``(n,)`` or ``(n, ch)``.

    Integer-only: channels mix down by ``sum // ch``; the mean absolute
    amplitude of each of 72 equal windows (edges at ``i·n//72``) forms an
    8×9 grid read row-major; bit (r, c) = 1 iff grid[r][c+1] > grid[r][c].
    Window means (``sum // len``) make the hash invariant to uniform
    resampling. Clips shorter than 72 samples are rejected (ValueError →
    quarantine row)."""
    a = np.asarray(arr, dtype=np.int64)
    if a.ndim == 2:
        a = a.sum(axis=1) // a.shape[1] if a.shape[1] > 1 else a[:, 0]
    n = a.shape[0]
    if n < _WINDOWS:
        raise ValueError(f"clip of {n} samples too short (need >= {_WINDOWS})")
    amp = np.abs(a)
    edges = [i * n // _WINDOWS for i in range(_WINDOWS + 1)]
    grid = np.empty((_ROWS, _COLS), dtype=np.int64)
    for w in range(_WINDOWS):
        seg = amp[edges[w] : edges[w + 1]]
        grid[w // _COLS, w % _COLS] = int(seg.sum()) // seg.size
    bits = 0
    for r in range(_ROWS):
        for c in range(_COLS - 1):
            bits = (bits << 1) | int(grid[r, c + 1] > grid[r, c])
    return bits - (1 << 64) if bits >= (1 << 63) else bits  # signed 64-bit


def video_sig64(frame_hashes: list[int]) -> int:
    """Fold per-frame dHashes into one 64-bit signature by per-bit strict
    majority (bit = 1 iff more than half the frames set it; ties → 0).
    Empty input is rejected (ValueError → quarantine row)."""
    if not frame_hashes:
        raise ValueError("no frames to fold")
    n = len(frame_hashes)
    bits = 0
    for i in range(64):
        votes = sum((h >> i) & 1 for h in frame_hashes)
        bits |= (votes * 2 > n) << i
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def audio_fp_batch(media: DataFrame, codec: str = "wav") -> DataFrame:
    """(media_id, payload) → (media_id long, afp64 long): decode PCM via
    `multimodal/wav.py` and envelope-hash the samples. Malformed or
    too-short payloads yield a NULL-afp64 quarantine row."""
    if codec != "wav":
        raise ValueError(f"unknown built-in audio codec {codec!r}")

    def compute(batches):
        import pandas as pd

        from backend_big_data_spark.multimodal.wav import decode_wav

        for pdf in batches:
            out = {"media_id": [], "afp64": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    samples, _rate = decode_wav(bytes(payload or b""))
                    out["afp64"].append(envelope_hash64(samples))
                except (ValueError, struct.error):
                    out["afp64"].append(None)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="Int64"),
                    "afp64": pd.array(out["afp64"], dtype="Int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        compute, schema="media_id long, afp64 long"
    )


def video_sig_batch(media: DataFrame) -> DataFrame:
    """(media_id, payload) → (media_id long, vsig64 long): decode the
    PPV1 container (`multimodal/ppm.py`), dHash every frame, fold by
    per-bit majority. Malformed containers, zero-frame videos, and
    videos where EVERY frame fails to hash yield a NULL-vsig64
    quarantine row; individually undecodable frames are skipped (they
    simply lose their vote)."""

    def compute(batches):
        import pandas as pd

        from backend_big_data_spark.multimodal.ppm import decode_ppm, decode_ppmv

        for pdf in batches:
            out = {"media_id": [], "vsig64": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    _fps, frames = decode_ppmv(bytes(payload or b""))
                    hashes = []
                    for fr in frames:
                        try:
                            hashes.append(dhash64(decode_ppm(fr)))
                        except (ValueError, struct.error):
                            continue
                    out["vsig64"].append(video_sig64(hashes))
                except (ValueError, struct.error):
                    out["vsig64"].append(None)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="Int64"),
                    "vsig64": pd.array(out["vsig64"], dtype="Int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        compute, schema="media_id long, vsig64 long"
    )


def audio_near_dup_pairs(
    fps: DataFrame, max_distance: int = DEFAULT_MAX_DISTANCE
) -> DataFrame:
    """All (media_id_a < media_id_b) audio pairs with envelope-hash
    Hamming ≤ ``max_distance`` — the shared banded-blocking operator."""
    return hamming_near_dup_pairs(
        fps.select("media_id", F.col("afp64").alias("dhash")), max_distance
    )


def video_near_dup_pairs(
    sigs: DataFrame, max_distance: int = DEFAULT_MAX_DISTANCE
) -> DataFrame:
    """All (media_id_a < media_id_b) video pairs with majority-signature
    Hamming ≤ ``max_distance`` — the shared banded-blocking operator."""
    return hamming_near_dup_pairs(
        sigs.select("media_id", F.col("vsig64").alias("dhash")), max_distance
    )


__all__ = [
    "audio_fp_batch",
    "audio_near_dup_pairs",
    "envelope_hash64",
    "video_near_dup_pairs",
    "video_sig64",
    "video_sig_batch",
]
