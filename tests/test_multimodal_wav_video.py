"""REAL audio (WAV/PCM) and video (PPV1 container) paths — the
multimodal modalities that need no external codec library, proving the
same mapInPandas plumbing the stubbed library codecs would use."""

from __future__ import annotations

import numpy as np
import pytest

from backend_big_data_spark.multimodal.ppm import (
    decode_ppm,
    decode_ppmv,
    encode_ppm,
    encode_ppmv,
)
from backend_big_data_spark.multimodal.wav import (
    audio_features,
    decode_audio_batch,
    decode_wav,
    encode_wav,
)


def test_wav_round_trip_mono_and_stereo():
    sr = 8000
    mono = (np.sin(np.linspace(0, 40 * np.pi, 4000)) * 20000).astype(np.int16)
    arr, got_sr = decode_wav(encode_wav(mono, sr))
    assert got_sr == sr and arr.shape == (4000, 1)
    assert np.array_equal(arr[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1)
    arr2, _ = decode_wav(encode_wav(stereo, sr))
    assert arr2.shape == (4000, 2)
    assert np.array_equal(arr2, stereo)


def test_wav_features_known_signals():
    sr = 1000
    silence = np.zeros(500, dtype=np.int16)
    f = audio_features(decode_wav(encode_wav(silence, sr))[0], sr)
    assert f["rms_fp"] == 0 and f["peak_fp"] == 0 and f["duration_ms"] == 500
    # full-scale square wave: |x| = 32767/32768 everywhere -> rms_fp 1000
    square = np.tile(np.array([32767, -32767], dtype=np.int16), 250)
    f2 = audio_features(decode_wav(encode_wav(square, sr))[0], sr)
    assert f2["rms_fp"] == 1000 and f2["peak_fp"] == 1000
    assert f2["zero_crossings"] == 499  # flips every sample


def test_wav_rejects_garbage_and_walks_chunks():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")
    # an extra LIST chunk between fmt and data must not break the walk
    import struct

    sr, samples = 4000, np.arange(10, dtype=np.int16)
    buf = bytearray(encode_wav(samples, sr))
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    patched = bytes(buf[:fmt_end]) + extra + bytes(buf[fmt_end:])
    patched = struct.pack("<4sI", b"RIFF", len(patched) - 8) + patched[8:]
    arr, got_sr = decode_wav(patched)
    assert got_sr == sr and np.array_equal(arr[:, 0], samples)


def test_decode_audio_batch_spark_path(spark):
    sr = 8000
    tone = (np.sin(np.linspace(0, 80 * np.pi, 8000)) * 16000).astype(np.int16)
    rows = [
        (1, bytearray(encode_wav(tone, sr))),
        (2, bytearray(b"garbage payload")),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r.media_id: r for r in decode_audio_batch(media).collect()}
    assert out[1].ok and out[1].sample_rate == sr
    assert out[1].duration_ms == 1000 and out[1].n_samples == 8000
    # expected fixed-point RMS computed by the same kernel (unit-tested
    # against known signals above)
    want = audio_features(np.asarray(tone, dtype=np.int16)[:, None], sr)
    assert out[1].rms_fp == want["rms_fp"]
    assert not out[2].ok  # quarantine row, job did not fail
    with pytest.raises(NotImplementedError):
        decode_audio_batch(media, codec="mp3")


def _frames(n):
    return [
        np.full((4, 6, 3), i * 10, dtype=np.uint8) for i in range(n)
    ]


def test_ppmv_round_trip():
    frames = _frames(5)
    fps, raw = decode_ppmv(encode_ppmv(frames, fps=10))
    assert fps == 10 and len(raw) == 5
    for i, buf in enumerate(raw):
        assert np.array_equal(decode_ppm(buf), frames[i])
    with pytest.raises(ValueError):
        decode_ppmv(b"XXXX")
    with pytest.raises(ValueError):
        decode_ppmv(encode_ppmv(frames, fps=10)[:-3])  # truncated body


def test_sample_video_frames_real_container(spark):
    # 10 fps, every_ms=300 -> step = round(10*0.3) = 3 -> frames 0,3,6,9
    payload = encode_ppmv(_frames(10), fps=10)
    media = spark.createDataFrame(
        [(7, bytearray(payload))], "media_id long, payload binary"
    )
    from backend_big_data_spark.multimodal.binary_ops import sample_video_frames

    rows = sorted(
        sample_video_frames(media, every_ms=300, codec="ppmv").collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 3, 6, 9]
    assert [r.ts_ms for r in rows] == [0, 300, 600, 900]
    # sampled frame bytes are REAL decodable PPM rasters
    got = decode_ppm(bytes(rows[1].frame))
    assert np.array_equal(got, _frames(10)[3])


def test_malformed_riff_payloads_raise_value_error_not_crash():
    """A RIFF/WAVE container with a pathological fmt chunk must raise
    ValueError (the quarantine convention), never ZeroDivisionError or
    struct.error — one bad payload must not fail a whole Spark job."""
    import struct

    sr = 8000
    mono = (np.arange(64) % 32 * 1000).astype(np.int16)
    good = bytearray(encode_wav(mono, sr))
    # fmt body starts at offset 20; channels is its 2nd uint16 (offset 22)
    zero_ch = bytes(good[:22]) + struct.pack("<H", 0) + bytes(good[24:])
    with pytest.raises(ValueError):
        decode_wav(zero_ch)
    # fmt chunk declaring 16 bytes but truncated mid-body
    trunc = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + struct.pack("<4sI", b"fmt ", 16) + b"\x01\x00\x02\x00"
    )
    with pytest.raises(ValueError):
        decode_wav(trunc)


def test_decode_audio_batch_quarantines_malformed_riff(spark):
    """Batch decode over a mix of valid / 0-channel / truncated payloads
    yields ok=false rows for the malformed ones instead of failing."""
    import struct

    sr = 8000
    mono = (np.arange(64) % 32 * 1000).astype(np.int16)
    good = encode_wav(mono, sr)
    zero_ch = good[:22] + struct.pack("<H", 0) + good[24:]
    trunc = (
        b"RIFF" + struct.pack("<I", 20) + b"WAVE"
        + struct.pack("<4sI", b"fmt ", 16) + b"\x01\x00\x02\x00"
    )
    media = spark.createDataFrame(
        [(1, good), (2, zero_ch), (3, trunc)], "media_id long, payload binary"
    )
    rows = {r.media_id: r.ok for r in decode_audio_batch(media).collect()}
    assert rows == {1: True, 2: False, 3: False}
