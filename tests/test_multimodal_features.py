"""Audio energy/silence segmentation + video scene-cut detection over
the built-in WAV/PPV1 codecs: known-signal verdicts, quarantine rows,
determinism."""

from __future__ import annotations

import numpy as np

from backend_big_data_spark.multimodal.features import (
    audio_energy_segments,
    video_scene_cuts,
)
from backend_big_data_spark.multimodal.ppm import encode_ppmv
from backend_big_data_spark.multimodal.wav import encode_wav


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_audio_silence_and_energy(spark):
    rate = 1000  # 1 kHz → 100-ms window = 100 samples
    loud = np.full(100, 20000, dtype=np.int16)
    quiet = np.zeros(100, dtype=np.int16)
    samples = np.concatenate([loud, quiet, loud])
    media = _media(
        spark,
        [
            (1, bytearray(encode_wav(samples, rate))),
            (2, bytearray(b"junk not riff")),
        ],
    )
    rows = audio_energy_segments(media, window_ms=100).collect()
    by = {(r.media_id, r.window_idx): r for r in rows}
    assert by[(1, 0)].rms_fp == 20000 and not by[(1, 0)].is_silence
    assert by[(1, 1)].rms_fp == 0 and by[(1, 1)].is_silence
    assert by[(1, 2)].rms_fp == 20000
    assert by[(1, 0)].start_ms == 0 and by[(1, 1)].start_ms == 100
    assert by[(2, None)].rms_fp is None  # quarantine, job survives


def test_audio_zero_sample_wav_yields_quarantine_row(spark):
    """A structurally valid WAV whose data chunk holds no samples must
    still produce one NULL-window quarantine row — every media id stays
    accounted for downstream (same convention as the decode-failure
    path and video_scene_cuts' <2-frame case)."""
    empty = np.zeros(0, dtype=np.int16)
    media = _media(spark, [(7, bytearray(encode_wav(empty, 1000)))])
    rows = audio_energy_segments(media, window_ms=100).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.media_id == 7 and r.window_idx is None and r.rms_fp is None


def test_audio_stereo_averages_channels(spark):
    rate = 1000
    stereo = np.stack(
        [np.full(100, 1000, dtype=np.int16), np.full(100, 3000, dtype=np.int16)],
        axis=1,
    )
    media = _media(spark, [(1, bytearray(encode_wav(stereo, rate)))])
    rows = audio_energy_segments(media, window_ms=100).collect()
    assert rows[0].rms_fp == 2000  # (1000+3000)//2


def test_video_scene_cuts(spark):
    black = np.zeros((8, 8, 3), dtype=np.uint8)
    dark = np.full((8, 8, 3), 5, dtype=np.uint8)
    white = np.full((8, 8, 3), 255, dtype=np.uint8)
    payload = encode_ppmv([black, dark, white, white], fps=2)
    media = _media(
        spark,
        [
            (1, bytearray(payload)),
            (2, bytearray(b"bad payload")),
            (3, bytearray(encode_ppmv([black], fps=2))),  # single frame
        ],
    )
    rows = video_scene_cuts(media).collect()
    by = {(r.media_id, r.frame_idx): r for r in rows}
    # black->dark: mean delta 5 → 500 x100 → below 3000 threshold
    assert by[(1, 1)].delta_x100 == 500 and not by[(1, 1)].is_cut
    # dark->white: mean delta 250 → 25000 → cut
    assert by[(1, 2)].delta_x100 == 25000 and by[(1, 2)].is_cut
    # white->white: identical
    assert by[(1, 3)].delta_x100 == 0 and not by[(1, 3)].is_cut
    assert by[(1, 1)].ts_ms == 500 and by[(1, 2)].ts_ms == 1000
    assert by[(2, None)].delta_x100 is None
    assert by[(3, None)].delta_x100 is None
    # deterministic on re-run
    again = {(r.media_id, r.frame_idx): r.delta_x100 for r in video_scene_cuts(media).collect()}
    assert again == {k: v.delta_x100 for k, v in by.items()}
