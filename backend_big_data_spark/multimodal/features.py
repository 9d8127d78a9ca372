"""Audio/video feature extraction over the built-in codecs — the
analysis stage that follows decode in a multimodal curation pipeline.

Both operators are 1→N Arrow-batched generators (`mapInPandas`), the
same Spark shape as `binary_ops.sample_video_frames`: each payload row
yields a bounded set of feature rows, malformed payloads yield one
quarantine row (NULL metrics) instead of failing the job. All math is
integer fixed-point so results are platform-deterministic.

- ``audio_energy_segments``: windowed RMS energy over WAV/PCM payloads
  plus a silence verdict per window — the primitive under voice-activity
  detection, silence trimming, and "is this clip dead air" curation
  filters.
- ``video_scene_cuts``: mean absolute inter-frame difference over PPV1
  video payloads with a cut verdict per frame transition — the primitive
  under scene segmentation and keyframe selection.

At 100 TB both are embarrassingly parallel map passes: no shuffle, no
state, output bounded by payload duration; Spark just needs the binary
column partitioned into reasonable task sizes (`maxPartitionBytes`).
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

#: silence threshold: windows with RMS below max_amplitude/2^6 are
#: "silent" (integer shift, no float compare).
SILENCE_SHIFT = 6

#: scene-cut threshold: mean |frame delta| above this (0..255 scale,
#: fixed-point x100) flags a cut.
CUT_THRESHOLD_X100 = 3000


def audio_energy_segments(
    media: DataFrame, window_ms: int = 100
) -> DataFrame:
    """(media_id, payload) → one row per ``window_ms`` window:
    (media_id, window_idx, start_ms, rms_fp, is_silence). ``rms_fp`` is
    floor(sqrt(mean(sample²))) over int64 accumulators — exact for PCM16.
    Malformed payloads yield a single NULL-window quarantine row."""

    def compute(batches):
        import math

        import pandas as pd

        from backend_big_data_spark.multimodal.wav import decode_wav

        for pdf in batches:
            out = {
                "media_id": [], "window_idx": [], "start_ms": [],
                "rms_fp": [], "is_silence": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, rate = decode_wav(bytes(payload or b""))
                    if rate <= 0:
                        raise ValueError("bad sample rate")
                except (ValueError, struct.error, ZeroDivisionError):
                    out["media_id"].append(mid)
                    out["window_idx"].append(None)
                    out["start_ms"].append(None)
                    out["rms_fp"].append(None)
                    out["is_silence"].append(None)
                    continue
                mono = samples.astype("int64")
                if mono.ndim == 2:  # average channels, integer floor
                    mono = mono.sum(axis=1) // mono.shape[1]
                if len(mono) == 0:
                    # structurally valid WAV, zero samples: quarantine row,
                    # same as the decode-failure path — every media id
                    # stays accounted for downstream
                    out["media_id"].append(mid)
                    out["window_idx"].append(None)
                    out["start_ms"].append(None)
                    out["rms_fp"].append(None)
                    out["is_silence"].append(None)
                    continue
                win = max(1, rate * window_ms // 1000)
                thresh = 32768 >> SILENCE_SHIFT
                for w in range(0, max(len(mono), 1), win):
                    chunk = mono[w : w + win]
                    if len(chunk) == 0:
                        break
                    ms = int((chunk * chunk).sum()) // len(chunk)
                    rms = math.isqrt(ms)
                    out["media_id"].append(mid)
                    out["window_idx"].append(w // win)
                    out["start_ms"].append(w * 1000 // rate)
                    out["rms_fp"].append(rms)
                    out["is_silence"].append(rms < thresh)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        compute,
        schema="media_id long, window_idx int, start_ms long, "
        "rms_fp long, is_silence boolean",
    )


def video_scene_cuts(media: DataFrame) -> DataFrame:
    """(media_id, payload) → one row per frame TRANSITION:
    (media_id, frame_idx, ts_ms, delta_x100, is_cut). ``delta_x100`` is
    the mean absolute per-pixel difference between consecutive decoded
    PPV1 frames, fixed-point ×100 on the 0..255 scale. Malformed
    payloads (or single-frame videos) yield one NULL-delta quarantine
    row so every media id stays accounted for downstream."""

    def compute(batches):
        import numpy as np
        import pandas as pd

        from backend_big_data_spark.multimodal.ppm import (
            decode_ppm,
            decode_ppmv,
        )

        for pdf in batches:
            out = {
                "media_id": [], "frame_idx": [], "ts_ms": [],
                "delta_x100": [], "is_cut": [],
            }

            def quarantine(mid):
                out["media_id"].append(mid)
                out["frame_idx"].append(None)
                out["ts_ms"].append(None)
                out["delta_x100"].append(None)
                out["is_cut"].append(None)

            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    fps, frames = decode_ppmv(bytes(payload or b""))
                    rasters = [
                        decode_ppm(f).astype(np.int64) for f in frames
                    ]
                except (ValueError, struct.error):
                    quarantine(mid)
                    continue
                if len(rasters) < 2:
                    quarantine(mid)
                    continue
                for i in range(1, len(rasters)):
                    a, b = rasters[i - 1], rasters[i]
                    if a.shape != b.shape:
                        d_x100 = 25500  # max delta: treat as a hard cut
                    else:
                        d_x100 = int(
                            100 * int(np.abs(a - b).sum()) // a.size
                        )
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * 1000 // fps if fps else 0)
                    out["delta_x100"].append(d_x100)
                    out["is_cut"].append(d_x100 >= CUT_THRESHOLD_X100)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        compute,
        schema="media_id long, frame_idx int, ts_ms long, "
        "delta_x100 long, is_cut boolean",
    )


__all__ = [
    "CUT_THRESHOLD_X100",
    "SILENCE_SHIFT",
    "audio_energy_segments",
    "video_scene_cuts",
]
