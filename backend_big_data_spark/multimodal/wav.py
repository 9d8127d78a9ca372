"""Real WAV (RIFF/PCM) audio codec — pure stdlib + numpy, no audio
library required, so unlike JPEG/MP3 (sandbox-blocked, stubbed) the audio
modality gets a fully REAL decode path: parse → samples → features, all
testable end-to-end.

Scope: 16-bit PCM, the canonical uncompressed interchange form. The
parser walks RIFF chunks properly (fmt/data may be preceded by LIST/fact
chunks in real files) instead of assuming the fixed 44-byte layout.

The Spark-side shape is identical to the image path
(`multimodal/binary_ops.py`): payloads stay opaque ``binary`` columns,
decode runs Arrow-batched inside `mapInPandas`, features come back as
typed columns. Swapping in a compressed codec later changes the kernel,
not the plumbing.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples (shape (n,) mono or (n, ch)) as a PCM WAV."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    body = b"WAVE" + fmt + data_chunk
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM WAV → (samples int16 (n, ch), sample_rate). Walks the
    RIFF chunk list; raises ValueError on non-RIFF / non-PCM input."""
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # truncated fmt would raise struct.error
                raise ValueError(f"fmt chunk too short ({len(body)} bytes)")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, ch, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_format}, bits={bits})")
    if ch < 1:  # 0 channels would divide by zero below
        raise ValueError("fmt chunk declares 0 channels")
    arr = np.frombuffer(data, dtype="<i2")
    arr = arr[: (len(arr) // ch) * ch].reshape(-1, ch)
    return arr, sample_rate


def audio_features(arr: np.ndarray, sample_rate: int) -> dict:
    """Deterministic per-clip features over int16 PCM: duration, RMS and
    peak in integer milli-units of full scale (fixed-point — the engine's
    cross-engine determinism convention), plus zero-crossing count of the
    first channel."""
    n = int(arr.shape[0])
    ch = int(arr.shape[1])
    x = arr.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    peak = float(np.max(np.abs(x))) if n else 0.0
    zc = int(np.sum(np.signbit(x[1:, 0]) != np.signbit(x[:-1, 0]))) if n > 1 else 0
    return {
        "sample_rate": sample_rate,
        "channels": ch,
        "n_samples": n,
        "duration_ms": int(n * 1000 // sample_rate) if sample_rate else 0,
        "rms_fp": int(np.floor(rms * 1000 + 0.5)),
        "peak_fp": int(np.floor(peak * 1000 + 0.5)),
        "zero_crossings": zc,
    }


def decode_audio_batch(media, codec: str = "wav"):
    """Per-clip audio feature extraction over a media table
    (media_id, payload binary) → typed feature columns. REAL decode for
    ``codec='wav'`` (this module); compressed codecs raise
    ``NotImplementedError`` — the sandbox has no audio libraries, and the
    WAV path proves the identical mapInPandas plumbing they would use.
    Map-only: scales with the scan; un-parseable payloads yield a row
    with ``ok=false`` instead of failing the job (quarantine semantics,
    like the ingest path)."""
    if codec != "wav":
        raise NotImplementedError(
            f"codec {codec!r} requires an audio library; the real WAV/PCM "
            "path is built in"
        )

    def compute(batches):
        import pandas as pd

        cols = [
            "media_id", "ok", "sample_rate", "channels", "n_samples",
            "duration_ms", "rms_fp", "peak_fp", "zero_crossings",
        ]
        for pdf in batches:
            out = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    arr, sr = decode_wav(bytes(payload or b""))
                    feats = audio_features(arr, sr)
                    out["ok"].append(True)
                    for k, v in feats.items():
                        out[k].append(v)
                except (ValueError, struct.error, ZeroDivisionError):
                    out["ok"].append(False)
                    for k in cols[2:]:
                        out[k].append(0)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        compute,
        schema=(
            "media_id long, ok boolean, sample_rate int, channels int, "
            "n_samples int, duration_ms long, rms_fp long, peak_fp long, "
            "zero_crossings int"
        ),
    )


__all__ = [
    "audio_features",
    "decode_audio_batch",
    "decode_wav",
    "encode_wav",
]
