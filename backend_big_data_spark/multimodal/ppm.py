"""A REAL image codec with zero external dependencies: binary PPM (P6).

The multimodal stubs in `binary_ops.py` stand in for JPEG/PNG codecs the
container lacks; PPM needs only byte parsing + numpy, so this module
upgrades the decode/resize path from "deterministic fake" to an actual
codec for one genuine on-disk image format — header parse, raster
decode, nearest-neighbor resize, re-encode — while keeping the exact
same Arrow-batched ``mapInPandas`` shape as the stubs (swap the kernel,
keep the plumbing).

Format (netpbm spec): ``P6`` magic, whitespace-separated width, height,
maxval (≤255 here), ``#`` comments allowed in the header, a single
whitespace byte, then ``height·width·3`` raw RGB bytes.
"""

from __future__ import annotations

import numpy as np

MAGIC = b"P6"


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 raster → binary PPM bytes."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) raster, got {arr.shape}")
    h, w, _ = arr.shape
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def _header_tokens(buf: bytes):
    """Yield (token, end_offset) for the 4 header fields, skipping
    whitespace and ``#``-to-newline comments."""
    i, found = 0, 0
    while found < 4:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if i < len(buf) and buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        start = i
        while i < len(buf) and not buf[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated PPM header")
        found += 1
        yield buf[start:i], i


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM bytes → (h, w, 3) uint8 raster. Raises ValueError on a
    malformed payload (callers route those to the quarantine path)."""
    toks = list(_header_tokens(payload))
    magic, (wtok, _), (htok, _), (mtok, end) = (
        toks[0][0],
        toks[1],
        toks[2],
        toks[3],
    )
    if magic != MAGIC:
        raise ValueError(f"not a P6 PPM (magic {magic!r})")
    w, h, maxval = int(wtok), int(htok), int(mtok)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    raster = payload[end + 1 : end + 1 + h * w * 3]
    if len(raster) != h * w * 3:
        raise ValueError(
            f"raster truncated: want {h * w * 3} bytes, have {len(raster)}"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps (the half-pixel-center
    convention: source index = floor((i + 0.5) · src/dst))."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(int), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(int), w - 1)
    return arr[rows][:, cols]


def channel_stats(arr: np.ndarray) -> list[float]:
    """Per-channel mean and population std feature vector (2·C dims), in
    [0, 1] units — the cheap embedding for dedup/ANN smoke paths. Channel
    count follows the raster (3 for PPM/RGB, 4 for RGBA PNGs)."""
    x = arr.reshape(-1, arr.shape[-1]).astype(np.float64) / 255.0
    return [*x.mean(axis=0).tolist(), *x.std(axis=0).tolist()]


# ---------------------------------------------------------------------------
# PPV1: a minimal real VIDEO container over PPM frames — 4-byte magic
# b'PPV1', uint16 little-endian fps, then each frame as a uint32
# little-endian length prefix + raw PPM bytes. Like the PPM image codec it
# exists so the video demux/sample path can be REAL in this sandbox
# (library-backed containers stay stubbed); the Spark-side plumbing is
# identical for both.
# ---------------------------------------------------------------------------
PPV_MAGIC = b"PPV1"


def encode_ppmv(frames: list[np.ndarray], fps: int) -> bytes:
    """Encode a list of HxWx3 uint8 frames as a PPV1 payload."""
    import struct

    out = [PPV_MAGIC, struct.pack("<H", fps)]
    for arr in frames:
        buf = encode_ppm(arr)
        out.append(struct.pack("<I", len(buf)))
        out.append(buf)
    return b"".join(out)


def decode_ppmv(payload: bytes) -> tuple[int, list[bytes]]:
    """Parse a PPV1 payload → (fps, [raw PPM frame bytes]). Raises
    ValueError on a bad magic or a truncated frame."""
    import struct

    buf = bytes(payload)
    if len(buf) < 6 or buf[:4] != PPV_MAGIC:
        raise ValueError("not a PPV1 payload")
    (fps,) = struct.unpack_from("<H", buf, 4)
    pos, frames = 6, []
    while pos < len(buf):
        if pos + 4 > len(buf):
            raise ValueError("truncated frame length")
        (ln,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        if pos + ln > len(buf):
            raise ValueError("truncated frame body")
        frames.append(buf[pos : pos + ln])
        pos += ln
    return fps, frames
