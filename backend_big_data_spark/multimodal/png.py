"""Real PNG codec — stdlib ``zlib`` + numpy only, no imaging library.

PNG's container is chunked (length + type + data + CRC32) and its pixel
stream is zlib-compressed scanlines, each prefixed by a filter byte —
all of which the standard library covers. Scope: 8-bit, color type 2
(RGB) and 6 (RGBA), non-interlaced — the overwhelmingly common web/PNG
export shape. The DECODER implements all five scanline filters (None /
Sub / Up / Average / Paeth, RFC 2083 §6) and validates chunk CRCs; the
ENCODER writes filter-0 rows (valid PNG, universally readable).

This upgrades PNG from "stubbed behind fake=True" to a fully real path
(like PPM / WAV / PPV1); JPEG stays honestly stubbed — its entropy
coding genuinely needs a codec library this container lacks.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an HxWx3 (RGB) or HxWx4 (RGBA) uint8 raster as a PNG
    (8-bit, non-interlaced, filter 0 scanlines)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError("expected HxWx3 or HxWx4 uint8 raster")
    h, w, ch = a.shape
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG → HxWxC uint8. Supports 8-bit RGB/RGBA,
    non-interlaced, any scanline filter; validates chunk CRCs. Raises
    ValueError on anything else (quarantine convention upstream)."""
    buf = bytes(payload)
    if len(buf) < 8 or buf[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(buf):
        (ln,) = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(buf):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + ln)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            if len(data) != 13:  # wrong-length IHDR would raise struct.error
                raise ValueError(f"IHDR must be 13 bytes, got {len(data)}")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG shape (depth={depth}, color={color_type}, "
            f"interlace={interlace}) — only 8-bit RGB/RGBA non-interlaced"
        )
    ch = 3 if color_type == 2 else 4
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:  # corrupt stream
        raise ValueError(f"bad IDAT stream: {exc}") from None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("pixel stream length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        fbyte = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if fbyte == 0:  # None
            cur = row
        elif fbyte == 2:  # Up
            cur = (row + prev) & 0xFF
        else:
            cur = row.copy()
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if fbyte == 1:  # Sub
                    cur[x] = (cur[x] + a) & 0xFF
                elif fbyte == 3:  # Average
                    cur[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                elif fbyte == 4:  # Paeth
                    c = prev[x - ch] if x >= ch else 0
                    cur[x] = (cur[x] + _paeth(int(a), int(b), int(c))) & 0xFF
                else:
                    raise ValueError(f"unknown filter byte {fbyte}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, ch)


__all__ = ["decode_png", "encode_png"]
