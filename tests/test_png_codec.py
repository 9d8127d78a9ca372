"""Real PNG codec (multimodal/png.py): round-trips, all five scanline
filters on decode, CRC/truncation errors, and the Spark decode/resize
paths with codec='png'."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from backend_big_data_spark.multimodal.png import _chunk, _paeth, decode_png, encode_png


def _raster(h, w, ch, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8).astype(np.uint8)


def test_round_trip_rgb_and_rgba():
    for ch in (3, 4):
        arr = _raster(13, 9, ch)
        out = decode_png(encode_png(arr))
        assert out.shape == arr.shape and np.array_equal(out, arr)


def _encode_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Independent encoder applying a CHOSEN filter per scanline — proves
    the decoder's unfilter math against forward-filtered data."""
    h, w, ch = arr.shape
    color_type = 2 if ch == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * ch
    flat = arr.reshape(h, stride).astype(int)
    raw = bytearray()
    for y, f in enumerate(filters):
        raw.append(f)
        for x in range(stride):
            cur = flat[y][x]
            a = flat[y][x - ch] if x >= ch else 0
            b = flat[y - 1][x] if y > 0 else 0
            c = flat[y - 1][x - ch] if (y > 0 and x >= ch) else 0
            if f == 0:
                v = cur
            elif f == 1:
                v = cur - a
            elif f == 2:
                v = cur - b
            elif f == 3:
                v = cur - ((a + b) >> 1)
            else:
                v = cur - _paeth(a, b, c)
            raw.append(v & 0xFF)
    sig = b"\x89PNG\r\n\x1a\n"
    return (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_decoder_handles_all_five_filters():
    arr = _raster(5, 7, 3, seed=3)
    payload = _encode_with_filters(arr, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), arr)
    # RGBA too (filter offsets move with the channel count)
    arr4 = _raster(5, 4, 4, seed=5)
    payload4 = _encode_with_filters(arr4, [4, 3, 2, 1, 0])
    assert np.array_equal(decode_png(payload4), arr4)


def test_bad_inputs_raise_value_error():
    arr = _raster(4, 4, 3)
    good = encode_png(arr)
    with pytest.raises(ValueError):
        decode_png(b"definitely not a png")
    corrupted = bytearray(good)
    corrupted[-10] ^= 0xFF  # flip a byte inside IEND/CRC territory
    with pytest.raises(ValueError):
        decode_png(bytes(corrupted))
    with pytest.raises(ValueError):
        decode_png(good[:30])  # truncated mid-chunk
    # 16-bit / palette / interlaced shapes are out of scope -> ValueError
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad_depth = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr16)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad_depth)


def test_spark_decode_and_resize_png(spark):
    from backend_big_data_spark.multimodal.binary_ops import (
        decode_image_batch,
        resize_image_batch,
    )
    from backend_big_data_spark.multimodal.ppm import channel_stats

    rgb = _raster(8, 6, 3, seed=11)
    rgba = _raster(4, 4, 4, seed=12)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_png(rgb))),
            (2, bytearray(encode_png(rgba))),
            (3, bytearray(b"garbage")),
        ],
        "media_id long, payload binary",
    )
    dec = {r.media_id: r for r in decode_image_batch(media, codec="png").collect()}
    assert (dec[1].width, dec[1].height, dec[1].channels) == (6, 8, 3)
    assert (dec[2].width, dec[2].height, dec[2].channels) == (4, 4, 4)
    assert dec[1].features == pytest.approx(channel_stats(rgb))
    assert len(dec[2].features) == 8  # RGBA -> 4 means + 4 stds
    assert dec[3].width is None  # quarantine row

    rez = {r.media_id: r for r in
           resize_image_batch(media, 3, 2, codec="png").collect()}
    assert (rez[1].width, rez[1].height) == (3, 2)
    got = decode_png(bytes(rez[1].payload))
    assert got.shape == (2, 3, 3)
    assert rez[3].payload is None


def test_wrong_length_ihdr_raises_value_error():
    """An IHDR whose length is not 13 (but with a VALID chunk CRC) must
    raise ValueError, not struct.error — the batch quarantine catch at
    multimodal/binary_ops.py depends on the ValueError convention."""
    sig = b"\x89PNG\r\n\x1a\n"
    bad = sig + _chunk(b"IHDR", b"\x00" * 10) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)


def test_spark_decode_quarantines_wrong_length_ihdr(spark):
    from backend_big_data_spark.multimodal.binary_ops import decode_image_batch

    sig = b"\x89PNG\r\n\x1a\n"
    bad = sig + _chunk(b"IHDR", b"\x00" * 10) + _chunk(b"IEND", b"")
    good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, good), (2, bad)], "media_id long, payload binary"
    )
    rows = {r.media_id: r.width for r in
            decode_image_batch(media, codec="png").collect()}
    assert rows[1] == 4 and rows[2] is None
