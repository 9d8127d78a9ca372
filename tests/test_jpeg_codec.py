"""Baseline-JFIF JPEG codec (multimodal/jpeg.py): round-trips across
subsampling modes and restart intervals, exactness on flat rasters (all
AC/DC residuals quantize to zero), spec-shape assertions on the emitted
container, malformed-input quarantine, and the Spark batch paths.

No imaging library exists in this container, so correctness evidence is
(a) exact closed-form cases (flat rasters, DC-only blocks), (b) bounded
reconstruction error on smooth content — lossy-codec error must stay at
quantization scale, and (c) container-level checks (markers, stuffing,
restart alignment) that any external decoder would rely on.
"""

from __future__ import annotations

import numpy as np
import pytest

from backend_big_data_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    return (img // 2 + 60).astype(np.uint8)  # mid-range: no clipping at edges


def test_flat_rasters_round_trip_exactly():
    """A flat image has only a DC coefficient which quantizes and
    reconstructs without residual — decode must be bit-exact."""
    flat_gray = np.full((16, 24, 1), 128, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat_gray)), flat_gray)
    flat_color = np.zeros((8, 8, 3), dtype=np.uint8)
    flat_color[..., 0], flat_color[..., 1], flat_color[..., 2] = 200, 100, 50
    assert np.array_equal(decode_jpeg(encode_jpeg(flat_color, "444")), flat_color)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_smooth_content_error_stays_at_quantization_scale(sub):
    img = _gradient(37, 53)  # odd dims: exercises padding + crop
    dec = decode_jpeg(encode_jpeg(img, sub))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 10
    assert err.mean() <= 2.5


def test_restart_intervals_round_trip():
    img = _gradient(37, 53)
    plain = decode_jpeg(encode_jpeg(img, "420"))
    with_dri = decode_jpeg(encode_jpeg(img, "420", restart_interval=2))
    # RSTn resets predictors but must not change the reconstruction
    assert np.array_equal(plain, with_dri)


def test_noise_round_trip_bounded():
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(noise, "444"))
    err = np.abs(dec.astype(int) - noise.astype(int))
    # high-frequency content is where a lossy codec spends its loss; the
    # bound just asserts sanity, exactness lives in the flat-raster test
    assert err.max() <= 80 and err.mean() <= 15


def test_container_shape_and_stuffing():
    img = _gradient(16, 16)
    buf = encode_jpeg(img, "444", restart_interval=1)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    # every 0xFF inside entropy data is stuffed or a marker: scanning for
    # 0xFF followed by a byte that is neither 0x00 nor a marker id must
    # find nothing
    i = 2
    while i < len(buf) - 1:
        if buf[i] == 0xFF:
            nxt = buf[i + 1]
            assert nxt == 0x00 or nxt >= 0xC0, f"unstuffed 0xFF at {i}"
            i += 2
        else:
            i += 1
    assert b"\xff\xd0" in buf  # at least one restart marker emitted


def test_single_block_dc_only_is_exact():
    """An 8x8 with one mid value: DC = 8*(v-128)/8... closed form aside,
    the decoded block must equal the constant input exactly."""
    for v in (0, 77, 128, 255):
        blk = np.full((8, 8, 1), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(blk))
        assert np.array_equal(out, blk), v


def test_malformed_payloads_raise_value_error():
    good = encode_jpeg(np.full((8, 8, 1), 90, dtype=np.uint8))
    bad_inputs = [
        b"",
        b"nope",
        b"\xff\xd8\x00\x00",          # garbage after SOI
        good[:-20],                    # truncated mid-stream
        good[:2] + good[4:],           # segment boundary corrupted
    ]
    for bad in bad_inputs:
        with pytest.raises(ValueError):
            decode_jpeg(bad)


def test_progressive_sof_rejected():
    good = bytearray(encode_jpeg(np.full((8, 8, 1), 90, dtype=np.uint8)))
    i = good.find(b"\xff\xc0")
    good[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(good))


def test_spark_decode_image_batch_jpeg(spark):
    from backend_big_data_spark.multimodal.binary_ops import decode_image_batch

    img = _gradient(24, 16)
    media = spark.createDataFrame(
        [(1, encode_jpeg(img, "420")), (2, b"not a jpeg")],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in decode_image_batch(media, codec="jpeg").collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (16, 24, 3)
    assert rows[2].width is None  # quarantined, job did not fail
    feats = np.array(rows[1].features)
    want = img.reshape(-1, 3).astype(np.float64) / 255.0
    assert np.allclose(feats[:3], want.mean(axis=0), atol=0.02)


def test_spark_resize_image_batch_jpeg(spark):
    from backend_big_data_spark.multimodal.binary_ops import resize_image_batch

    img = _gradient(32, 32)
    media = spark.createDataFrame(
        [(1, encode_jpeg(img, "444")), (2, b"\xff\xd8broken")],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in
            resize_image_batch(media, 8, 8, codec="jpeg").collect()}
    assert (rows[1].width, rows[1].height) == (8, 8)
    out = decode_jpeg(bytes(rows[1].payload))
    assert out.shape == (8, 8, 3)
    assert rows[2].payload is None
