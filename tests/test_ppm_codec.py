"""The real (numpy-only) PPM codec: pure codec tests plus the Spark
mapInPandas decode/resize path over genuine image bytes."""

from __future__ import annotations

import numpy as np
import pytest

from backend_big_data_spark.multimodal.ppm import (
    channel_stats,
    decode_ppm,
    encode_ppm,
    resize_nearest,
)


def _checker(h, w):
    """(h, w, 3) checkerboard: white where (r+c) even, red elsewhere."""
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    rr, cc = np.indices((h, w))
    even = (rr + cc) % 2 == 0
    arr[even] = [255, 255, 255]
    arr[~even] = [255, 0, 0]
    return arr


def test_ppm_round_trip():
    arr = _checker(5, 7)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)


def test_ppm_header_comments_and_whitespace():
    arr = _checker(2, 3)
    raw = encode_ppm(arr)
    body = raw[raw.index(b"255\n") + 4 :]
    commented = b"P6 # magic\n# a comment line\n 3\t2 \n255\n" + body
    assert np.array_equal(decode_ppm(commented), arr)


@pytest.mark.parametrize(
    "bad",
    [
        b"P5\n2 2\n255\n" + b"\x00" * 12,  # wrong magic
        b"P6\n2 2\n65535\n" + b"\x00" * 12,  # 16-bit maxval unsupported
        b"P6\n4 4\n255\n" + b"\x00" * 10,  # truncated raster
        b"P6\n2",  # truncated header
    ],
)
def test_ppm_rejects_malformed(bad):
    with pytest.raises(ValueError):
        decode_ppm(bad)


def test_resize_nearest_downscale_picks_centers():
    # 4x4 checker downscaled 2x: centers land on (0,0)->(0,0)? with
    # half-pixel mapping, dst (0,0) samples src (1,1) -> even -> white
    arr = _checker(4, 4)
    small = resize_nearest(arr, 2, 2)
    assert small.shape == (2, 2, 3)
    # src indices for dst 0,1 are floor((i+0.5)*2) = 1, 3
    expect = arr[[1, 3]][:, [1, 3]]
    assert np.array_equal(small, expect)


def test_resize_nearest_upscale_replicates():
    arr = _checker(2, 2)
    big = resize_nearest(arr, 4, 4)
    assert big.shape == (4, 4, 3)
    # every src pixel appears exactly 4 times
    assert int((big == 255).all(axis=2).sum()) == 2 * 4  # two white cells x4


def test_channel_stats_bounds():
    stats = channel_stats(_checker(4, 4))
    assert len(stats) == 6
    assert stats[0] == 1.0           # red channel saturated everywhere
    assert 0.4 < stats[1] < 0.6      # green: half the pixels
    assert all(0.0 <= s <= 1.0 for s in stats)


def test_spark_decode_and_resize_ppm(spark):
    """End-to-end through the Arrow-batched mapInPandas path: real decode
    (dims + channel stats), real resize (re-decodable output at the target
    dims), malformed payload -> NULL row, not a task failure."""
    from pyspark.sql import functions as F

    from backend_big_data_spark.multimodal.binary_ops import (
        decode_image_batch,
        resize_image_batch,
        to_media_table,
    )

    imgs = {
        1: _checker(6, 8),
        2: np.full((3, 5, 3), 17, dtype=np.uint8),
    }
    rows = [(k, bytearray(encode_ppm(v))) for k, v in imgs.items()]
    rows.append((3, bytearray(b"not an image")))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = to_media_table(df, "media_id", F.col("payload"), "image")

    dec = {r.media_id: r for r in decode_image_batch(media, codec="ppm").collect()}
    assert (dec[1].width, dec[1].height, dec[1].channels) == (8, 6, 3)
    assert (dec[2].width, dec[2].height) == (5, 3)
    assert dec[2].features[:3] == [17 / 255.0] * 3
    assert dec[2].features[3:] == [0.0, 0.0, 0.0]
    assert dec[3].width is None and dec[3].features is None

    res = {
        r.media_id: r
        for r in resize_image_batch(media, 4, 3, codec="ppm").collect()
    }
    assert (res[1].width, res[1].height) == (4, 3)
    back = decode_ppm(bytes(res[1].payload))
    assert back.shape == (3, 4, 3)
    assert np.array_equal(back, resize_nearest(imgs[1], 4, 3))
    assert res[3].payload is None
