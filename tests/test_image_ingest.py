"""Deduplicating image ingest: within-batch + vs-corpus near-dup
removal by perceptual dHash, quarantine of undecodable payloads,
replay idempotency."""

from __future__ import annotations

import numpy as np

from backend_big_data_spark.multimodal.png import encode_png
from backend_big_data_spark.streaming.image_ingest import (
    image_ingest_sink,
    read_image_corpus,
)


def _img(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(24, 32, 3), dtype=np.uint8).astype(np.uint8)


def _tweak(arr: np.ndarray) -> np.ndarray:
    out = arr.copy()
    out[3, 3, 1] = np.uint8((int(out[3, 3, 1]) + 2) % 256)
    return out


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "media_id long, payload binary"
    )


def test_image_ingest_dedup_and_quarantine(spark, tmp_path):
    a, b = _img(1), _img(2)
    cdir = str(tmp_path / "imgs")
    sink = image_ingest_sink(cdir)
    sink(
        _media(
            spark,
            [
                (1, encode_png(a)),
                (2, encode_png(_tweak(a))),  # within-batch near-dup of 1
                (3, encode_png(b)),
                (4, b"garbage bytes"),        # quarantined
            ],
        ),
        0,
    )
    got = sorted(
        r.media_id for r in read_image_corpus(spark, cdir).collect()
    )
    assert got == [1, 3]
    quarantined = sorted(
        r.media_id
        for r in spark.read.parquet(f"{cdir}/quarantine/batch=0").collect()
    )
    assert quarantined == [4]

    # batch 1: near-dup of admitted image 1 → dropped; fresh image kept
    c = _img(3)
    sink(_media(spark, [(5, encode_png(_tweak(a))), (6, encode_png(c))]), 1)
    got = sorted(r.media_id for r in read_image_corpus(spark, cdir).collect())
    assert got == [1, 3, 6]
    # corpus rows carry the maintained hash next to the payload
    row = read_image_corpus(spark, cdir).filter("media_id = 1").collect()[0]
    assert row.dhash is not None and bytes(row.payload) == bytes(encode_png(a))


def test_image_ingest_stream_matches_sequential_batches(spark, tmp_path):
    """The streaming twin (real readStream → foreachBatch, availableNow)
    must admit exactly what sequential sink application admits — the
    stream ≡ batch discipline the text/embedding ingest sinks follow."""
    from backend_big_data_spark.streaming.image_ingest import (
        image_ingest_stream,
    )

    a, b, c = _img(11), _img(12), _img(13)
    rows_b1 = [
        (1, encode_png(a)),
        (2, encode_png(_tweak(a))),  # within-batch near-dup of 1 → dropped
        (3, encode_png(b)),
        (4, b"garbage bytes"),       # quarantined
    ]
    rows_b2 = [
        (5, encode_png(_tweak(a))),  # near-dup of admitted 1 → dropped
        (6, encode_png(c)),          # fresh → kept
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    _media(spark, rows_b1).coalesce(1).write.parquet(str(in_dir / "b1"))
    _media(spark, rows_b2).coalesce(1).write.parquet(str(in_dir / "b2"))

    cdir = str(tmp_path / "stream_corpus")
    stream = (
        spark.readStream.schema("media_id long, payload binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q = image_ingest_stream(stream, cdir, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = sorted(
        (r.media_id, r.dhash) for r in read_image_corpus(spark, cdir).collect()
    )

    # sequential sink application of the same operator (the batch twin)
    tdir = str(tmp_path / "twin_corpus")
    twin = image_ingest_sink(tdir)
    twin(_media(spark, rows_b1), 0)
    twin(_media(spark, rows_b2), 1)
    want = sorted(
        (r.media_id, r.dhash) for r in read_image_corpus(spark, tdir).collect()
    )
    assert got == want
    assert [m for m, _ in got] == [1, 3, 6]
    # the undecodable payload is quarantined by media id in both worlds
    for d in (cdir, tdir):
        assert [
            r.media_id
            for r in spark.read.parquet(f"{d}/quarantine/batch=0").collect()
        ] == [4]


def test_image_ingest_replay_idempotent(spark, tmp_path):
    a = _img(7)
    cdir = str(tmp_path / "imgs")
    sink = image_ingest_sink(cdir)
    sink(_media(spark, [(1, encode_png(a))]), 0)
    sink(_media(spark, [(2, encode_png(_img(8)))]), 1)
    before = sorted(
        (r.media_id, r.dhash)
        for r in read_image_corpus(spark, cdir).collect()
    )
    sink(_media(spark, [(2, encode_png(_img(8)))]), 1)  # retry of batch 1
    after = sorted(
        (r.media_id, r.dhash)
        for r in read_image_corpus(spark, cdir).collect()
    )
    assert before == after and len(after) == 2
