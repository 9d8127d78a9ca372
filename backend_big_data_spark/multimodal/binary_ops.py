"""Multimodal binary-column plumbing (north-star additive scope).

Images/audio/video ride as opaque ``binary`` payload columns with typed
metadata structs. The Spark-side plumbing — schema, Arrow-batched
``mapInPandas`` signatures, partitioning — is real and tested, and each
modality carries fully REAL codecs built on numpy/stdlib only: PPM
(`multimodal/ppm.py`), 8-bit RGB/RGBA PNG (`multimodal/png.py`, stdlib
zlib, all five scanline filters) and baseline-sequential JFIF JPEG
(`multimodal/jpeg.py`, generic DQT/DHT + Huffman + IDCT + YCbCr,
4:4:4/4:2:2/4:2:0, restart markers) for images, WAV/PCM
(`multimodal/wav.py`) for audio, and the PPV1 container for video frame
sampling. Library-only formats (progressive/arithmetic JPEG variants,
MP3, MP4, WebP) need codec libraries absent from this environment and
stay STUBBED behind ``NotImplementedError`` / the clearly-marked
``fake=True`` double — same plumbing, heavier kernel when the library
exists.

Scale notes: binary payloads make rows wide — partition count must track
*bytes* not rows (``spark.sql.files.maxPartitionBytes``), and decode UDFs
should be fed via ``mapInPandas`` so one Python worker amortizes setup per
Arrow batch, never per row.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video | text
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col, kind: str) -> DataFrame:
    """Wrap any binary-ish column into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload_col.cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def fingerprint_binary(media: DataFrame) -> DataFrame:
    """sha256 + byte length per payload via Arrow-batched ``mapInPandas`` —
    the canonical shape of every decode/feature UDF in this module. Pure
    hashlib, so it is exactly reproducible by any SQL engine's sha256."""

    def compute(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload_sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in payloads
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        compute, schema="media_id long, payload_sha256 string, payload_bytes long"
    )


def decode_image_batch(
    media: DataFrame, fake: bool = False, codec: str | None = None
) -> DataFrame:
    """Decode image payloads → (media_id, width, height, channels, features).

    ``codec="ppm"``, ``codec="png"`` and ``codec="jpeg"`` are REAL decode
    paths, no imaging library involved: binary netpbm P6 parsed with
    numpy (`multimodal/ppm.py`), 8-bit RGB/RGBA PNG via stdlib zlib with
    all five scanline filters + CRC validation (`multimodal/png.py`),
    and baseline-sequential JFIF — generic DQT/DHT, Huffman + IDCT +
    YCbCr, 4:4:4/4:2:2/4:2:0, restart markers (`multimodal/jpeg.py`).
    Dimensions come from the header, the raster is decoded, features =
    per-channel mean/std; malformed payloads yield a NULL-width row (the
    quarantine convention; progressive/arithmetic JPEG variants land
    there too). Library-only formats (WebP, HEIC, …) raise
    ``NotImplementedError``; ``fake=True`` runs a clearly-marked
    deterministic stand-in (dimensions & an 8-dim feature vector derived
    from the payload's sha256) so the Spark plumbing — Arrow batch shape,
    schema, partition behavior — is fully exercised either way.
    """
    if codec in ("ppm", "png", "jpeg"):

        def compute_real(batches):
            import pandas as pd

            from backend_big_data_spark.multimodal.jpeg import decode_jpeg
            from backend_big_data_spark.multimodal.ppm import (
                channel_stats,
                decode_ppm,
            )
            from backend_big_data_spark.multimodal.png import decode_png

            decode = {"ppm": decode_ppm, "png": decode_png, "jpeg": decode_jpeg}[codec]
            for pdf in batches:
                rows = {
                    "media_id": [], "width": [], "height": [],
                    "channels": [], "features": [],
                }
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    rows["media_id"].append(mid)
                    try:
                        arr = decode(bytes(payload or b""))
                    except (ValueError, struct.error):
                        rows["width"].append(None)
                        rows["height"].append(None)
                        rows["channels"].append(None)
                        rows["features"].append(None)
                        continue
                    rows["width"].append(arr.shape[1])
                    rows["height"].append(arr.shape[0])
                    rows["channels"].append(arr.shape[2])
                    rows["features"].append(channel_stats(arr))
                yield pd.DataFrame(rows)

        return media.select("media_id", "payload").mapInPandas(
            compute_real,
            schema="media_id long, width int, height int, channels int, "
            "features array<double>",
        )
    if not fake:
        raise NotImplementedError(
            "decoding this format requires an imaging library (e.g. Pillow) "
            "that is not available in this environment; pass codec='ppm', "
            "codec='png' or codec='jpeg' (baseline JFIF) for the real "
            "built-in paths or fake=True for the deterministic test double"
        )

    def compute(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "channels": [], "features": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.sha256(bytes(payload or b"")).digest()
                rows["media_id"].append(mid)
                rows["width"].append(16 + digest[0])
                rows["height"].append(16 + digest[1])
                rows["channels"].append(3)
                rows["features"].append([b / 255.0 for b in digest[:8]])
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        compute,
        schema="media_id long, width int, height int, channels int, features array<double>",
    )


def resize_image_batch(
    media: DataFrame, width: int, height: int, fake: bool = False,
    codec: str | None = None,
) -> DataFrame:
    """Resize image payloads → (media_id, payload, meta) with updated
    dimensions. ``codec="ppm"``, ``codec="png"`` and ``codec="jpeg"``
    are REAL paths: decode → nearest-neighbor resize (numpy index maps)
    → re-encode in the same format (JPEG re-encodes baseline 4:4:4);
    malformed payloads yield a NULL payload row. Library-only formats
    are STUBBED (no imaging library in this container); ``fake=True``
    emits a deterministic payload (sha256 of input ⊕ target dims) with
    the right schema so partitioning/batching is exercised end-to-end.
    """
    if codec in ("ppm", "png", "jpeg"):

        def compute_real(batches):
            import pandas as pd

            from backend_big_data_spark.multimodal.jpeg import (
                decode_jpeg,
                encode_jpeg,
            )
            from backend_big_data_spark.multimodal.png import (
                decode_png,
                encode_png,
            )
            from backend_big_data_spark.multimodal.ppm import (
                decode_ppm,
                encode_ppm,
                resize_nearest,
            )

            decode, encode = {
                "ppm": (decode_ppm, encode_ppm),
                "png": (decode_png, encode_png),
                "jpeg": (decode_jpeg, encode_jpeg),
            }[codec]
            for pdf in batches:
                out = {"media_id": [], "payload": [], "width": [], "height": []}
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    out["media_id"].append(mid)
                    try:
                        arr = decode(bytes(payload or b""))
                    except (ValueError, struct.error):
                        out["payload"].append(None)
                        out["width"].append(None)
                        out["height"].append(None)
                        continue
                    out["payload"].append(
                        encode(resize_nearest(arr, width, height))
                    )
                    out["width"].append(width)
                    out["height"].append(height)
                yield pd.DataFrame(out)

        return media.select("media_id", "payload").mapInPandas(
            compute_real,
            schema="media_id long, payload binary, width int, height int",
        )
    if not fake:
        raise NotImplementedError(
            "resizing this format requires an imaging library (e.g. Pillow); "
            "pass codec='ppm', codec='png' or codec='jpeg' for the real "
            "built-in paths or fake=True for the deterministic test double"
        )

    def compute(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "payload": [], "width": [], "height": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                seed = hashlib.sha256(
                    bytes(payload or b"") + f":{width}x{height}".encode()
                ).digest()
                out["media_id"].append(mid)
                out["payload"].append(seed * 4)  # fixed-size fake raster
                out["width"].append(width)
                out["height"].append(height)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        compute, schema="media_id long, payload binary, width int, height int"
    )


def sample_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
    fake: bool = False,
    codec: str | None = None,
) -> DataFrame:
    """Sample frames from video payloads → one row per sampled frame
    (media_id, frame_idx, ts_ms, frame). A 1→N generator via mapInPandas
    (each input row yields several output rows — the Spark-side shape of
    any demux/decode).

    ``codec='ppmv'`` is a fully REAL path: payloads in the PPV1 container
    (`multimodal/ppm.py::encode_ppmv` — fps header + length-prefixed PPM
    frames) are demuxed, and frames nearest each ``every_ms`` grid point
    are emitted with exact integer timestamps (``frame_idx·1000//fps``).
    Library-backed containers (MP4 etc.) stay stubbed — the sandbox has
    no codec libs — and the fake remains the hash-derived test double.
    """
    if codec == "ppmv":
        def compute_ppmv(batches):
            import pandas as pd

            from backend_big_data_spark.multimodal.ppm import decode_ppmv

            for pdf in batches:
                out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    fps, frames = decode_ppmv(bytes(payload or b""))
                    step = max(1, round(fps * every_ms / 1000)) if fps else 1
                    for i in range(0, len(frames), step):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(i)
                        out["ts_ms"].append(i * 1000 // fps if fps else 0)
                        out["frame"].append(frames[i])
                yield pd.DataFrame(out)

        return media.select("media_id", "payload").mapInPandas(
            compute_ppmv,
            schema="media_id long, frame_idx int, ts_ms long, frame binary",
        )
    if not fake:
        raise NotImplementedError(
            "video demux requires a codec library (e.g. PyAV) for "
            "library-backed containers; use codec='ppmv' for the built-in "
            "REAL container, or fake=True for the deterministic test double"
        )

    def compute(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                digest = hashlib.sha256(bytes(payload or b"")).digest()
                n_frames = 1 + digest[0] % 4
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame"].append(
                        hashlib.sha256(digest + bytes([i])).digest()
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        compute,
        schema="media_id long, frame_idx int, ts_ms long, frame binary",
    )
