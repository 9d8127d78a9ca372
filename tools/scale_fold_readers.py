"""Reader-side fold isolation for the two ingest probe paths VERDICT r06
item 5 called out: the LSH band index (``bands/batch=N``) and the image
corpus' maintained dhash column (``batch=N``).

Same protocol as the drift-counts isolation in PERF.md: build N
log-structured directories with constant total DATA, time the merged
read (min-of-3), fold with the maintenance compactor, time again. The
delta is pure directory-count tax — the term that grows with batch count
forever if the log is never folded, measured here on the paths every
per-batch ingest probe actually touches (the band index is probed by
EVERY text batch's broadcast semi-join; the dhash column by every image
batch).

Run from the repo root:

    PYTHONPATH=. python tools/scale_fold_readers.py [n_dirs]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from backend_big_data_spark.session import get_spark
from backend_big_data_spark.streaming.image_ingest import read_image_corpus
from backend_big_data_spark.streaming.ingest_dedup import read_corpus_bands
from backend_big_data_spark.streaming.maintenance import _fold


def _time3(fn) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_spark(app_name="scale_fold_readers", shuffle_partitions=8)

    # -- band index: n dirs x 50 (doc_id, band, band_key) rows --------------
    # one partitionBy job materializes all batch=N dirs (the sink writes
    # them one micro-batch at a time; for the READER measurement only the
    # resulting directory layout matters)
    base = tempfile.mkdtemp(prefix="fold_bands_")
    bands_dir = f"{base}/bands"
    rows = [
        (b, b * 1000 + i, i % 4, f"k{b}_{i}")
        for b in range(n)
        for i in range(50)
    ]
    spark.createDataFrame(
        rows, "batch int, doc_id long, band int, band_key string"
    ).repartition("batch").write.partitionBy("batch").parquet(bands_dir)

    def read_bands():
        read_corpus_bands(spark, base).agg(F.count("band_key")).collect()

    before = _time3(read_bands)
    folded = _fold(spark, bands_dir, "batch", keep_latest=1)
    after = _time3(read_bands)
    print(
        f"band index   : {n} dirs {before:5.2f}s -> folded "
        f"({len(folded)} -> 1, +1 kept) {after:5.2f}s  "
        f"({before / after:.1f}x)"
    )
    shutil.rmtree(base, ignore_errors=True)

    # -- image corpus dhash column: n dirs x 20 (media_id, payload, dhash) --
    tmp = tempfile.mkdtemp(prefix="fold_imgs_")
    base = f"{tmp}/corpus"  # partitionBy refuses a pre-existing path
    rows = [
        (b, b * 1000 + i, bytearray(b"P6 fake payload " * 8), b * 7 + i)
        for b in range(n)
        for i in range(20)
    ]
    spark.createDataFrame(
        rows, "batch int, media_id long, payload binary, dhash long"
    ).repartition("batch").write.partitionBy("batch").parquet(base)

    def read_dhash():
        read_image_corpus(spark, base).agg(F.count("dhash")).collect()

    before = _time3(read_dhash)
    folded = _fold(spark, base, "batch", keep_latest=1)
    after = _time3(read_dhash)
    print(
        f"image corpus : {n} dirs {before:5.2f}s -> folded "
        f"({len(folded)} -> 1, +1 kept) {after:5.2f}s  "
        f"({before / after:.1f}x)"
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
