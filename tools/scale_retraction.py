#!/usr/bin/env python
"""Scale measurement for corpus retraction (streaming/retraction.py):
per-request cost must track the AFFECTED directories, not the corpus.

Build a batch-directory log of D directories (fixed rows each), then
retract a request-sized id set that lives entirely in ONE directory.
The probe is a single partition-discovered, column-pruned scan (footer
stats skip clean files) and the rewrite touches one directory — wall
should stay near-flat as D grows. A second series retracts ids spread
across EVERY directory (the worst case): wall should grow with the
affected-directory count, because each affected dir is one journaled
rewrite.

Usage: python tools/scale_retraction.py [workdir]
"""

from __future__ import annotations

import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.streaming.retraction import retract_ids  # noqa: E402

DIR_COUNTS = [4, 16, 64]
ROWS_PER_DIR = 5_000
REQUEST = 5  # ids per retraction request


def build(spark, base: str, n_dirs: int) -> None:
    for d in range(n_dirs):
        spark.range(d * ROWS_PER_DIR, (d + 1) * ROWS_PER_DIR).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text body "), F.col("id").cast("string")).alias(
                "text"
            ),
        ).coalesce(1).write.mode("overwrite").parquet(f"{base}/batch={d}")


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="retr_")
    spark = get_spark(app_name="scale_retraction", shuffle_partitions=8)
    print(f"== retraction scale study ({work}) ==")
    for n_dirs in DIR_COUNTS:
        base = f"{work}/c{n_dirs}"
        build(spark, base, n_dirs)

        one_dir = [3, 4, 5, 6, 7]  # all inside batch=0
        t0 = time.perf_counter()
        out = retract_ids(spark, base, one_dir, id_col="doc_id")
        w1 = time.perf_counter() - t0
        assert out["rows_removed"] == REQUEST
        assert len(out["dirs_rewritten"]) == 1

        spread = [d * ROWS_PER_DIR + 9 for d in range(n_dirs)]
        t0 = time.perf_counter()
        out = retract_ids(spark, base, spread, id_col="doc_id")
        w2 = time.perf_counter() - t0
        assert len(out["dirs_rewritten"]) == n_dirs
        print(
            f"dirs {n_dirs:3d}: 1-dir request {w1:6.2f}s, "
            f"all-dir request ({n_dirs} rewrites) {w2:6.2f}s"
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
