#!/usr/bin/env python
"""Scale study for streaming score-at-arrival
(`streaming/lm_ingest.lm_ingest_sink(score_batches=True)`, round 9).

Per-batch cost decomposes into (a) O(batch) tokenize + count aggregates
and (b) the corpus-so-far KN model rebuild from the maintained count
sidecars — O(bigram TYPES), not O(corpus): types grow sublinearly in
corpus size (Heaps-style), and the continuation counts the KN
interpolation needs (distinct-set statistics) are NOT additive across
batches, so a keyed pass over the count table per batch is the honest
lower bound for exact KN (the count sidecar IS the minimal maintained
state). This experiment fixes the batch and grows the at-rest corpus
with REPLICATED-but-token-disjoint copies of the sf0.01 documents table
(worst case for the types table: every replica adds new types), then
measures the wall of one scored batch.

Run: python tools/scale_lm_score.py [factors...]
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
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402
from backend_big_data_spark.streaming.lm_ingest import (  # noqa: E402
    lm_ingest_sink,
    read_lm_bigram_counts,
)


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="scale_lm_score", shuffle_partitions=32)
    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    batch = docs.limit(200).localCheckpoint(eager=True)
    print("| corpus factor | bigram types | scored-batch wall s |")
    print("|---|---|---|")
    for fx in factors:
        cdir = tempfile.mkdtemp(prefix=f"lm_score_scale_{fx}_")
        sink = lm_ingest_sink(cdir, score_batches=True)
        # disjoint token spaces per replica: every copy adds new types
        base = None
        for r in range(fx):
            rep = docs.select(
                (F.col("doc_id") + F.lit(r * 1_000_000)).alias("doc_id"),
                # letter-only prefix: the LM tokenizer keeps [a-z]{2,}
                # runs, so a digit would split the token and collapse
                # every replica onto the same vocabulary
                F.regexp_replace(
                    F.lower(F.col("text")),
                    "([a-z]+)",
                    chr(97 + r // 26) + chr(97 + r % 26) + "q$1",
                ).alias("text"),
            )
            base = rep if base is None else base.unionByName(rep)
        sink(base, 0)
        n_types = read_lm_bigram_counts(spark, cdir).count()
        t0 = time.time()
        sink(batch, 1)
        wall = time.time() - t0
        print(f"| {fx}x | {n_types:,} | {wall:.2f} |", flush=True)
        shutil.rmtree(cdir, ignore_errors=True)


if __name__ == "__main__":
    main()
