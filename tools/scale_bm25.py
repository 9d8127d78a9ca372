#!/usr/bin/env python
"""Scale-up measurement for the maintained BM25 index (round 10):
replicate the documents corpus 1x/4x/16x (fresh doc_ids per replica;
text unchanged — df and N scale linearly, the realistic regime for a
growing corpus) and measure wall clock for:

- QUERY-FROM-INDEX: top-20 for a fixed 3-term query served from the
  maintained postings/stats sidecars — the at-rest scan is term-pruned
  (postings written term-sorted, row-group stats prune), so wall should
  track the MATCHING postings (~linear in corpus for corpus-wide terms)
  with a far smaller constant than re-tokenizing;
- QUERY-FULL-SCAN: the one-shot `bm25_topk` over the same corpus — the
  contrast: tokenizes every document per query;
- INGEST: a FIXED 500-doc batch appended to the 1x/4x/16x index — the
  flat-probe contract: per-batch cost is the batch's tokenize + writes,
  independent of how big the master already is (no probe phase at all;
  BM25 admission is unconditional).

Usage: python tools/scale_bm25.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402
from backend_big_data_spark.streaming.bm25_ingest import (  # noqa: E402
    bm25_ingest_sink,
    bm25_topk_from_index,
    compact_bm25_index,
    read_bm25_stats,
)
from backend_big_data_spark.text.bm25 import bm25_topk  # noqa: E402

FACTORS = [1, 4, 16]
RUNS = 2
QUERY = ["join", "hash", "customer"]


def timed(fn) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale_bm25", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n0 = docs.count()
    probe_batch = docs.limit(500).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )

    for k in FACTORS:
        rep = docs
        for i in range(1, k):
            rep = rep.unionByName(
                docs.select(
                    (F.col("doc_id") + i * 1_000_000).alias("doc_id"), "text"
                )
            )
        idir = tempfile.mkdtemp(prefix=f"bm25_scale_{k}x_")
        sink = bm25_ingest_sink(idir)
        t0 = time.perf_counter()
        sink(rep, 0)
        build = time.perf_counter() - t0
        n = read_bm25_stats(spark, idir).collect()[0]["__n"]
        assert n == n0 * k, (n, n0, k)
        q_index = timed(
            lambda: bm25_topk_from_index(spark, idir, QUERY, k=20).collect()
        )
        q_scan = timed(lambda: bm25_topk(rep, QUERY, k=20).collect())
        ingest = timed(lambda: sink(probe_batch, 1))
        # round-11: term-bucketed fold — the same query served through the
        # directory-level bucket prune (64 buckets; the 3-term query opens
        # <= 3 of them, so wall should track the query's own buckets'
        # postings, not the index)
        compact_bm25_index(spark, idir, keep_latest=0, term_buckets=64)
        q_bucketed = timed(
            lambda: bm25_topk_from_index(spark, idir, QUERY, k=20).collect()
        )
        print(
            f"{k}x ({n} docs): build {build:.2f} s | query-from-index "
            f"{q_index:.2f} s | query-from-bucketed-index {q_bucketed:.2f} s"
            f" | query-full-scan {q_scan:.2f} s | "
            f"fixed-batch ingest {ingest:.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
