"""Measure what sidecar compaction buys: per-batch sink cost as the
number of log-structured directories grows, with and without
``auto_compact_every``.

Protocol: feed B identical-size micro-batches (disjoint content, so
admission work is constant) through (a) the drift monitor and (b) the
ingest dedup sink, twice each — plain vs auto-compacting — and record
per-batch wall time in quartile buckets. Without compaction the
reader-side merge unions O(batch_id) directories, so late batches pay a
growing listing/footer/merge tax; with compaction the directory count is
bounded by the policy and late batches should cost the same as early
ones. Run from the repo root:

    PYTHONPATH=. python tools/scale_compaction.py [n_batches]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from backend_big_data_spark.session import get_spark
from backend_big_data_spark.streaming.drift_monitor import drift_monitor_sink
from backend_big_data_spark.streaming.ingest_dedup import ingest_dedup_sink
from backend_big_data_spark.text.dedup import release_dedup_caches


def _docs(spark, batch_id: int, n_docs: int = 40):
    rows = [
        (
            batch_id * 100000 + i,
            " ".join(f"w{batch_id}_{i}_{j}" for j in range(30)),
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, make_sink, n_batches: int, label: str, with_dedup_release):
    base = tempfile.mkdtemp(prefix="scale_compaction_")
    sink = make_sink(base)
    per_batch = []
    for b in range(n_batches):
        batch = _docs(spark, b)
        t0 = time.perf_counter()
        sink(batch, b)
        per_batch.append(time.perf_counter() - t0)
        if with_dedup_release:
            release_dedup_caches()
    shutil.rmtree(base, ignore_errors=True)
    q = max(1, n_batches // 4)
    buckets = [per_batch[i : i + q] for i in range(0, n_batches, q)][:4]
    means = [sum(xs) / len(xs) for xs in buckets]
    print(
        f"{label:44s} "
        + " ".join(f"{m:6.2f}s" for m in means)
        + f"   late/early: {means[-1] / means[0]:.2f}x"
    )
    return means


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark(app_name="scale_compaction", shuffle_partitions=8)
    print(f"{n} batches x 40 docs; per-batch wall time, quartile means")

    def drift_plain(base):
        return drift_monitor_sink(f"{base}/c", f"{base}/m")

    def drift_auto(base):
        return drift_monitor_sink(f"{base}/c", f"{base}/m", auto_compact_every=8)

    def ingest_plain(base):
        return ingest_dedup_sink(f"{base}/c", threshold=0.5)

    def ingest_auto(base):
        return ingest_dedup_sink(
            f"{base}/c", threshold=0.5, auto_compact_every=8
        )

    _run(spark, drift_plain, n, "drift monitor, no compaction", False)
    _run(spark, drift_auto, n, "drift monitor, auto_compact_every=8", False)
    _run(spark, ingest_plain, n, "ingest dedup, no compaction", True)
    _run(spark, ingest_auto, n, "ingest dedup, auto_compact_every=8", True)
    spark.stop()


if __name__ == "__main__":
    main()
