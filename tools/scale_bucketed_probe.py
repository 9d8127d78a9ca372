#!/usr/bin/env python
"""Scale study: bucketed vs flat at-rest index serving reads.

Question: does the bucket fold actually make a probe's at-rest index
read track the PROBE (its vocabulary's buckets) instead of the INDEX
(every file of every batch)? Measures, for the linkage gram index built
from the sf dir's part table:

- files touched and wall time of the probe-pruned read
  (`probe_master_grams` — bucketed layout, directory-level prune)
  vs the full flat read (`read_master_grams`, never folded);
- the same end-to-end through the fuzzy probe result (count of links),
  so pruning is measured inside a real query, not just a scan;
- at growing index multiples (the master seeded 1×, 2×, 4× with
  id-shifted copies) — the flat read cost grows with the index, the
  pruned read cost should track the probe's bucket subset.

Run on an idle box (this is a timing study):

    python tools/scale_bucketed_probe.py [sf_dir]

Prints one human table; paste the summary into PERF.md.
"""

from __future__ import annotations

import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os  # noqa: E402

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from backend_big_data_spark.operators.fuzzyjoin import (  # noqa: E402
    edit_distance_join_indexed,
)
from backend_big_data_spark.plans.round7c import (  # noqa: E402
    _corrupt,
    _entities,
)
from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.streaming.linkage_ingest import (  # noqa: E402
    compact_linkage_master,
    probe_master_grams,
    read_master,
    read_master_gram_freq,
    read_master_grams,
    seed_master_batch,
)

BUCKETS = 32


def _build(spark, clean, mult: int, bucketed: bool) -> str:
    """Master dir holding ``mult`` id-shifted copies of ``clean``; one
    seed batch per copy; bucket-folded when asked."""
    mdir = tempfile.mkdtemp(prefix=f"scale_gram_{mult}x_")
    shift = 10_000_000
    for m in range(mult):
        seed_master_batch(
            spark,
            mdir,
            clean.select(
                (F.col("id") + m * shift).alias("id"),
                # perturb copies so they are distinct entities, not dups
                F.concat_ws("#", "s", F.lit(str(m))).alias("s"),
            ),
            m,
        )
    if bucketed:
        compact_linkage_master(spark, mdir, keep_latest=0, gram_buckets=BUCKETS)
    return mdir


def _probe_stats(spark, mdir, probe, pruned: bool):
    t0 = time.perf_counter()
    if pruned:
        idx = probe_master_grams(spark, mdir, probe, q=3)
    else:
        idx = read_master_grams(spark, mdir)
    n_files = len(idx.inputFiles())
    rows = idx.count()
    scan_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    links = edit_distance_join_indexed(
        probe,
        idx,
        F.broadcast(read_master(spark, mdir)),
        max_dist=2,
        q=3,
        index_freq=read_master_gram_freq(spark, mdir),
    ).count()
    e2e_s = time.perf_counter() - t0
    return n_files, rows, round(scan_s, 3), links, round(e2e_s, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale_bucketed_probe")
    spark.sparkContext.setLogLevel("ERROR")
    clean = _entities(spark, sf_dir)
    # batch-sized probe: ~1/37 of the 1x master — the sink regime
    probe = _corrupt(clean).where(F.col("id") % 37 == 0).persist()
    probe.count()

    print(f"{'mult':>4} {'layout':>8} {'files':>6} {'idx_rows':>9} "
          f"{'scan_s':>7} {'links':>6} {'probe_s':>8}")
    for mult in (1, 2, 4):
        for bucketed in (False, True):
            mdir = _build(spark, clean, mult, bucketed)
            nf, rows, scan_s, links, e2e_s = _probe_stats(
                spark, mdir, probe, pruned=bucketed
            )
            print(f"{mult:>4} {'bucketed' if bucketed else 'flat':>8} "
                  f"{nf:>6} {rows:>9} {scan_s:>7} {links:>6} {e2e_s:>8}")


if __name__ == "__main__":
    main()
