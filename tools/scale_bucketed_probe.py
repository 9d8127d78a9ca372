#!/usr/bin/env python
"""Scale study: bucketed vs flat at-rest index serving reads.

Question: does the bucket fold actually make a probe's at-rest index
read track the PROBE (its vocabulary's buckets) instead of the INDEX
(every file of every batch)? Measured on the linkage gram index built
from the sf dir's part table, at growing index multiples (1×/2×/4×,
id-shifted copies) and point-lookup probe sizes (1 and 8 records — the
serving regime the fold exists for; a corpus-sized probe's gram
vocabulary covers every bucket, so directory pruning can't help there
by construction).

Bucket-width note: q-gram vocabularies are DENSE — one record yields
~60 distinct grams, so with B buckets a single-record probe touches
about B·(1 − (1−1/B)^60) of them. B=256 here: 1 record ≈ 54 buckets
(~21 % of the index dirs), 8 records ≈ 200 (~78 %). The fold pays in
the point-lookup regime and fades as probes widen — that boundary is
what this study records.

Columns: files/rows actually read by the pruned read vs the flat read,
plus the end-to-end indexed fuzzy join (count of links) so pruning is
measured inside a real query.

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

BUCKETS = 256


def _build(spark, clean, mult: int, bucketed: bool) -> str:
    """Master dir holding ``mult`` id-shifted copies of ``clean``; two
    seed batches per copy so the fold always has a commit-stable prefix
    to bucket; bucket-folded when asked."""
    mdir = tempfile.mkdtemp(prefix=f"scale_gram_{mult}x_")
    shift = 10_000_000
    for m in range(mult):
        copy = clean.select(
            (F.col("id") + m * shift).alias("id"),
            # perturb copies so they are distinct entities, not dups
            F.concat_ws("#", "s", F.lit(str(m))).alias("s"),
        )
        seed_master_batch(spark, mdir, copy.where(F.col("id") % 2 == 0), 2 * m)
        seed_master_batch(
            spark, mdir, copy.where(F.col("id") % 2 == 1), 2 * m + 1
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
    # probes corrupt MASTER content (the m=0 copy carries a '#0' suffix),
    # so every probe record sits at edit distance ≤ 2 from its entity
    master0 = clean.select(
        "id", F.concat_ws("#", "s", F.lit("0")).alias("s")
    )

    print(
        f"{'mult':>4} {'nprobe':>6} {'layout':>8} {'files':>6} "
        f"{'idx_rows':>9} {'scan_s':>7} {'links':>6} {'probe_s':>8}"
    )
    for mult in (1, 2, 4):
        for nprobe, modulus in ((1, 20_011), (8, 2_503)):
            probe = (
                _corrupt(master0)
                .where(F.col("id") % modulus == 7)
                .limit(nprobe)
                .persist()
            )
            got = probe.count()
            for bucketed in (False, True):
                mdir = _build(spark, clean, mult, bucketed)
                nf, rows, scan_s, links, e2e_s = _probe_stats(
                    spark, mdir, probe, pruned=bucketed
                )
                print(
                    f"{mult:>4} {got:>6} "
                    f"{'bucketed' if bucketed else 'flat':>8} "
                    f"{nf:>6} {rows:>9} {scan_s:>7} {links:>6} {e2e_s:>8}"
                )
            probe.unpersist()


if __name__ == "__main__":
    main()
