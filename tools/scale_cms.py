#!/usr/bin/env python
"""Scale study: CMS sidecar vs exact token-count log — maintained-state
size and readout cost as the batch count grows.

The claim under test (operators/cms.py docstring): the drift monitor's
exact count log maintains O(vocabulary) rows PER BATCH and every
corpus-so-far readout is a keyed sum over all of it, while the CMS
sidecar appends ≤ depth·width cells (+ top-k candidates) per batch —
so the refresh cost of a "heavy hitters after every batch" monitoring
loop diverges as batches accumulate, and only the CMS curve is
vocabulary-independent. Both readouts produce a top-20; the overlap
column keeps the approximation honest.

Run on an idle box (this is a timing study):

    python tools/scale_cms.py [sf_dir]

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

from backend_big_data_spark.operators.cms import cms_estimate  # noqa: E402
from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402
from backend_big_data_spark.streaming.cms_ingest import (  # noqa: E402
    cms_candidate_keys,
    cms_ingest_sink,
    read_cms_cells,
)
from backend_big_data_spark.streaming.drift_monitor import (  # noqa: E402
    read_corpus_counts,
    token_counts,
)

TOP = 20
CAND_K = 32


def _at_rest_rows(spark, base, prefixes=("delta=*",)) -> int:
    """Rows the log stores on disk — what every readout's keyed sum
    consumes."""
    n = 0
    for p in prefixes:
        n += (
            spark.read.option("basePath", base)
            .parquet(os.path.join(base, p))
            .count()
        )
    return n


def _exact_readout(spark, cdir):
    t0 = time.perf_counter()
    counts = read_corpus_counts(spark, cdir)
    top = [
        r["tok"]
        for r in counts.orderBy(F.desc("n"), "tok").limit(TOP).collect()
    ]
    return time.perf_counter() - t0, top


def _cms_readout(spark, sdir):
    t0 = time.perf_counter()
    cells = read_cms_cells(spark, sdir)
    cands = cms_candidate_keys(spark, sdir).select(
        F.col("key").alias("tok")
    )
    est = cms_estimate(cells, cands, "tok")
    top = [
        r["tok"]
        for r in est.orderBy(F.desc("cms_est"), "tok").limit(TOP).collect()
    ]
    return time.perf_counter() - t0, top


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale_cms")
    spark.sparkContext.setLogLevel("ERROR")
    # The generator's documents carry a ~31-token vocabulary — three
    # orders of magnitude below any real corpus, so an exact count log
    # is trivially small on it. To study the claimed axis (state size
    # vs VOCABULARY) at a realistic shape, stretch the key space
    # deterministically: 90 % of token mass gets a doc-unique suffix
    # (the long tail), 10 % stays unsuffixed (the heavy hitters both
    # readouts must surface). Heavy-hitter identity is untouched.
    raw = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    tokrows = raw.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.col("tok"))
        .otherwise(F.concat_ws("_", "tok", "doc_id"))
        .alias("tok"),
    ).persist()
    n_mass = tokrows.count()
    n_vocab = tokrows.select("tok").distinct().count()
    print(f"token mass {n_mass}, stretched vocabulary {n_vocab}")

    print(
        f"{'batches':>7} {'log':>6} {'state_rows':>10} {'ingest_s':>8} "
        f"{'readout_s':>9} {'top20_overlap':>13}"
    )
    for n_batches in (2, 8, 32, 64):
        cdir = tempfile.mkdtemp(prefix=f"exact_{n_batches}_")
        sdir = tempfile.mkdtemp(prefix=f"cms_{n_batches}_")
        sink = cms_ingest_sink(sdir, "tok", candidates_k=CAND_K)

        t0 = time.perf_counter()
        for b in range(n_batches):
            (
                tokrows.where(F.col("doc_id") % n_batches == b)
                .groupBy("tok")
                .agg(F.count("*").alias("n"))
                .write.mode("overwrite")
                .parquet(f"{cdir}/delta={b}")
            )
        exact_ingest = time.perf_counter() - t0

        t0 = time.perf_counter()
        for b in range(n_batches):
            sink(
                tokrows.where(F.col("doc_id") % n_batches == b).select("tok"),
                b,
            )
        cms_ingest = time.perf_counter() - t0

        e_rows = _at_rest_rows(spark, cdir)
        c_rows = _at_rest_rows(spark, sdir, ("delta=*", "cand=*"))
        e_s, e_top = _exact_readout(spark, cdir)
        c_s, c_top = _cms_readout(spark, sdir)
        overlap = len(set(e_top) & set(c_top))
        print(
            f"{n_batches:>7} {'exact':>6} {e_rows:>10} "
            f"{round(exact_ingest, 2):>8} {round(e_s, 2):>9} {'—':>13}"
        )
        print(
            f"{n_batches:>7} {'cms':>6} {c_rows:>10} "
            f"{round(cms_ingest, 2):>8} {round(c_s, 2):>9} "
            f"{overlap:>10}/{TOP}"
        )


if __name__ == "__main__":
    main()
