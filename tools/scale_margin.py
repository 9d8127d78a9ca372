#!/usr/bin/env python
"""Scale-up measurement for the margin-mining family (round 9b):
replicate the embedding corpus 1x/4x/16x (each replica deterministically
perturbed so vectors stay distinct and the geometry stays realistic) and
measure wall clock for:

- the EXACT all-pairs mine (1x/4x only — |A|·|B| cosines, the regime the
  armed ``pair_cap`` exists to refuse; the 1x→4x ratio tells the
  quadratic story honestly);
- the LSH-candidate mine (1x/4x/16x) with its candidate-pair count —
  the production path: candidates only meet inside (table, bucket) keys,
  so the pair frame tracks bucket collisions, not |A|·|B|;
- the covariance/PCA training pass (1x/4x/16x) — map-side expansion +
  one O(dim²·partitions) shuffle, expected ~linear in rows with a flat
  shuffle;
- the streaming margin sink's per-batch link wall against 1x/4x/16x
  masters probed by a FIXED 500-record batch (the maintained bucket
  sidecar keeps per-batch cost tracking the batch, not the master).

Usage: python tools/scale_margin.py [sf_dir]
"""

from __future__ import annotations

import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.similarity.mining import (  # noqa: E402
    margin_knn_pairs,
    margin_knn_pairs_lsh,
)
from backend_big_data_spark.similarity.pca import (  # noqa: E402
    embedding_covariance,
)
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402

#: Replicas perturb only one component, so every replica of a base
#: vector shares its neighborhood AND its LSH buckets — candidates (and
#: the true duplicate mass) grow quadratically with the factor, the same
#: honest adversarial regime scale_setsim.py calls shared-vocab. The
#: mine phase therefore caps at 4x and lets the 1x->4x ratios tell the
#: story (measured: exact 16.5->237 s at 16x the pairs; LSH 3.7->16.6 s
#: tracking its 16x candidate growth, 98.6k->1.58M). The STREAM phase
#: probes with a FIXED batch, so it runs the full ladder.
MINE_FACTORS = [1, 4]
STREAM_FACTORS = [1, 4, 16]
EXACT_FACTORS = [1, 4]
RUNS = 2
PHASES = os.environ.get("SCALE_MARGIN_PHASES", "mine,stream").split(",")


def timed(fn) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def replicate(emb: DataFrame, factor: int) -> DataFrame:
    """factor copies with distinct ids and a deterministic per-replica
    perturbation of the first component (keeps vectors distinct without
    changing the corpus' neighborhood structure materially)."""
    reps = emb.sparkSession.range(factor).select(
        F.col("id").cast("int").alias("rep")
    )
    out = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: F.when(
                i == 0, x * (1.0 + F.col("rep") * F.lit(0.001))
            ).otherwise(x),
        ).alias("embedding"),
        "label",
    )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-margin", shuffle_partitions=32)
    base = load_table(spark, sf_dir, "embeddings")
    n_base = base.count()
    print(f"base corpus: {n_base} vectors from {sf_dir}")

    for factor in MINE_FACTORS if "mine" in PHASES else []:
        corpus = replicate(base, factor).persist()
        n = corpus.count()
        a = corpus.filter(F.col("label") < 5)
        b = corpus.filter(F.col("label") >= 5)
        na, nb = a.count(), b.count()

        if factor in EXACT_FACTORS:
            t_exact = timed(
                lambda: margin_knn_pairs(a, b, k=4, threshold=1.0).count()
            )
        else:
            t_exact = float("nan")

        t_lsh = timed(
            lambda: margin_knn_pairs_lsh(
                a, b, k=4, threshold=1.0, num_bits=6, num_tables=6,
                dim=64, plane_source="md5",
            ).count()
        )
        # candidate-pair count of the LSH path (one extra pass, unreported
        # in the wall numbers): the quantity the bucketing bounds
        from backend_big_data_spark.similarity.ann import _md5_planes
        from backend_big_data_spark.similarity.mining import _bucketed

        planes = _md5_planes(64, 6, 6)
        cand = (
            _bucketed(a, "a", planes, "vec_id", "embedding")
            .join(
                _bucketed(b, "b", planes, "vec_id", "embedding").select(
                    "b_id", "bucket"
                ),
                "bucket",
            )
            .dropDuplicates(["a_id", "b_id"])
            .count()
        )

        t_cov = timed(lambda: embedding_covariance(corpus, dim=64).count())

        print(
            f"factor {factor:>2}: n={n:>6} |A|x|B|={na * nb:>12} "
            f"exact={t_exact:6.2f}s lsh={t_lsh:6.2f}s "
            f"lsh_candidates={cand:>9} cov={t_cov:6.2f}s"
        )
        corpus.unpersist()

    # streaming: fixed 500-record batch against growing masters
    from backend_big_data_spark.streaming.margin_ingest import (
        margin_ingest_sink,
        margin_link_batch,
        read_margin_master,
        read_master_buckets,
    )

    probe = base.limit(500).select(
        (F.col("vec_id") + F.lit(90_000_000)).alias("id"), "embedding"
    ).persist()
    probe.count()
    for factor in STREAM_FACTORS if "stream" in PHASES else []:
        master_rows = replicate(base, factor).select(
            F.col("vec_id").alias("id"), "embedding"
        )
        mdir = tempfile.mkdtemp(prefix=f"margin_scale_{factor}_")
        margin_ingest_sink(mdir, dim=64)(master_rows, 0)
        master = read_margin_master(spark, mdir)
        buckets = read_master_buckets(spark, mdir)
        t_link = timed(
            lambda: margin_link_batch(
                probe, master, buckets, dim=64, knn_k=4, threshold=1.0
            ).count()
        )
        print(
            f"stream probe: master x{factor} ({master.count():>6} rows) "
            f"batch=500 link wall {t_link:6.2f}s"
        )


if __name__ == "__main__":
    main()
