#!/usr/bin/env python
"""Scale-up measurement for the token-set joins (round 8): replicate
the record corpus 1x/4x/16x and measure wall clock in BOTH vocabulary
regimes (the same honesty protocol as scale_linkage.py):

- disjoint-vocab: each replica's tokens carry a replica tag, so the
  vocabulary grows with the corpus (real-world name/address data) —
  candidates stay within-replica and the join should scale ~linearly;
- shared-vocab: replicas reuse the SAME tokens (fixed closed
  vocabulary) — every token's frequency grows with the factor, the
  prefix filter's candidate bound Σ nl·nr grows quadratically, and so
  does the TRUE result (replica-crossing near-dups are real matches).
  Reported honestly as the operator's adversarial regime.

The best-match (top-k) form is measured in the disjoint regime too: its
OUTPUT stays |probe|·k by construction, so its scaling isolates the
candidate+verify cost from result materialization.

Usage: python tools/scale_setsim.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from backend_big_data_spark.operators.setsimjoin import (  # noqa: E402
    token_jaccard_join,
    token_jaccard_topk,
)
from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402

FACTORS = [1, 4, 16]
#: the shared-vocab regime is honestly quadratic in BOTH candidates and
#: true result — 16x would measure minutes of expected blow-up, so the
#: study caps it at 4x and lets the 1x→4x ratio tell the story
SHARED_FACTORS = [1, 4]
RUNS = 2


def timed(fn) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _records(spark, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_partkey").cast("long").alias("id"),
        F.concat_ws(" ", "p_name", "p_brand", "p_type").alias("s"),
    )


def replicate_shared(df: DataFrame, factor: int) -> DataFrame:
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    return df.select("id", "s", reps).select(
        (F.col("id") + F.col("rep") * 10_000_000).alias("id"), "s"
    )


def replicate_disjoint(df: DataFrame, factor: int) -> DataFrame:
    """Tag every TOKEN with the replica id, so replica vocabularies are
    fully disjoint and all matches stay within-replica."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    tagged = F.array_join(
        F.transform(
            F.split("s", r"\s+"),
            lambda t: F.concat(t, F.lit("~"), F.col("rep").cast("string")),
        ),
        " ",
    )
    return df.select("id", "s", reps).select(
        (F.col("id") + F.col("rep") * 10_000_000).alias("id"),
        tagged.alias("s"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="scale_setsim", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = _records(spark, sf_dir)

    print(f"== token-set join scale study ({sf_dir}) ==")
    for label, replicate, factors in (
        ("jaccard[disjoint-vocab]", replicate_disjoint, FACTORS),
        ("jaccard[shared-vocab]  ", replicate_shared, SHARED_FACTORS),
    ):
        for factor in factors:
            df = replicate(base, factor).cache()
            n = df.count()
            out = token_jaccard_join(df, df, 3, 5).where("left_id < right_id")
            pairs = out.count()
            wall = timed(lambda: out.count())
            print(
                f"{label} factor={factor:>2} rows={n:>7} "
                f"pairs={pairs:>9} wall={wall:6.2f}s"
            )
            df.unpersist()

    for factor in FACTORS:
        df = replicate_disjoint(base, factor).cache()
        n = df.count()
        out = token_jaccard_topk(
            df, df, k=1, floor_num=3, floor_den=5, exclude_same_id=True
        )
        winners = out.count()
        wall = timed(lambda: out.count())
        print(
            f"best_match[disjoint]    factor={factor:>2} rows={n:>7} "
            f"winners={winners:>9} wall={wall:6.2f}s"
        )
        df.unpersist()

    # streaming-sink probe regime: a FIXED small arriving batch against
    # a master grown 1x/4x/16x, index + tokfreq at rest in parquet (the
    # setsim_ingest sink's real state) — the per-batch-cost claim: the
    # probe's wall should track the batch, not the master (broadcast
    # prefix, map-side index scan, candidate-bounded verify).
    import shutil
    import tempfile

    from backend_big_data_spark.operators.setsimjoin import (
        token_index,
        token_jaccard_join_indexed,
    )

    work = tempfile.mkdtemp(prefix="scale_setsim_")
    batch = replicate_disjoint(base, 1).limit(500).cache()
    batch.count()
    for factor in FACTORS:
        master = replicate_disjoint(base, factor).cache()
        nm = master.count()
        ip, fp = f"{work}/idx_{factor}", f"{work}/freq_{factor}"
        token_index(master).write.mode("overwrite").parquet(ip)
        spark.read.parquet(ip).groupBy("token").agg(
            F.count(F.lit(1)).alias("cnt")
        ).write.mode("overwrite").parquet(fp)
        out = token_jaccard_join_indexed(
            batch,
            spark.read.parquet(ip),
            master,
            3,
            5,
            index_freq=spark.read.parquet(fp),
        )
        pairs = out.count()
        wall = timed(lambda: out.count())
        print(
            f"setsim_probe[maintained] factor={factor:>2} master={nm:>7} "
            f"pairs={pairs:>7} wall={wall:6.2f}s"
        )
        master.unpersist()
    batch.unpersist()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
