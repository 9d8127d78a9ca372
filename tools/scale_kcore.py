#!/usr/bin/env python
"""Scale-up measurement for the k-core batch peel (round 9b): grow the
repeat-purchase graph by replicating it with disjoint node namespaces
(1x/4x/16x — peel work should scale ~linearly in edges: every round is
one keyed degree aggregate plus two semi-joins, and the round COUNT is a
property of the graph's cascade structure, unchanged by disjoint
replication) and, separately, by UNIONING the replicas through shared
supplier nodes (the cascade-coupling regime: removals in one replica can
propagate into another, so the round count may grow — reported
honestly).

Usage: python tools/scale_kcore.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from backend_big_data_spark.operators.graph import k_core  # noqa: E402
from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402

FACTORS = [1, 4, 16]
K = 3
RUNS = 2


def timed(fn):
    best = float("inf")
    out = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def purchase_edges(spark, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )


def replicate(edges: DataFrame, factor: int, shared_dst: bool) -> DataFrame:
    reps = edges.sparkSession.range(factor).select(
        F.col("id").cast("int").alias("rep")
    )
    out = edges.crossJoin(reps)
    src = F.concat(F.col("rep").cast("string"), F.lit("_"), F.col("src"))
    dst = (
        F.col("dst")  # shared suppliers couple the replicas' cascades
        if shared_dst
        else F.concat(F.col("rep").cast("string"), F.lit("_"), F.col("dst"))
    )
    return out.select(src.alias("src"), dst.alias("dst"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-kcore", shuffle_partitions=32)
    base = purchase_edges(spark, sf_dir).persist()
    print(f"base purchase graph: {base.count()} edges from {sf_dir}")

    for shared in (False, True):
        regime = "coupled (shared suppliers)" if shared else "disjoint replicas"
        for factor in FACTORS:
            edges = replicate(base, factor, shared).persist()
            n_edges = edges.count()
            wall, core = timed(
                lambda: k_core(edges, k=K, max_iter=64).count()
            )
            print(
                f"{regime}: x{factor} edges={n_edges:>7} "
                f"core_nodes={core:>6} wall={wall:6.2f}s"
            )
            edges.unpersist()


if __name__ == "__main__":
    main()
