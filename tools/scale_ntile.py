#!/usr/bin/env python
"""Scale-up measurement for the distributed exact-ranking family
(round 10): replicate the lineitem fact table 1x/4x/16x (fresh keys per
replica so the total order stays unique) and measure wall clock for the
SAME exact decile aggregation computed two ways:

- DISTRIBUTED: `operators/windows.distributed_ntile` — range partition
  + bounded counts-prefix + broadcast offsets + closed-form tile; the
  per-task frame is rows/numPartitions whatever the total;
- GLOBAL WINDOW: the textbook ``ntile(10).over(Window.orderBy(...))`` —
  the r09-flagged shape that funnels EVERY row through one task.

Both produce identical per-decile aggregates (asserted); the wall-clock
divergence with scale is the point.

Usage: python tools/scale_ntile.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F  # noqa: E402

from backend_big_data_spark.operators.windows import (  # noqa: E402
    distributed_ntile,
)
from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402

FACTORS = [1, 4, 16]
RUNS = 2


def agg(tiled):
    # comparison columns are all EXACT (count + order statistics): a
    # per-decile SUM would compare two different FP addition orders and
    # can flip a fixed-point floor at the grid boundary — that would
    # test summation association, not the ranking
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("price").alias("lo"),
            F.max("price").alias("hi"),
        )
        .orderBy("decile")
    )


def timed(fn):
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale_ntile", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("price"),
    )
    n0 = li.count()
    order = [F.col("price"), F.col("l_orderkey"), F.col("l_linenumber")]

    for k in FACTORS:
        rep = li
        for i in range(1, k):
            rep = rep.unionByName(
                li.select(
                    (F.col("l_orderkey") + i * 100_000_000).alias(
                        "l_orderkey"
                    ),
                    "l_linenumber",
                    "price",
                )
            )
        rep = rep.localCheckpoint(eager=True)  # time the operator, not the union
        dist = timed(
            lambda: agg(distributed_ntile(rep, 10, order, "decile")).collect()
        )
        w = Window.orderBy(*order)
        naive = timed(
            lambda: agg(
                rep.withColumn("decile", F.ntile(10).over(w))
            ).collect()
        )
        same = agg(distributed_ntile(rep, 10, order, "decile")).collect() == agg(
            rep.withColumn("decile", F.ntile(10).over(w))
        ).collect()
        print(
            f"{k}x ({n0 * k} rows): distributed {dist:.2f} s | "
            f"global-window {naive:.2f} s | identical={same}",
            flush=True,
        )
        rep.unpersist()


if __name__ == "__main__":
    main()
