#!/usr/bin/env python
"""Scale-up measurement for GROUP-WISE distributed ranking (round 11):
the hot-group regime — one group holds ~95% of the rows (the shape of
any real categorical: one dominant source/language/flag), so a keyed
ntile window funnels that group through ONE task however many groups
exist. Replicate lineitem 1x/4x/16x (fresh keys per replica, group =
'hot' for l_orderkey % 20 != 0 else a spread of 19 small groups) and
measure the SAME per-group decile aggregation two ways:

- GROUPED DISTRIBUTED: `operators/windows.grouped_distributed_ntile` —
  range partition on (group, order), per-(partition, group) counts,
  group-keyed prefix over ≤ numShufflePartitions rows, closed-form tile;
- KEYED WINDOW: ``ntile(10).over(Window.partitionBy(grp).orderBy(...))``
  — correct, but the hot group's rows all sort in one task.

Identical per-(group, decile) aggregates asserted; the wall divergence
with scale on the hot group is the point.

Usage: python tools/scale_grouped_rank.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import Window, functions as F  # noqa: E402

from backend_big_data_spark.operators.windows import (  # noqa: E402
    grouped_distributed_ntile,
)
from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402

FACTORS = [1, 4, 16]
RUNS = 2


def agg(tiled):
    return (
        tiled.groupBy("grp", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("price").alias("lo"),
            F.max("price").alias("hi"),
        )
        .orderBy("grp", "decile")
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
    spark = get_spark(app_name="scale_grouped_rank", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("price"),
    )
    n0 = base.count()

    for k in FACTORS:
        rep = base
        for i in range(1, k):
            rep = rep.unionByName(
                base.select(
                    (F.col("l_orderkey") + i * 100_000_000).alias(
                        "l_orderkey"
                    ),
                    "l_linenumber",
                    "price",
                )
            )
        # hot-group shape: ~95% of rows in 'hot', the rest across g1..g19
        df = rep.withColumn(
            "grp",
            F.when(F.col("l_orderkey") % 20 != 0, F.lit("hot")).otherwise(
                F.concat(F.lit("g"), (F.col("l_orderkey") % 19).cast("string"))
            ),
        ).persist()
        n = df.count()
        assert n == n0 * k

        order = [F.col("price"), "l_orderkey", "l_linenumber"]
        dist = timed(
            lambda: agg(
                grouped_distributed_ntile(df, 10, ["grp"], order, "decile")
            ).collect()
        )
        w = Window.partitionBy("grp").orderBy(*order)
        keyed = timed(
            lambda: agg(
                df.withColumn("decile", F.ntile(10).over(w))
            ).collect()
        )
        a = agg(
            grouped_distributed_ntile(df, 10, ["grp"], order, "decile")
        ).collect()
        b = agg(df.withColumn("decile", F.ntile(10).over(w))).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b], "mismatch"
        df.unpersist()
        print(
            f"{k}x ({n} rows, hot group ~{19 * n // 20}): "
            f"grouped_distributed {dist:.2f} s | keyed window {keyed:.2f} s",
            flush=True,
        )


if __name__ == "__main__":
    main()
