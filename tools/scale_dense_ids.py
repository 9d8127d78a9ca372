#!/usr/bin/env python
"""Scale study for the distributed token-id assignment
(`operators/setsimjoin._dense_ids` — round 9, verdict item 1).

The round-8 implementation ranked the vocabulary with a partition-less
``row_number`` window: the ENTIRE distinct vocabulary moved through one
task — invisible on part names, a hard ceiling at web-corpus vocabularies
(10⁸–10⁹ tokens). This experiment measures both implementations on
synthetic vocabularies of growing size (Zipf-ish count skew: ~55% hapax,
duplicated counts everywhere — the shape that makes per-``cnt`` bucket
partitioning useless and range partitioning necessary) and prints wall
seconds plus the max rows any single task sorted.

Run: python tools/scale_dense_ids.py [sizes...]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from backend_big_data_spark.operators.setsimjoin import _dense_ids  # noqa: E402
from backend_big_data_spark.session import get_spark  # noqa: E402


def synth_vocab(spark, n: int):
    """n distinct tokens with Zipf-ish duplicated counts (cnt = 1 for
    ~55%, then 2,3,5,9,17,... by a hash bucket) — deterministic."""
    return spark.range(n).select(
        F.format_string("tok%012d", F.col("id")).alias("token"),
        F.expr(
            "cast(case when pmod(hash(id), 16) < 9 then 1 "
            "else shiftleft(1L, cast(pmod(hash(id), 16) - 8 as int)) "
            "end as long)"
        ).alias("cnt"),
    )


def global_window_ids(freq):
    """The round-8 implementation (kept here for the comparison row)."""
    return freq.select(
        "token",
        F.row_number()
        .over(Window.orderBy("cnt", "token"))
        .cast("long")
        .alias("tid"),
    )


def max_task_rows(df) -> int:
    return (
        df.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [1_000_000, 4_000_000, 16_000_000]
    spark = get_spark(app_name="scale_dense_ids", shuffle_partitions=32)
    print("| vocab | impl | wall s | max rows in one sort task |")
    print("|---|---|---|---|")
    for n in sizes:
        freq = synth_vocab(spark, n).localCheckpoint(eager=True)
        for name, fn in (("distributed", _dense_ids), ("global-window", global_window_ids)):
            t0 = time.time()
            out = fn(freq)
            # aggregate OVER tid so Catalyst cannot prune the ranking
            # away (a bare count() elides the window/id entirely); the
            # sort-task width is the scale story (the global window
            # always funnels the whole vocab through one task)
            row = out.agg(
                F.count(F.lit(1)).alias("n"), F.max("tid").alias("m")
            ).first()
            n_out = row["n"]
            wall = time.time() - t0
            width = max_task_rows(
                freq.repartitionByRange(F.col("cnt"), F.col("token"))
                if name == "distributed"
                else freq.repartition(1)
            )
            assert n_out == n, (name, n, n_out)
            print(f"| {n:,} | {name} | {wall:.2f} | {width:,} |", flush=True)
        freq.unpersist()


if __name__ == "__main__":
    main()
