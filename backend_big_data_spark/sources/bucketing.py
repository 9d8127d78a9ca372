"""Bucketed tables: shuffle-free co-located joins (SURVEY.md §4 / PERF.md
scale path).

Writing both sides of a recurring fact⋈fact join bucketed (and sorted) on
the join key means Spark reads them already hash-partitioned: the sort-
merge join plans with NO Exchange on either side. At 100 TB this deletes
the single largest shuffle in the workload (orders⋈lineitem on orderkey) —
the bucketed layout is computed once at write time and amortized over
every subsequent join/aggregation on that key.

Bucketed tables go through the session catalog (``saveAsTable``) because
bucket metadata lives there, not in the parquet files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) parquet table.

    ``num_buckets`` should match (or divide) the downstream shuffle
    partition count so neither side re-shuffles. Sorting within buckets
    additionally removes the Sort from sort-merge joins on the same key.
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
