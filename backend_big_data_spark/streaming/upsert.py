"""CDC-style streaming upsert sink — keyed merge into a parquet table via
``foreachBatch`` (north-star additive scope; no lake format available in
this container, so the merge is read-antijoin-union-rewrite).

Semantics per micro-batch: latest record per key within the batch wins
(dedup by event-time), then batch rows REPLACE existing rows sharing their
key (upsert). The batch id checkpointing of ``foreachBatch`` plus the
idempotent rewrite give effectively-once application across restarts.

Scale notes: full-table rewrite per batch is the honest cost of upsert on
plain parquet — at 100 TB you partition the table on a key prefix and
rewrite ONLY partitions containing batch keys (dynamic partition
overwrite), or use a format with merge support (Delta/Iceberg); the
foreachBatch structure is identical in all three cases, which is the point
of demonstrating it this way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _latest_per_key(batch: DataFrame, key: str, order_col: str) -> DataFrame:
    w = Window.partitionBy(key).orderBy(F.desc(order_col))
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_batch_into_parquet(
    batch: DataFrame, path: str, key: str, order_col: str
) -> None:
    """Merge one (micro-)batch into the keyed parquet table at ``path``."""
    spark = batch.sparkSession
    fresh = _latest_per_key(batch, key, order_col)
    if os.path.exists(path):
        current = spark.read.parquet(path)
        kept = current.join(fresh.select(key), on=key, how="anti")
        merged = kept.unionByName(fresh)
    else:
        merged = fresh
    # rewrite to a temp dir then swap: the sink must not read and overwrite
    # the same files in one job
    tmp = path.rstrip("/") + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)


def upsert_stream_to_parquet(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    key: str,
    order_col: str,
):
    """Attach the upsert sink to a streaming DataFrame (availableNow-
    compatible). Returns the started StreamingQuery."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch_into_parquet(batch_df, path, key, order_col)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
