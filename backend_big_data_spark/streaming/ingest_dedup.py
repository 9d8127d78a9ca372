"""Continuously-deduplicating ingest sink — ``foreachBatch`` around the
batch incremental-dedup operator (text/dedup.py ``incremental_dedup_kept``).

A recurring crawl/ingest never re-deduplicates its corpus from scratch:
each arriving micro-batch is probed against the at-rest kept corpus (exact
fingerprints + LSH-verified near-dups) and only the survivors are appended.
This module wires that batch operator into Structured Streaming, which
contributes exactly the two things batch composition cannot:

- ``foreachBatch``'s (checkpointed) batch-id gating makes the
  append-if-survives step effectively-once across restarts — a replayed
  micro-batch re-runs the SAME dedup decision against the SAME corpus
  state and its admitted docs overwrite their own batch directory;
- ordering: batches apply serially, so batch N+1's probe sees batch N's
  admissions (the corpus grows between batches), matching the sequential
  semantics the batch tests assert.

Scale notes: the per-batch cost is (batch shingling) + (semi-joins against
the corpus fingerprint/shingle tables). Writing each batch's survivors to
their OWN ``batch=N`` subdirectory keeps the append O(batch) — no
read-modify-write of the corpus — and the directory layout doubles as the
ingest's audit log. At 100 TB the corpus-side fingerprint and shingle
tables would be bucketed by their join keys so every probe is co-located;
the composition here is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.text.dedup import (
    doc_shingles,
    incremental_dedup_kept,
    lsh_verified_pairs,
    release_dedup_caches,
)


def read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame | None:
    """The kept corpus accumulated so far, or None before the first batch."""
    if not os.path.isdir(corpus_dir) or not any(
        name.startswith("batch=") for name in os.listdir(corpus_dir)
    ):
        return None
    return spark.read.option("basePath", corpus_dir).parquet(
        corpus_dir + "/batch=*"
    )


def dedup_batch_against_corpus(
    batch: DataFrame,
    corpus: DataFrame | None,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Survivors of one arriving batch vs the at-rest corpus (batch op).

    First batch (no corpus yet): the batch self-deduplicates — exact
    within-batch plus within-batch near components, via the same operator
    with an empty corpus side.
    """
    batch = batch.select(id_col, text_col)
    if corpus is None:
        tagged = batch.withColumn("__new", F.lit(True))
    else:
        tagged = batch.withColumn("__new", F.lit(True)).unionByName(
            corpus.select(id_col, text_col).withColumn("__new", F.lit(False))
        )
    pairs = lsh_verified_pairs(
        doc_shingles(tagged, text_col=text_col, id_col=id_col),
        threshold=threshold,
        hash_fn="md5",
        id_col=id_col,
    )
    kept_ids = incremental_dedup_kept(
        tagged,
        is_new=F.col("__new"),
        verified_pairs=pairs,
        id_col=id_col,
        text_col=text_col,
        within_batch_near=True,
    )
    # the dedup operator emits surviving IDs only — rehydrate the text from
    # the batch (semi-join on the id, batch-sized, never corpus-sized)
    return batch.join(kept_ids, on=id_col, how="semi")


def ingest_dedup_sink(corpus_dir: str, threshold: float = 0.5):
    """``foreachBatch`` function maintaining a deduped corpus at
    ``corpus_dir`` (one ``batch=N`` subdirectory per micro-batch)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        corpus = read_corpus(spark, corpus_dir)
        kept = dedup_batch_against_corpus(batch, corpus, threshold=threshold)
        # overwrite, not append: a replayed batch id rewrites its own
        # directory with the identical survivor set (idempotent)
        kept.write.mode("overwrite").parquet(f"{corpus_dir}/batch={batch_id}")
        release_dedup_caches()

    return apply


def dedup_ingest_stream(
    docs_stream: DataFrame,
    corpus_dir: str,
    checkpoint: str,
    threshold: float = 0.5,
):
    """Attach the deduplicating sink to a document stream. Returns the
    started StreamingQuery (caller awaits/stops)."""
    return (
        docs_stream.writeStream.foreachBatch(ingest_dedup_sink(corpus_dir, threshold))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


__all__ = [
    "dedup_batch_against_corpus",
    "dedup_ingest_stream",
    "ingest_dedup_sink",
    "read_corpus",
]
