"""The full curation pipeline as a CONTINUOUS ingest: every arriving
micro-batch is PII-scrubbed, quality-filtered, then deduplicated against
the at-rest corpus before its survivors append — the streaming twin of
`plans/curation.doc_cleaning_pipeline_funnel`, built from the same batch
operators (map-only ops compose into streaming unchanged; only the
corpus-dependent dedup step needs `foreachBatch`'s batch-id gating).

Order matters and mirrors the batch pipeline: scrub BEFORE fingerprinting
(two docs differing only in PII must dedup as equals — and redaction
tokens make that literal), filter BEFORE dedup (a rejected doc must not
suppress a later clean near-duplicate).

Replay safety is inherited from `ingest_dedup`: a restarted batch re-runs
the same deterministic decisions against the same corpus state and
overwrites its own ``batch=N`` directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.streaming.ingest_dedup import (
    dedup_batch_against_corpus,
    read_corpus,
    release_dedup_caches,
)
from backend_big_data_spark.text.filtering import quality_score_lr
from backend_big_data_spark.text.pii import redact


def curate_batch(
    batch: DataFrame,
    corpus: DataFrame | None,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One micro-batch through scrub → quality gate → corpus dedup.
    Returns the surviving rows with ``text`` already redacted."""
    scrubbed = batch.withColumn(text_col, redact(F.col(text_col)))
    keep = quality_score_lr(scrubbed).filter(F.col("keep")).select(id_col)
    gated = scrubbed.join(keep, on=id_col, how="semi")
    return dedup_batch_against_corpus(
        gated, corpus, threshold=threshold, id_col=id_col, text_col=text_col
    )


def curated_ingest_sink(corpus_dir: str, threshold: float = 0.5):
    """``foreachBatch`` function maintaining a curated corpus at
    ``corpus_dir`` (one ``batch=N`` directory per micro-batch)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        corpus = read_corpus(spark, corpus_dir, exclude_batch=batch_id)
        kept = curate_batch(batch, corpus, threshold=threshold)
        # persist the admission-time fingerprint (see ingest_dedup_sink)
        kept.withColumn("fp", F.md5("text")).write.mode("overwrite").parquet(
            f"{corpus_dir}/batch={batch_id}"
        )
        release_dedup_caches()

    return apply


def curated_ingest_stream(
    docs_stream: DataFrame,
    corpus_dir: str,
    checkpoint: str,
    threshold: float = 0.5,
):
    """Attach the curating sink to a document stream; returns the started
    StreamingQuery (caller awaits/stops)."""
    return (
        docs_stream.writeStream.foreachBatch(
            curated_ingest_sink(corpus_dir, threshold)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


__all__ = ["curate_batch", "curated_ingest_sink", "curated_ingest_stream"]
