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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.streaming.ingest_dedup import (
    batch_band_rows,
    dedup_batch_against_corpus,
    dedup_batch_against_corpus_indexed,
    ensure_band_index,
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
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """One micro-batch through scrub → quality gate → corpus dedup.
    Returns the surviving rows with ``text`` already redacted.
    ``corpus_bands``: the maintained LSH band sidecar — when present the
    dedup stage probes it instead of re-shingling the corpus (identical
    survivors; see `dedup_batch_against_corpus_indexed`). Band rows are
    computed over the SCRUBBED text on both sides, consistent with
    fingerprinting after redaction."""
    scrubbed = batch.withColumn(text_col, redact(F.col(text_col)))
    keep = quality_score_lr(scrubbed).filter(F.col("keep")).select(id_col)
    gated = scrubbed.join(keep, on=id_col, how="semi")
    if corpus is not None and corpus_bands is not None:
        return dedup_batch_against_corpus_indexed(
            gated, corpus, corpus_bands,
            threshold=threshold, id_col=id_col, text_col=text_col,
        )
    return dedup_batch_against_corpus(
        gated, corpus, threshold=threshold, id_col=id_col, text_col=text_col
    )


def curated_ingest_sink(
    corpus_dir: str, threshold: float = 0.5, use_band_index: bool = True
):
    """``foreachBatch`` function maintaining a curated corpus at
    ``corpus_dir`` (one ``batch=N`` directory per micro-batch), with the
    same fp + LSH-band sidecar maintenance as `ingest_dedup_sink`."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        corpus = read_corpus(spark, corpus_dir, exclude_batch=batch_id)
        bands = (
            ensure_band_index(spark, corpus_dir, exclude_batch=batch_id)
            if use_band_index and corpus is not None
            else None
        )
        kept = curate_batch(
            batch, corpus, threshold=threshold, corpus_bands=bands
        )
        # persist the admission-time fingerprint (see ingest_dedup_sink)
        bdir = f"batch={batch_id}"
        kept.withColumn("fp", F.md5("text")).write.mode("overwrite").parquet(
            f"{corpus_dir}/{bdir}"
        )
        if use_band_index:
            batch_band_rows(
                spark.read.parquet(f"{corpus_dir}/{bdir}")
            ).write.mode("overwrite").parquet(
                os.path.join(corpus_dir, "bands", bdir)
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
