"""Log-structured sidecar compaction — the periodic delta-folding the
ingest sinks' docstrings promise (`sources/compaction.py` is the
general-purpose file compactor; this module folds the sinks' SEMANTIC
log structure: ``batch=N`` survivor dirs, ``bands/batch=N`` index rows,
``delta=N`` token-count deltas).

Why fold at all: every per-batch directory adds a file-listing + footer
cost to every subsequent probe, and the reader-side merge of the drift
counts grows with the delta count. Folding rewrites many directories
into one while preserving EXACTLY the read semantics (the readers union
directories and, for counts, sum by key — folding is the same union/sum
done once and persisted).

Replay safety: a directory may only be folded once its batch can never
replay. Structured Streaming replays at most the batches after the last
committed checkpoint — in practice the newest one — so both compactors
keep the ``keep_latest`` newest directories untouched (default 1) and
fold only the older, commit-stable prefix. Folded ids cease to exist as
directories; that is safe precisely because those ids will never be
offered to ``exclude_batch`` again.

Bloom sidecar: folding renames directories, not fingerprints — the
bitmap's bits are unchanged. The sidecar's covered-batch list is
rewritten to the post-fold directory set so `load_corpus_bloom` keeps
trusting it instead of triggering a full rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.sources import fsutil


def _batch_ids(spark: SparkSession, base: str, prefix: str) -> list[int]:
    return sorted(
        int(n.split("=", 1)[1])
        for n in fsutil.list_subdirs(spark, base, prefix=prefix + "=")
    )


def _fold(
    spark: SparkSession,
    base: str,
    prefix: str,
    keep_latest: int,
    reducer=None,
) -> list[int]:
    """Fold all but the ``keep_latest`` newest ``{prefix}=N`` dirs under
    ``base`` into the oldest folded id's directory. Returns folded ids
    (empty when there is nothing to do). ``reducer`` post-processes the
    unioned frame (the drift counts' keyed sum)."""
    ids = _batch_ids(spark, base, prefix)
    fold = ids[: len(ids) - keep_latest] if keep_latest else ids
    if len(fold) < 2:
        return []
    paths = [os.path.join(base, f"{prefix}={i}") for i in fold]
    # no basePath: the {prefix}=N component must NOT surface as a
    # partition column, or the rewrite would bake it into the data files
    # and collide with the readers' partition-discovered column
    df = spark.read.parquet(*paths)
    if prefix in df.columns:
        df = df.drop(prefix)
    if reducer is not None:
        df = reducer(df)
    target = os.path.join(base, f"{prefix}={fold[0]}")
    tmp = os.path.join(base, f"_compacting_{prefix}_{fold[0]}")
    df.write.mode("overwrite").parquet(tmp)
    for p in paths:
        fsutil.delete(spark, p)
    # publish via rename — readers never observe a half-deleted union
    fs, tgt, jvm = fsutil._fs(spark, target)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), tgt)
    return fold


def compact_ingest_corpus(
    spark: SparkSession, corpus_dir: str, keep_latest: int = 1
) -> list[int]:
    """Fold the commit-stable prefix of an ingest corpus (survivor dirs +
    the bands sidecar) into single directories, and repoint the Bloom
    sidecar's covered-batch list. Read semantics are unchanged:
    `read_corpus` / `read_corpus_bands` union whatever directories
    exist. Returns the folded batch ids."""
    from backend_big_data_spark.streaming.ingest_dedup import (
        load_corpus_bloom,
        save_corpus_bloom,
    )

    folded = _fold(spark, corpus_dir, "batch", keep_latest)
    if not folded:
        return []
    bands_dir = os.path.join(corpus_dir, "bands")
    if fsutil.list_subdirs(spark, bands_dir, prefix="batch="):
        _fold(spark, bands_dir, "batch", keep_latest)
    if fsutil.read_text(spark, os.path.join(corpus_dir, "_fp_bloom.json")):
        words, _covered = load_corpus_bloom(spark, corpus_dir)
        if words is not None:
            save_corpus_bloom(
                spark,
                corpus_dir,
                words,
                set(fsutil.list_subdirs(spark, corpus_dir, prefix="batch=")),
            )
    return folded


def compact_quality_grid(
    spark: SparkSession, grid_dir: str, keep_latest: int = 1
) -> list[int]:
    """Fold the commit-stable prefix of the quality monitor's ``delta=N``
    calibration-grid log into one pre-summed grid (the reader's keyed
    merge done once and persisted). Returns the folded batch ids."""
    return _fold(
        spark,
        grid_dir,
        "delta",
        keep_latest,
        reducer=lambda df: df.groupBy("source", "bucket").agg(
            F.sum("n_docs").alias("n_docs"), F.sum("toks").alias("toks")
        ),
    )


def compact_drift_counts(
    spark: SparkSession, counts_dir: str, keep_latest: int = 1
) -> list[int]:
    """Fold the commit-stable prefix of the drift monitor's ``delta=N``
    token-count log into one pre-summed delta — the reader's keyed merge
    done once and persisted. Returns the folded batch ids."""
    return _fold(
        spark,
        counts_dir,
        "delta",
        keep_latest,
        reducer=lambda df: df.groupBy("tok").agg(F.sum("n").alias("n")),
    )


__all__ = ["compact_drift_counts", "compact_ingest_corpus", "compact_quality_grid"]
