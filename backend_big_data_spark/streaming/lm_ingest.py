"""Incremental language-model training — maintained n-gram COUNT
sidecars over a streaming document corpus.

N-gram counts are ADDITIVE across document batches, so a corpus sink
that writes each batch's bigram/trigram counts as per-batch sidecar
directories gives incremental LM training for free: the keyed sum of
the sidecars equals the counts a full corpus scan would produce, and
every count-driven model (`text/lm.py` add-k, `text/kneser_ney.py` KN —
whose every lower order is a continuation count over the count TABLE)
retrains from the maintained counts without touching a single document.
The equivalence is oracle-certified: `doc_kn_incremental_model` builds
the KN model from the maintained counts and must hash-match the SAME
DuckDB twin as the full-retrain `doc_kn_bigram_model`.

Per micro-batch of (doc_id, text):

1. the raw batch appends as ``batch=N`` (the corpus of record),
2. its bigram counts as ``bigrams/batch=N`` (w1, w2, c12),
3. its trigram counts as ``trigrams/batch=N`` (w1, w2, w3, c123).

Readers union the sidecar dirs and sum by key (`read_lm_bigram_counts`
/ `read_lm_trigram_counts`); the compactor folds both sidecars with the
same keyed sum (a fold IS the readers' merge done once and persisted).
Replay safety: per-batch overwrite — an at-least-once retry rewrites
identical counts.

Erasure (`retract_from_lm_corpus`): unlike the linkage/setsim INDEX
sidecars (id-keyed rows the purge can filter), count rows carry no
document id — but they are a PURE AGGREGATE of the corpus dirs, so the
journaled erasure protocol here is rebuild-to-match-layout: remove the
documents (journaled, `retraction.retract_ids`), then recount every
count sidecar from its surviving documents directory and delete count
dirs whose documents directory no longer exists (their mass is inside
the folded docs dir, which gets recounted). Idempotent and crash-safe
for the same reason: recounting from the current docs layout is a
fixed point. Ghost counts matter — an erased document's bigrams can
reconstruct its phrasing, so the sidecar purge is part of the erasure
guarantee (the linkage master's argument, `retraction.py`).

Scale shape: per-batch cost is one tokenize + two hash aggregates over
the BATCH; model (re)build cost is over the COUNT TABLES (vocabulary²
at worst), never the corpus. At 100 TB the counts sidecar IS the
pinned-model discipline `text/lm.py` prescribes, kept fresh per batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.sources import fsutil
from backend_big_data_spark.streaming.linkage_ingest import _read_dirs
from backend_big_data_spark.text.kneser_ney import doc_trigram_occurrences
from backend_big_data_spark.text.lm import doc_bigram_occurrences


def _batch_bigram_counts(docs: DataFrame) -> DataFrame:
    occ = doc_bigram_occurrences(docs)
    return (
        occ.withColumn("w2", F.split(F.col("bigram"), " ")[1])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )


def _batch_trigram_counts(docs: DataFrame) -> DataFrame:
    return doc_trigram_occurrences(docs).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c123")
    )


def read_lm_docs(
    spark: SparkSession, corpus_dir: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """The document corpus of record (doc_id, text), or None."""
    return _read_dirs(spark, corpus_dir, exclude_batch)


def read_lm_bigram_counts(
    spark: SparkSession, corpus_dir: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """(w1, w2, c12) summed across the maintained per-batch sidecars —
    equals the full-corpus bigram counts exactly (additivity)."""
    raw = _read_dirs(
        spark, os.path.join(corpus_dir, "bigrams"), exclude_batch
    )
    if raw is None:
        return None
    return raw.groupBy("w1", "w2").agg(F.sum("c12").alias("c12"))


def read_lm_trigram_counts(
    spark: SparkSession, corpus_dir: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """(w1, w2, w3, c123) summed across the maintained sidecars."""
    raw = _read_dirs(
        spark, os.path.join(corpus_dir, "trigrams"), exclude_batch
    )
    if raw is None:
        return None
    return raw.groupBy("w1", "w2", "w3").agg(F.sum("c123").alias("c123"))


def lm_ingest_sink(corpus_dir: str, score_batches: bool = False):
    """``foreachBatch`` function maintaining the corpus of record and
    its bigram/trigram count sidecars under ``corpus_dir``.

    ``score_batches``: additionally score every arriving document
    against the CORPUS-SO-FAR KN bigram model (built from the maintained
    count sidecars, ``exclude_batch`` for replay safety — never a
    retrain scan) into ``ppl/batch=N`` rows (doc_id, n_bigrams, nll_fp;
    NULL nll_fp = the document contains a model-unseen bigram, the
    honest OOV signal) — the streaming form of the CCNet perplexity
    filter: score-at-arrival, threshold downstream. Batch 0 scores
    against an empty model (every doc OOV) so the sidecar covers every
    batch uniformly. Scoring is read-only w.r.t. the maintained state;
    replay rewrites identical rows."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        bdir = f"batch={batch_id}"
        batch.select("doc_id", "text").write.mode("overwrite").parquet(
            os.path.join(corpus_dir, bdir)
        )
        docs = spark.read.parquet(os.path.join(corpus_dir, bdir))
        if score_batches:
            from backend_big_data_spark.text.kneser_ney import (
                kn_bigram_model_from_counts,
                kn_doc_nll_from_model,
            )

            counts = read_lm_bigram_counts(
                spark, corpus_dir, exclude_batch=batch_id
            )
            if counts is None:
                scored = (
                    doc_bigram_occurrences(docs)
                    .groupBy("doc_id")
                    .agg(F.count(F.lit(1)).cast("int").alias("n_bigrams"))
                    .select(
                        "doc_id",
                        "n_bigrams",
                        F.lit(None).cast("long").alias("nll_fp"),
                    )
                )
            else:
                scored = kn_doc_nll_from_model(
                    docs, kn_bigram_model_from_counts(counts)
                )
            scored.write.mode("overwrite").parquet(
                os.path.join(corpus_dir, "ppl", bdir)
            )
        _batch_bigram_counts(docs).write.mode("overwrite").parquet(
            os.path.join(corpus_dir, "bigrams", bdir)
        )
        _batch_trigram_counts(docs).write.mode("overwrite").parquet(
            os.path.join(corpus_dir, "trigrams", bdir)
        )

    return apply


def lm_ingest_stream(doc_stream: DataFrame, corpus_dir: str, checkpoint: str):
    """Attach the LM-count sink to a document stream. Returns the
    started StreamingQuery (caller awaits/stops)."""
    return (
        doc_stream.writeStream.foreachBatch(lm_ingest_sink(corpus_dir))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_lm_corpus(
    spark: SparkSession, corpus_dir: str, keep_latest: int = 1
) -> list[int]:
    """Fold the commit-stable prefix of the corpus and BOTH count
    sidecars (keyed sums — the readers' merge persisted). Sidecar folds
    run unconditionally (the round-9 alignment discipline: a crash
    between the docs fold and the sidecar folds must heal on the next
    call)."""
    from backend_big_data_spark.streaming.maintenance import _fold

    folded = _fold(spark, corpus_dir, "batch", keep_latest)
    bi_dir = os.path.join(corpus_dir, "bigrams")
    if fsutil.list_subdirs(spark, bi_dir, prefix="batch="):
        _fold(
            spark,
            bi_dir,
            "batch",
            keep_latest,
            reducer=lambda df: df.groupBy("w1", "w2").agg(
                F.sum("c12").alias("c12")
            ),
        )
    tri_dir = os.path.join(corpus_dir, "trigrams")
    if fsutil.list_subdirs(spark, tri_dir, prefix="batch="):
        _fold(
            spark,
            tri_dir,
            "batch",
            keep_latest,
            reducer=lambda df: df.groupBy("w1", "w2", "w3").agg(
                F.sum("c123").alias("c123")
            ),
        )
    return folded


def _lm_journal_path(corpus_dir: str) -> str:
    return os.path.join(corpus_dir, "_retract_lm_journal.json")


def _affected_doc_dirs(
    spark: SparkSession, corpus_dir: str, ids: list
) -> list[str]:
    """The ``batch=N`` documents dirs currently holding any of ``ids`` —
    probed BEFORE the row removal (afterwards the evidence is gone), and
    journaled with the request so the replay recounts the same dirs."""
    names = sorted(fsutil.list_subdirs(spark, corpus_dir, prefix="batch="))
    if not names or not ids:
        return []
    lits = [F.lit(i) for i in ids]
    probe = spark.read.option("basePath", corpus_dir).parquet(
        *[os.path.join(corpus_dir, n) for n in names]
    )
    return sorted(
        f"batch={r['batch']}"
        for r in probe.filter(F.col("doc_id").isin(lits))
        .select("batch")
        .distinct()
        .collect()
    )


def _recount_sidecars(
    spark: SparkSession, corpus_dir: str, doc_dirs: list[str]
) -> list[str]:
    """Recount the count sidecars of ``doc_dirs`` from their (current,
    post-removal) documents dirs, plus two layout repairs computed from
    the CURRENT state (so the journaled replay is a fixed point):
    orphaned count dirs — counts whose docs dir was folded away before
    the sidecar folds ran — are deleted AFTER the folded docs dir that
    now covers their mass (from `maintenance.fold_history`) is
    recounted; an orphan with no fold-history cover falls back to
    recounting every docs dir (correct, just wider)."""
    from backend_big_data_spark.streaming.maintenance import fold_history

    doc_names = set(fsutil.list_subdirs(spark, corpus_dir, prefix="batch="))
    targets = set(doc_dirs) & doc_names
    hist = fold_history(spark, corpus_dir, "batch")
    cover = {
        orig: f"batch={pub}" for pub, origs in hist.items() for orig in origs
    }
    orphans: dict[str, list[str]] = {}
    for side in ("bigrams", "trigrams"):
        base = os.path.join(corpus_dir, side)
        side_names = set(fsutil.list_subdirs(spark, base, prefix="batch="))
        orphans[side] = sorted(side_names - doc_names)
        for name in orphans[side]:
            covering = cover.get(int(name.split("=", 1)[1]))
            if covering is not None and covering in doc_names:
                targets.add(covering)
            else:
                targets = set(doc_names)  # unexplained orphan: recount all
    rebuilt = []
    for side, recount in (
        ("bigrams", _batch_bigram_counts),
        ("trigrams", _batch_trigram_counts),
    ):
        base = os.path.join(corpus_dir, side)
        for name in sorted(targets):
            docs_path = os.path.join(corpus_dir, name)
            if not fsutil.exists(spark, docs_path):
                continue
            tmp = os.path.join(base, "_recount_" + name.replace("=", "_"))
            recount(spark.read.parquet(docs_path)).write.mode(
                "overwrite"
            ).parquet(tmp)
            fsutil.delete(spark, os.path.join(base, name))
            fsutil.rename_checked(spark, tmp, os.path.join(base, name))
            rebuilt.append(f"{side}/{name}")
        # orphans go LAST: until the covering recount above lands, the
        # orphan still holds its batch's (non-erased) mass — a reader in
        # the window sees at worst a transient over-count, never a loss
        for name in orphans[side]:
            fsutil.delete(spark, os.path.join(base, name))
    return rebuilt


def recover_lm_retraction(spark: SparkSession, corpus_dir: str) -> None:
    """Roll a crashed `retract_from_lm_corpus` forward (idempotent,
    called on entry): the journal records the erasure request AND the
    affected docs dirs before any mutation; replay re-removes the rows
    and re-runs the recount — both fixed points of the current state."""
    from backend_big_data_spark.streaming.retraction import retract_ids

    raw = fsutil.read_text(spark, _lm_journal_path(corpus_dir))
    if raw is None:
        return
    meta = json.loads(raw)
    retract_ids(
        spark, corpus_dir, meta["ids"], id_col="doc_id",
        drop_band_sidecar=False,
    )
    _recount_sidecars(spark, corpus_dir, meta["dirs"])
    _purge_ppl_rows(spark, corpus_dir, meta["ids"])
    fsutil.delete(spark, _lm_journal_path(corpus_dir), recursive=False)


def _purge_ppl_rows(spark: SparkSession, corpus_dir: str, ids: list) -> int:
    """Per-document score rows (``ppl/batch=N``) are derived personal
    data keyed by doc id — erasure removes them like the linkage
    masters' link rows."""
    from backend_big_data_spark.streaming.retraction import retract_ids

    ppl_base = os.path.join(corpus_dir, "ppl")
    if not fsutil.exists(spark, ppl_base):
        return 0
    out = retract_ids(
        spark, ppl_base, ids, id_col="doc_id", drop_band_sidecar=False
    )
    return out["rows_removed"]


def retract_from_lm_corpus(
    spark: SparkSession, corpus_dir: str, doc_ids: list
) -> dict:
    """Erase documents from an LM training corpus AND its count
    sidecars. Ghost n-gram counts can reconstruct an erased document's
    phrasing, so the count purge is part of the erasure guarantee; the
    counts carry no doc id, so the purge RECOUNTS the affected batches'
    sidecars from their surviving documents (journaled, affected dirs
    probed before the removal — see module docstring for why recount is
    the right primitive here and the id-keyed filter is right for the
    linkage/setsim indexes)."""
    from backend_big_data_spark.streaming.retraction import retract_ids

    recover_lm_retraction(spark, corpus_dir)
    dirs = _affected_doc_dirs(spark, corpus_dir, doc_ids)
    fsutil.write_text_atomic(
        spark,
        _lm_journal_path(corpus_dir),
        json.dumps({"ids": list(doc_ids), "dirs": dirs}),
    )
    out = retract_ids(
        spark, corpus_dir, doc_ids, id_col="doc_id", drop_band_sidecar=False
    )
    out["count_dirs_rebuilt"] = _recount_sidecars(spark, corpus_dir, dirs)
    out["ppl_rows_removed"] = _purge_ppl_rows(spark, corpus_dir, doc_ids)
    fsutil.delete(spark, _lm_journal_path(corpus_dir), recursive=False)
    return out


__all__ = [
    "compact_lm_corpus",
    "lm_ingest_sink",
    "lm_ingest_stream",
    "read_lm_bigram_counts",
    "read_lm_docs",
    "read_lm_trigram_counts",
    "recover_lm_retraction",
    "retract_from_lm_corpus",
]
