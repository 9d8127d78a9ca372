"""Corpus retraction — the DELETION half of the maintained-index contract.

The ingest family's sidecars (content-fingerprint Bloom, LSH band index,
dHash columns, gram index, cluster assignments) are all ADDITIVE: content
is scored once at admission and never again. Erasure requests
(right-to-be-forgotten / takedowns) are the case that breaks additive
indexes, and the one a production corpus cannot refuse. This module
removes a set of ids from an at-rest ``{prefix}=N`` directory log AND
brings the sidecars back in line, with the crash-safety discipline of
`streaming/maintenance.py` (publish-before-destroy around a journaled
commit point).

Correctness is NOT sidecar-dependent — that is the design's load-bearing
property, and it is what makes a crash in any window safe:

- a STALE Bloom bit for a retracted fingerprint causes a false-positive
  prefilter hit; the exact fingerprint semi-join then finds no corpus
  row and the re-ingested document is ADMITTED — no ghost dedup;
- a STALE band-sidecar row yields a candidate id the corpus text fetch
  (an inner semi-join against the rewritten corpus) silently drops;
- a DELETED band sidecar dir is rebuilt from its corpus directory by
  `ingest_dedup.ensure_band_index` (the existing self-healing path).

So sidecar maintenance here is a TIGHTNESS optimisation (fewer false
candidates), while row removal itself is journaled: the surviving rows
are fully written to a temp dir before the journal commits, and only
then is the original replaced — a crash at any point either rolls back
(sources intact) or rolls forward idempotently on the next call, the
same protocol as the fold compactor. Like compaction, run retraction
with the sink quiesced: the brief delete→rename publish window is the
same one `_finish_fold` has.

Retraction deliberately rewrites HISTORY as well: the ids disappear from
every fold-history snapshot (`read_corpus_snapshot`), because erasure
that survives time travel is not erasure.

Scale: the retraction set is request-sized (broadcast literal); each
directory is probed with a column-pruned id scan (parquet footer stats
skip untouched files) and only directories containing hits are
rewritten. Nothing rescans or reshuffles the rest of the corpus.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.sources import fsutil


def _journal_path(base: str) -> str:
    return os.path.join(base, "_retract_journal.json")


def recover_retraction(spark: SparkSession, base: str) -> None:
    """Roll a crashed retraction forward (idempotent; called on entry).

    The journal's existence certifies the temp dir held the COMPLETE
    surviving rows when it was committed, so every step is safe to
    repeat: publish temp over the original, drop the recorded band
    sidecar dir, drop the journal."""
    raw = fsutil.read_text(spark, _journal_path(base))
    if raw is None:
        return
    meta = json.loads(raw)
    target = os.path.join(base, meta["dir"])
    if meta["tmp"] is None:
        # every row of the directory was retracted: publish = delete it
        fsutil.delete(spark, target)
    else:
        tmp = os.path.join(base, meta["tmp"])
        if fsutil.exists(spark, tmp):
            fsutil.delete(spark, target)
            fs, tgt, jvm = fsutil._fs(spark, target)
            fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), tgt)
        if not fsutil.exists(spark, target):
            raise RuntimeError(
                f"retraction journal {_journal_path(base)} names {target} "
                f"but neither it nor {tmp} exists"
            )
    if meta.get("bands"):
        fsutil.delete(spark, os.path.join(base, meta["bands"]))
    fsutil.delete(spark, _journal_path(base), recursive=False)


def retract_ids(
    spark: SparkSession,
    base: str,
    ids: list,
    id_col: str = "doc_id",
    prefix: str = "batch",
    partition_by: tuple[str, ...] = (),
    drop_band_sidecar: bool = True,
) -> dict:
    """Remove ``ids`` from every ``{prefix}=N`` directory under ``base``
    (including fold-compacted ones — their names are the same), deleting
    each affected directory's band sidecar for rebuild. Returns
    ``{"dirs_rewritten": [...], "rows_removed": n}``.

    ``partition_by``: partition columns of the at-rest layout (the
    embedding corpus is laid out by ``cluster``) so the rewrite
    preserves it."""
    recover_retraction(spark, base)
    from backend_big_data_spark.streaming.maintenance import (
        fold_exclusions,
        recover_fold,
    )

    # resolve any pending fold first so no directory hides behind its
    # crash-window mask while we erase
    recover_fold(spark, base, prefix)
    skip = fold_exclusions(spark, base, prefix)
    names = sorted(
        n
        for n in fsutil.list_subdirs(spark, base, prefix=f"{prefix}=")
        if n not in skip
    )
    if not names or not ids:
        return {"dirs_rewritten": [], "rows_removed": 0}
    lits = [F.lit(i) for i in ids]
    # ONE partition-discovered probe finds every affected directory:
    # column-pruned to the id (footer stats skip clean files), grouped on
    # the discovered {prefix} partition column — per-request cost is a
    # single metadata-light job, not a job per directory
    probe = spark.read.option("basePath", base).parquet(
        *[os.path.join(base, n) for n in names]
    )
    hits = {
        f"{prefix}={r[prefix]}": r["n"]
        for r in probe.filter(F.col(id_col).isin(lits))
        .groupBy(prefix)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rewritten: list[str] = []
    removed = 0
    for name in sorted(hits):
        n_hit = hits[name]
        path = os.path.join(base, name)
        df = spark.read.parquet(path)
        surviving = df.filter(~F.col(id_col).isin(lits))
        bands_rel = (
            os.path.join("bands", name)
            if drop_band_sidecar
            and fsutil.exists(spark, os.path.join(base, "bands", name))
            else None
        )
        _journaled_replace(
            spark, base, name, surviving, partition_by, bands_rel
        )
        rewritten.append(name)
        removed += n_hit
    return {"dirs_rewritten": rewritten, "rows_removed": removed}


def _journaled_replace(
    spark: SparkSession,
    base: str,
    rel_dir: str,
    surviving,
    partition_by: tuple[str, ...] = (),
    bands_rel: str | None = None,
) -> None:
    """Publish ``surviving`` over ``{base}/{rel_dir}`` behind the
    retraction journal: temp dir fully written first, journal commit,
    then the delete→rename publish and sidecar drop run through
    :func:`recover_retraction` (so a crash anywhere replays them). An
    EMPTY frame publishes as a directory DELETE — an empty parquet dir
    would break the union readers."""
    if surviving.isEmpty():
        tmp_name = None
    else:
        tmp_name = "_retracting_" + rel_dir.replace("/", "_").replace("=", "_")
        writer = surviving.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(base, tmp_name))
    meta = {"dir": rel_dir, "tmp": tmp_name, "bands": bands_rel}
    fsutil.write_text_atomic(spark, _journal_path(base), json.dumps(meta))
    recover_retraction(spark, base)  # the journaled steps themselves


def retract_from_ingest_corpus(
    spark: SparkSession, corpus_dir: str, doc_ids: list
) -> dict:
    """Erase documents from a text ingest corpus
    (`streaming/ingest_dedup.py` layout): journaled row removal, band
    sidecar dirs dropped for self-healing rebuild, and the Bloom sidecar
    rebuilt tight from the surviving directories (stale bits would only
    cost false-positive prefilter hits, but a tight bitmap keeps the
    probe's selectivity honest)."""
    out = retract_ids(spark, corpus_dir, doc_ids, id_col="doc_id")
    if out["dirs_rewritten"]:
        from backend_big_data_spark.streaming.ingest_dedup import (
            _bloom_path,
            load_corpus_bloom,
            save_corpus_bloom,
        )

        fsutil.delete(spark, _bloom_path(corpus_dir), recursive=False)
        words, covered = load_corpus_bloom(spark, corpus_dir)
        if words is not None:
            save_corpus_bloom(spark, corpus_dir, words, covered)
    return out


def retract_from_linkage_master(
    spark: SparkSession, master_dir: str, ids: list, q: int = 3
) -> dict:
    """Erase entities from a linkage master
    (`streaming/linkage_ingest.py` layout): journaled row removal, each
    affected directory's gram-index sidecar REWRITTEN from its surviving
    rows (journaled too — the gram index has no self-healing rebuild, so
    unlike the band sidecar it must never be left missing; stale GHOST
    gram rows in any crash window are harmless because candidates verify
    against the rewritten master), and link-result rows naming the
    erased master ids purged from ``links/batch=N`` (derived personal
    data goes with the entity)."""
    from backend_big_data_spark.operators.fuzzyjoin import gram_index

    out = retract_ids(
        spark, master_dir, ids, id_col="id", drop_band_sidecar=False
    )
    for name in out["dirs_rewritten"]:
        path = os.path.join(master_dir, name)
        grams_rel = os.path.join("grams", name)
        if fsutil.exists(spark, path):
            fresh = gram_index(spark.read.parquet(path), q=q)
            _journaled_replace(spark, master_dir, grams_rel, fresh)
        else:
            fsutil.delete(spark, os.path.join(master_dir, grams_rel))
    links_base = os.path.join(master_dir, "links")
    links = retract_ids(
        spark, links_base, ids, id_col="master_id", drop_band_sidecar=False
    ) if fsutil.exists(spark, links_base) else {"rows_removed": 0}
    out["link_rows_removed"] = links["rows_removed"]
    return out


__all__ = [
    "recover_retraction",
    "retract_from_ingest_corpus",
    "retract_from_linkage_master",
    "retract_ids",
]
