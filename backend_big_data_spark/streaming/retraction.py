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
            fsutil.rename_checked(spark, tmp, target)
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
        # explicit isNull arm: ``~isin`` is NULL (not true) for a NULL id,
        # so without it null-id rows would be deleted as collateral
        surviving = df.filter(
            F.col(id_col).isNull() | ~F.col(id_col).isin(lits)
        )
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


def retract_from_embedding_corpus(
    spark: SparkSession, corpus_dir: str, vec_ids: list, id_col: str = "vec_id"
) -> dict:
    """Erase vectors from a semdedup embedding corpus
    (`streaming/semdedup_ingest.py` layout): journaled row removal that
    PRESERVES the cluster-partitioned directory layout (the incremental
    probe's dynamic partition pruning depends on it). The corpus' only
    maintained per-row state is the stored ``cluster`` id, which leaves
    with the row; the pinned centroid frame is aggregate blocking
    statistics, not per-vector content, so it is deliberately untouched
    — future batches keep clustering consistently, and a re-ingested
    twin of an erased vector is ADMITTED because the corpus no longer
    holds its neighbor (no ghost dedup)."""
    return retract_ids(
        spark,
        corpus_dir,
        vec_ids,
        id_col=id_col,
        partition_by=("cluster",),
        drop_band_sidecar=False,
    )


def retract_from_image_corpus(
    spark: SparkSession, corpus_dir: str, media_ids: list
) -> dict:
    """Erase images from an image ingest corpus
    (`streaming/image_ingest.py` layout): journaled row removal takes the
    payload AND its maintained in-row ``dhash`` fingerprint together (the
    probe computes band keys from the corpus scan per batch, so there is
    no separate band sidecar to chase), and quarantine rows naming the
    erased ids are purged too — a quarantined media_id is still a record
    that the content arrived."""
    out = retract_ids(spark, corpus_dir, media_ids, id_col="media_id")
    qbase = os.path.join(corpus_dir, "quarantine")
    if fsutil.exists(spark, qbase):
        q = retract_ids(
            spark, qbase, media_ids, id_col="media_id", drop_band_sidecar=False
        )
        out["quarantine_rows_removed"] = q["rows_removed"]
    else:
        out["quarantine_rows_removed"] = 0
    return out


def _linkage_journal_path(master_dir: str) -> str:
    return os.path.join(master_dir, "_retract_linkage_journal.json")


def _purge_index_sidecars(
    spark: SparkSession,
    master_dir: str,
    ids: list,
    index_name: str,
    freq_name: str,
    key_col: str,
    rebuild,
    bucket_col: str | None = None,
    bucket_expr=None,
) -> list[str]:
    """Rewrite every inverted-index/frequency sidecar directory still
    naming a retracted id, from its (already rewritten) master directory
    — UNCONDITIONAL: affected dirs are detected by probing the index
    sidecars for the ids themselves, never inferred from a prior step's
    return value, so the purge is idempotent and replayable after any
    crash. Per directory the frequency rewrite runs FIRST: ghost (id,
    key) index rows are the durable marker that a directory's sidecars
    are not yet purged, so the marker must be destroyed last.

    ``rebuild(master_df) -> (id, key_col) index frame``; the frequency
    sidecar is its per-``key_col`` count. Shared by the linkage master
    (grams/gramfreq) and the setsim master (tokens/tokfreq).

    ``bucket_col``/``bucket_expr``: bucketed-layout support (the linkage
    gram index after a ``gram_buckets`` fold): dirs carrying the bucket
    partition column are probed separately from flat dirs (a single
    multi-path read would reject the mixed structure), and their
    rewrites recompute ``bucket_col = bucket_expr`` and publish
    PARTITIONED BY it — erasure preserves each directory's own layout."""
    index_base = os.path.join(master_dir, index_name)
    names = sorted(fsutil.list_subdirs(spark, index_base, prefix="batch="))
    if not names or not ids:
        return []
    bucketed_names = {
        n
        for n in names
        if bucket_col
        and fsutil.list_subdirs(
            spark, os.path.join(index_base, n), prefix=f"{bucket_col}="
        )
    }
    lits = [F.lit(i) for i in ids]
    hit: list[str] = []
    for group in (
        sorted(set(names) - bucketed_names),
        sorted(bucketed_names),
    ):
        if not group:
            continue
        probe = spark.read.option("basePath", index_base).parquet(
            *[os.path.join(index_base, n) for n in group]
        )
        hit.extend(
            f"batch={r['batch']}"
            for r in probe.filter(F.col("id").isin(lits))
            .select("batch")
            .distinct()
            .collect()
        )
    for name in sorted(hit):
        master_path = os.path.join(master_dir, name)
        freq_rel = os.path.join(freq_name, name)
        index_rel = os.path.join(index_name, name)
        part_by: tuple[str, ...] = (
            (bucket_col,) if name in bucketed_names else ()
        )
        if fsutil.exists(spark, master_path):
            fresh = rebuild(spark.read.parquet(master_path))
            if name in bucketed_names:
                fresh = fresh.withColumn(bucket_col, bucket_expr)
        else:
            # Master dir absent for this batch id: its rows were folded
            # into an older master dir and the sidecar folds never ran (a
            # compaction crash between the master fold and the sidecar
            # folds — the compactors re-align this on their next run, but
            # a retraction may arrive first). The sidecar dir still holds
            # LIVE index rows of every OTHER entity admitted in that
            # batch, so deleting the dir would silently lose their future
            # links. Rewrite in place instead: keep everything but the
            # retracted ids (NULL ids survive — isin is NULL-poisoning),
            # recount the frequency sidecar from the kept rows.
            fresh = spark.read.parquet(
                os.path.join(index_base, name)
            ).filter(F.col("id").isNull() | ~F.col("id").isin(lits))
        if fsutil.exists(spark, os.path.join(master_dir, freq_rel)):
            _journaled_replace(
                spark,
                master_dir,
                freq_rel,
                fresh.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt")),
            )
        _journaled_replace(
            spark, master_dir, index_rel, fresh, partition_by=part_by
        )
    return sorted(hit)


def _purge_linkage_sidecars(
    spark: SparkSession, master_dir: str, ids: list, q: int
) -> list[str]:
    from backend_big_data_spark.operators.fuzzyjoin import gram_index
    from backend_big_data_spark.streaming.linkage_ingest import (
        _gram_bucket_count,
    )
    from backend_big_data_spark.text.sampling import stable_hash

    n_buckets = _gram_bucket_count(spark, master_dir)
    return _purge_index_sidecars(
        spark,
        master_dir,
        ids,
        index_name="grams",
        freq_name="gramfreq",
        key_col="gram",
        rebuild=lambda df: gram_index(df, q=q),
        bucket_col="__gb" if n_buckets else None,
        bucket_expr=(
            (stable_hash(F.col("gram")) % n_buckets).cast("int")
            if n_buckets
            else None
        ),
    )


def _purge_linkage_links(spark: SparkSession, master_dir: str, ids: list) -> int:
    links_base = os.path.join(master_dir, "links")
    if not fsutil.exists(spark, links_base):
        return 0
    out = retract_ids(
        spark, links_base, ids, id_col="master_id", drop_band_sidecar=False
    )
    return out["rows_removed"]


def recover_linkage_retraction(spark: SparkSession, master_dir: str) -> None:
    """Roll a crashed `retract_from_linkage_master` forward (idempotent;
    called on entry). The linkage journal records the erasure REQUEST
    (ids, q) before any mutation, and is cleared only after the sidecar
    and link purges complete — so a crash in any window replays them
    here. Without this, the q-gram multiset of an erased string could
    survive in the ``grams`` sidecar forever: erasure that survives in
    a sidecar is not erasure."""
    raw = fsutil.read_text(spark, _linkage_journal_path(master_dir))
    if raw is None:
        return
    meta = json.loads(raw)
    retract_ids(
        spark, master_dir, meta["ids"], id_col="id", drop_band_sidecar=False
    )
    _purge_linkage_sidecars(spark, master_dir, meta["ids"], meta["q"])
    _purge_linkage_links(spark, master_dir, meta["ids"])
    fsutil.delete(spark, _linkage_journal_path(master_dir), recursive=False)


def retract_from_linkage_master(
    spark: SparkSession, master_dir: str, ids: list, q: int = 3
) -> dict:
    """Erase entities from a linkage master
    (`streaming/linkage_ingest.py` layout): journaled row removal, every
    gram-index and gram-frequency sidecar directory still naming an
    erased id REWRITTEN from its surviving master rows, and link-result
    rows naming the erased master ids purged from ``links/batch=N``
    (derived personal data goes with the entity).

    The whole sequence runs behind its own journal recording the erasure
    request up front: unlike the text corpus's Bloom/band sidecars
    (where staleness only costs false-positive candidates), ghost gram
    rows largely RECONSTRUCT the erased string, so the sidecar purge is
    part of the erasure guarantee, not a tightness optimisation — it
    must survive a crash in any window. Sidecar purge targets are
    detected by probing the sidecars for the ids (never keyed off which
    master dirs the row removal happened to rewrite), so the journaled
    replay in :func:`recover_linkage_retraction` is unconditional and
    idempotent."""
    recover_linkage_retraction(spark, master_dir)
    fsutil.write_text_atomic(
        spark,
        _linkage_journal_path(master_dir),
        json.dumps({"ids": list(ids), "q": q}),
    )
    out = retract_ids(
        spark, master_dir, ids, id_col="id", drop_band_sidecar=False
    )
    out["gram_dirs_rewritten"] = _purge_linkage_sidecars(
        spark, master_dir, ids, q
    )
    out["link_rows_removed"] = _purge_linkage_links(spark, master_dir, ids)
    fsutil.delete(spark, _linkage_journal_path(master_dir), recursive=False)
    return out


def _setsim_journal_path(master_dir: str) -> str:
    return os.path.join(master_dir, "_retract_setsim_journal.json")


def _purge_setsim_sidecars(
    spark: SparkSession, master_dir: str, ids: list
) -> list[str]:
    from backend_big_data_spark.operators.setsimjoin import token_index
    from backend_big_data_spark.streaming.setsim_ingest import (
        _token_bucket_count,
    )
    from backend_big_data_spark.text.sampling import stable_hash

    n_buckets = _token_bucket_count(spark, master_dir)
    return _purge_index_sidecars(
        spark,
        master_dir,
        ids,
        index_name="tokens",
        freq_name="tokfreq",
        key_col="token",
        rebuild=token_index,
        bucket_col="__tb" if n_buckets else None,
        bucket_expr=(
            (stable_hash(F.col("token")) % n_buckets).cast("int")
            if n_buckets
            else None
        ),
    )


def recover_setsim_retraction(spark: SparkSession, master_dir: str) -> None:
    """Roll a crashed `retract_from_setsim_master` forward (idempotent;
    called on entry) — the setsim twin of
    :func:`recover_linkage_retraction`: the journal records the erasure
    request before any mutation and clears only after the token-sidecar
    and link purges complete (the token index reconstructs the erased
    record's word set, so its purge is part of the erasure
    guarantee)."""
    raw = fsutil.read_text(spark, _setsim_journal_path(master_dir))
    if raw is None:
        return
    meta = json.loads(raw)
    retract_ids(
        spark, master_dir, meta["ids"], id_col="id", drop_band_sidecar=False
    )
    _purge_setsim_sidecars(spark, master_dir, meta["ids"])
    _purge_linkage_links(spark, master_dir, meta["ids"])
    fsutil.delete(spark, _setsim_journal_path(master_dir), recursive=False)


def retract_from_setsim_master(
    spark: SparkSession, master_dir: str, ids: list
) -> dict:
    """Erase entities from a set-similarity linkage master
    (`streaming/setsim_ingest.py` layout): journaled row removal, every
    token-index and token-frequency sidecar directory still naming an
    erased id REWRITTEN from its surviving master rows, and link rows
    naming the erased master ids purged — the same erasure journal
    protocol as :func:`retract_from_linkage_master` (see its docstring
    for the crash-window argument)."""
    recover_setsim_retraction(spark, master_dir)
    fsutil.write_text_atomic(
        spark,
        _setsim_journal_path(master_dir),
        json.dumps({"ids": list(ids)}),
    )
    out = retract_ids(
        spark, master_dir, ids, id_col="id", drop_band_sidecar=False
    )
    out["token_dirs_rewritten"] = _purge_setsim_sidecars(
        spark, master_dir, ids
    )
    out["link_rows_removed"] = _purge_linkage_links(spark, master_dir, ids)
    fsutil.delete(spark, _setsim_journal_path(master_dir), recursive=False)
    return out


def _margin_journal_path(master_dir: str) -> str:
    return os.path.join(master_dir, "_retract_margin_journal.json")


def _purge_margin_sidecars(
    spark: SparkSession,
    master_dir: str,
    ids: list,
    dim: int,
    num_bits: int,
    num_tables: int,
) -> list[str]:
    from backend_big_data_spark.streaming.margin_ingest import bucket_index

    return _purge_index_sidecars(
        spark,
        master_dir,
        ids,
        index_name="buckets",
        freq_name="bucketfreq",  # the margin master keeps no frequency
        key_col="bucket",        # sidecar; the exists() gate skips it
        rebuild=lambda df: bucket_index(
            df, dim=dim, num_bits=num_bits, num_tables=num_tables
        ),
    )


def _margin_affected_dirs(spark: SparkSession, master_dir: str, ids: list) -> list[str]:
    """batch=N names whose BUCKET index OR master rows still name a
    retracted id — computed at request time (before any mutation) and
    journaled: the moment sidecars carry no ids of their own, so the
    id-keyed layers are the durable markers of which batches an erased
    entity touched. BOTH layers are probed because a master-only fold
    (the compaction crash window) can relocate a row's master dir away
    from its bucket dir: the bucket hit names the orphan moment dir to
    DELETE, the master hit names the fold-target moment dir to RECOUNT —
    together the surviving moment total stays exact (the recount folds
    the relocated survivors in)."""
    out: set[str] = set()
    if not ids:
        return []
    lits = [F.lit(i) for i in ids]
    for base, col in (
        (os.path.join(master_dir, "buckets"), "id"),
        (master_dir, "id"),
    ):
        names = sorted(fsutil.list_subdirs(spark, base, prefix="batch="))
        if not names:
            continue
        probe = spark.read.option("basePath", base).parquet(
            *[os.path.join(base, n) for n in names]
        )
        out.update(
            f"batch={r['batch']}"
            for r in probe.filter(F.col(col).isin(lits))
            .select("batch")
            .distinct()
            .collect()
        )
    return sorted(out)


def _purge_margin_moments(
    spark: SparkSession, master_dir: str, names: list, dim: int
) -> list[str]:
    """Re-derive (or drop) the covariance moment sidecar of every
    journaled affected batch. Moments are AGGREGATES — they embed the
    erased vector's products — so erasure must not leave them: a batch
    whose (already rewritten) master dir survives gets its moments
    RECOUNTED from the surviving rows (idempotent — recount of current
    state); an orphan moment dir (master folded away, the compaction
    crash window) is DELETED, breaking `read_master_moments` coverage so
    callers fall back to the full-scan covariance — result-invariant,
    never a leak."""
    from backend_big_data_spark.similarity.pca import embedding_moments

    touched: list[str] = []
    for name in names:
        mo_rel = os.path.join("moments", name)
        if not fsutil.exists(spark, os.path.join(master_dir, mo_rel)):
            continue
        master_path = os.path.join(master_dir, name)
        if fsutil.exists(spark, master_path):
            fresh = embedding_moments(spark.read.parquet(master_path), dim=dim)
            _journaled_replace(spark, master_dir, mo_rel, fresh)
        else:
            fsutil.delete(spark, os.path.join(master_dir, mo_rel), recursive=True)
        touched.append(name)
    return touched


def recover_margin_retraction(spark: SparkSession, master_dir: str) -> None:
    """Roll a crashed `retract_from_margin_master` forward (idempotent;
    called on entry). The journal records the erasure request AND the
    sink's LSH geometry before any mutation (the bucket rebuild needs
    dim/bits/tables, and a recovery must not depend on the caller
    re-supplying them correctly), and clears only after the bucket-
    sidecar and link purges complete — the bucket keys localize the
    erased record in LSH space, so their purge is part of the erasure
    guarantee."""
    raw = fsutil.read_text(spark, _margin_journal_path(master_dir))
    if raw is None:
        return
    meta = json.loads(raw)
    retract_ids(
        spark, master_dir, meta["ids"], id_col="id", drop_band_sidecar=False
    )
    _purge_margin_moments(spark, master_dir, meta.get("moment_dirs", []), meta["dim"])
    _purge_margin_sidecars(
        spark,
        master_dir,
        meta["ids"],
        meta["dim"],
        meta["num_bits"],
        meta["num_tables"],
    )
    _purge_linkage_links(spark, master_dir, meta["ids"])
    fsutil.delete(spark, _margin_journal_path(master_dir), recursive=False)


def retract_from_margin_master(
    spark: SparkSession,
    master_dir: str,
    ids: list,
    *,
    dim: int,
    num_bits: int = 6,
    num_tables: int = 6,
) -> dict:
    """Erase entities from an embedding linkage master
    (`streaming/margin_ingest.py` layout): journaled row removal, every
    bucket-sidecar directory still naming an erased id REWRITTEN from
    its surviving master rows, and link rows naming the erased master
    ids purged — the same erasure journal protocol as
    :func:`retract_from_linkage_master` (see its docstring for the
    crash-window argument). ``dim``/``num_bits``/``num_tables`` must
    match the sink's geometry (they are journaled for crash recovery)."""
    recover_margin_retraction(spark, master_dir)
    moment_dirs = _margin_affected_dirs(spark, master_dir, list(ids))
    fsutil.write_text_atomic(
        spark,
        _margin_journal_path(master_dir),
        json.dumps(
            {
                "ids": list(ids),
                "dim": dim,
                "num_bits": num_bits,
                "num_tables": num_tables,
                "moment_dirs": moment_dirs,
            }
        ),
    )
    out = retract_ids(
        spark, master_dir, ids, id_col="id", drop_band_sidecar=False
    )
    out["moment_dirs_rewritten"] = _purge_margin_moments(
        spark, master_dir, moment_dirs, dim
    )
    out["bucket_dirs_rewritten"] = _purge_margin_sidecars(
        spark, master_dir, ids, dim, num_bits, num_tables
    )
    out["link_rows_removed"] = _purge_linkage_links(spark, master_dir, ids)
    fsutil.delete(spark, _margin_journal_path(master_dir), recursive=False)
    return out


__all__ = [
    "recover_linkage_retraction",
    "recover_margin_retraction",
    "recover_retraction",
    "recover_setsim_retraction",
    "retract_from_embedding_corpus",
    "retract_from_image_corpus",
    "retract_from_ingest_corpus",
    "retract_from_linkage_master",
    "retract_from_margin_master",
    "retract_from_setsim_master",
    "retract_ids",
]
