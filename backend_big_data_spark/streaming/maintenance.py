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

Crash safety: the fold PUBLISHES before it DESTROYS. The folded union is
first written to a ``_compacting_{prefix}_N`` temp dir; only once that
copy is complete is a one-line journal (``_fold_journal_{prefix}.json``)
committed atomically, after which the publish + source deletion proceed.
Every state an interruption can leave behind is resolvable from the two
markers alone, and :func:`recover_fold` — called by the compactors
themselves and by every sidecar reader before listing — resolves it:

* temp dir present, **no journal** → the folded copy may be partial;
  roll BACK (delete the temp dir; all source dirs are still intact).
* **journal present** → the folded copy was complete when the journal
  committed; roll FORWARD (publish the temp dir over the oldest source
  id if not yet done, then delete the remaining source dirs and the
  journal). Re-running any suffix of these steps is idempotent.

Mutating recovery runs ONLY in the compactor (one compaction at a time
per directory — the same single-writer contract the ``batch=N`` layout
already assumes). Readers must stay correct too, but a reader that
deleted or renamed anything could destroy a LIVE compactor's
in-progress fold, so readers instead apply the non-mutating
:func:`fold_exclusions` mask: in every crash state the on-disk
directories plus the journal determine an exact read —

* no journal → read every ``{prefix}=N`` dir (a journal-less temp dir
  is invisible to readers and its sources are intact);
* journal + temp dir → the fold is unpublished; sources are
  authoritative, exclude nothing;
* journal, temp gone → the fold WAS published; exclude the journaled
  source dirs that were superseded but not yet deleted (otherwise their
  content double-counts).

The only reader-visible transient is racing a live compactor between
its publish and its last source delete: a reader may briefly see some
folded content twice (over-count / re-verify — the safe direction).
No interleaving ever makes folded content silently disappear.

Bloom sidecar: folding renames directories, not fingerprints — the
bitmap's bits are unchanged. The sidecar's covered-batch list is
rewritten to the post-fold directory set so `load_corpus_bloom` keeps
trusting it instead of triggering a full rebuild; a crash before that
rewrite leaves a covered-list mismatch, which `load_corpus_bloom`
already treats as "rebuild from the directories" — consistent, just
slower once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.sources import fsutil


def _batch_ids(spark: SparkSession, base: str, prefix: str) -> list[int]:
    return sorted(
        int(n.split("=", 1)[1])
        for n in fsutil.list_subdirs(spark, base, prefix=prefix + "=")
    )


def _journal_path(base: str, prefix: str) -> str:
    return os.path.join(base, f"_fold_journal_{prefix}.json")


def _history_path(base: str, prefix: str) -> str:
    return os.path.join(base, f"_fold_history_{prefix}.json")


def fold_history(spark: SparkSession, base: str, prefix: str) -> dict[int, list[int]]:
    """Which original batch ids each surviving folded ``{prefix}=N`` dir
    covers: ``{published_id: sorted original ids}``. Directories that
    were never folded are absent (they cover exactly themselves). The
    sidecar is maintained inside the fold's journaled commit protocol
    (see `_finish_fold`), so it is exactly as crash-consistent as the
    fold itself."""
    text = fsutil.read_text(spark, _history_path(base, prefix))
    if text is None:
        return {}
    return {int(k): v for k, v in json.loads(text)["folds"].items()}


def _finish_fold(spark: SparkSession, base: str, prefix: str, meta: dict) -> None:
    """Run (or re-run) the post-journal steps of a fold; idempotent.

    The journal's existence certifies the temp dir held the COMPLETE
    folded union when it was committed, so every step here is safe to
    repeat: publish the temp dir as ``{prefix}={publish}`` (superseding
    the source dir of the same id), then — only after the publish is
    visible — delete the remaining source dirs, then drop the journal.
    """
    tmp = os.path.join(base, meta["tmp"])
    target = os.path.join(base, f"{prefix}={meta['publish']}")
    if fsutil.exists(spark, tmp):
        # Superseded source dir of the same id: its rows are inside tmp.
        fsutil.delete(spark, target)
        fsutil.rename_checked(spark, tmp, target)
    if not fsutil.exists(spark, target):
        # Protocol violation (journal without tmp or published dir) —
        # refuse to destroy anything; leave the journal for inspection.
        raise RuntimeError(
            f"fold journal {_journal_path(base, prefix)} names published dir "
            f"{target} but neither it nor {tmp} exists"
        )
    # Publish is done (either just now or before the crash) — destroying
    # the other source dirs can no longer lose their content.
    for i in meta["delete"]:
        if i != meta["publish"]:
            fsutil.delete(spark, os.path.join(base, f"{prefix}={i}"))
    # Record lineage BEFORE dropping the journal: a crash in between
    # re-runs this whole function (idempotent — the history update is a
    # pure key replacement). Computed from the prior history, not the
    # meta, so journals written before this sidecar existed still fold
    # their constituents' coverage correctly.
    hist = fold_history(spark, base, prefix)
    covered = sorted({o for i in meta["delete"] for o in hist.get(i, [i])})
    for i in meta["delete"]:
        hist.pop(i, None)
    hist[meta["publish"]] = covered
    fsutil.write_text_atomic(
        spark,
        _history_path(base, prefix),
        json.dumps({"folds": {str(k): v for k, v in sorted(hist.items())}}),
    )
    fsutil.delete(spark, _journal_path(base, prefix))


def recover_fold(spark: SparkSession, base: str, prefix: str) -> str | None:
    """Detect and resolve an interrupted fold under ``base`` (MUTATING —
    compactor-side only; readers use :func:`fold_exclusions`).

    Returns ``"forward"`` (journal found → fold completed), ``"back"``
    (journal-less temp dir found → deleted, sources untouched), or
    ``None`` (nothing stranded). Called by the compactors before folding,
    so a crash mid-fold never silently removes folded batches from the
    corpus (the round-6 version deleted sources before publishing; a
    crash in between stranded the whole fold in an orphan
    ``_compacting_*`` dir nothing ever read). Safe to mutate here
    because at most one compaction runs per directory at a time.

    Cost: one small-file existence probe, plus a directory listing only
    when the probe misses — metadata scale, any Hadoop filesystem.
    """
    jtext = fsutil.read_text(spark, _journal_path(base, prefix))
    if jtext is not None:
        _finish_fold(spark, base, prefix, json.loads(jtext))
        return "forward"
    stranded = fsutil.list_subdirs(spark, base, prefix=f"_compacting_{prefix}_")
    for name in stranded:
        fsutil.delete(spark, os.path.join(base, name))
    return "back" if stranded else None


def fold_exclusions(spark: SparkSession, base: str, prefix: str) -> set[str]:
    """Directory names a reader must SKIP to stay exact when a fold was
    interrupted (non-mutating; see the module docstring's case table).

    Only the post-publish crash window needs masking: the journal lists
    the superseded source dirs whose content is already inside the
    published fold — reading them too would double-count. In every other
    state the mask is empty. Cost: one small-file probe per read, plus
    one existence check only when a journal is actually present.
    """
    jtext = fsutil.read_text(spark, _journal_path(base, prefix))
    if jtext is None:
        return set()
    meta = json.loads(jtext)
    if fsutil.exists(spark, os.path.join(base, meta["tmp"])):
        return set()  # unpublished: the source dirs are authoritative
    return {
        f"{prefix}={i}" for i in meta["delete"] if i != meta["publish"]
    }


def _effective_history(
    spark: SparkSession, base: str, prefix: str
) -> dict[int, list[int]]:
    """`fold_history` plus any journaled-but-unfinished fold: in the
    post-publish crash window the published dir already holds the folded
    union while the sidecar still describes the pre-fold state — apply
    the pending update in memory so snapshot reads stay exact in every
    crash state `fold_exclusions` can mask."""
    hist = fold_history(spark, base, prefix)
    jtext = fsutil.read_text(spark, _journal_path(base, prefix))
    if jtext is None:
        return hist
    meta = json.loads(jtext)
    if fsutil.exists(spark, os.path.join(base, meta["tmp"])):
        return hist  # unpublished: source dirs are authoritative
    covered = sorted({o for i in meta["delete"] for o in hist.get(i, [i])})
    for i in meta["delete"]:
        hist.pop(i, None)
    hist[meta["publish"]] = covered
    return hist


def snapshot_dir_names(
    spark: SparkSession, base: str, prefix: str, as_of: int
) -> list[str]:
    """Time travel: the ``{prefix}=N`` directory names whose union IS the
    state after batch ``as_of`` was committed. Metadata-scale (one
    listing + two small-file probes). Raises ``ValueError`` when
    compaction has folded batch ``as_of`` together with LATER batches —
    that snapshot no longer exists on disk (the same trade Delta-style
    VACUUM makes; size ``keep_latest`` to the snapshot horizon)."""
    hist = _effective_history(spark, base, prefix)
    skip = fold_exclusions(spark, base, prefix)
    out = []
    for name in fsutil.list_subdirs(spark, base, prefix=prefix + "="):
        if name in skip:
            continue
        i = int(name.split("=", 1)[1])
        covered = hist.get(i, [i])
        if covered[-1] <= as_of:
            out.append(name)
        elif covered[0] <= as_of:
            raise ValueError(
                f"snapshot {prefix}={as_of} was compacted away: {name} "
                f"covers {covered[0]}..{covered[-1]}; raise keep_latest "
                f"to retain the snapshot horizon"
            )
    return out


def _fold(
    spark: SparkSession,
    base: str,
    prefix: str,
    keep_latest: int,
    reducer=None,
    partition_by: tuple[str, ...] | None = None,
) -> list[int]:
    """Fold all but the ``keep_latest`` newest ``{prefix}=N`` dirs under
    ``base`` into the oldest folded id's directory. Returns folded ids
    (empty when there is nothing to do). ``reducer`` post-processes the
    unioned frame (the drift counts' keyed sum). ``partition_by`` lays
    the folded directory out by those columns (the BM25 term-bucketed
    fold) — the journal/recovery protocol is layout-agnostic (dir-level
    renames), so crash semantics are unchanged."""
    recover_fold(spark, base, prefix)
    ids = _batch_ids(spark, base, prefix)
    fold = ids[: len(ids) - keep_latest] if keep_latest else ids
    if len(fold) < 2:
        return []
    paths = [os.path.join(base, f"{prefix}={i}") for i in fold]
    # no basePath: the {prefix}=N component must NOT surface as a
    # partition column, or the rewrite would bake it into the data files
    # and collide with the readers' partition-discovered column.
    # Per-directory reads + unionByName: folded dirs may carry their own
    # partition layout (the BM25 term-bucketed fold) while newer dirs are
    # flat — a single multi-path read would reject the mixed structure.
    frames = [spark.read.parquet(p) for p in paths]
    df = frames[0]
    for f in frames[1:]:
        df = df.unionByName(f, allowMissingColumns=True)
    if prefix in df.columns:
        df = df.drop(prefix)
    if reducer is not None:
        df = reducer(df)
    tmp_name = f"_compacting_{prefix}_{fold[0]}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(base, tmp_name))
    # Journal AFTER the folded copy is fully on disk: its presence is the
    # commit point. Crash before this line → rollback (sources intact);
    # crash after → roll-forward (tmp is complete by construction).
    meta = {"prefix": prefix, "publish": fold[0], "tmp": tmp_name, "delete": fold}
    fsutil.write_text_atomic(spark, _journal_path(base, prefix), json.dumps(meta))
    _finish_fold(spark, base, prefix, meta)
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


__all__ = [
    "compact_drift_counts",
    "compact_ingest_corpus",
    "compact_quality_grid",
    "fold_exclusions",
    "fold_history",
    "recover_fold",
    "snapshot_dir_names",
]
