"""Snapshot (time-travel) reads over the fold-compacted batch logs.

Contract under test: `read_corpus_snapshot(as_of)` equals the corpus
state right after batch ``as_of`` committed — before AND after folds —
and raises (never silently under-reads) once compaction has folded that
snapshot together with later batches. The fold-history sidecar is
maintained inside the journaled fold commit, so it must survive fold-of-
fold chains and re-run (`_finish_fold` idempotency).
"""

from __future__ import annotations

import json
import os

import pytest

from backend_big_data_spark.sources import fsutil
from backend_big_data_spark.streaming.ingest_dedup import read_corpus_snapshot
from backend_big_data_spark.streaming.maintenance import (
    _finish_fold,
    _journal_path,
    compact_ingest_corpus,
    fold_history,
    snapshot_dir_names,
)


def _write_batch(spark, corpus, i):
    spark.createDataFrame(
        [(i * 10 + j, f"doc {i}-{j}") for j in range(3)], "doc_id long, text string"
    ).write.parquet(os.path.join(corpus, f"batch={i}"))


def _ids(spark, corpus, as_of):
    df = read_corpus_snapshot(spark, corpus, as_of)
    return sorted(r.doc_id for r in df.collect()) if df is not None else []


def _expect(upto):
    return sorted(i * 10 + j for i in range(upto + 1) for j in range(3))


class TestSnapshotReads:
    def test_snapshots_before_any_fold(self, spark, tmp_path):
        corpus = str(tmp_path / "c")
        for i in range(4):
            _write_batch(spark, corpus, i)
        for k in range(4):
            assert _ids(spark, corpus, k) == _expect(k)
        assert _ids(spark, corpus, 99) == _expect(3)  # beyond head = head
        assert read_corpus_snapshot(spark, corpus, -1) is None

    def test_snapshots_across_folds(self, spark, tmp_path):
        corpus = str(tmp_path / "c")
        for i in range(5):
            _write_batch(spark, corpus, i)
        folded = compact_ingest_corpus(spark, corpus, keep_latest=2)
        assert folded == [0, 1, 2]
        assert fold_history(spark, corpus, "batch") == {0: [0, 1, 2]}
        # fold boundary and beyond stay exact
        for k in (2, 3, 4):
            assert _ids(spark, corpus, k) == _expect(k)
        # inside the folded range: the snapshot is gone — loud failure
        for k in (0, 1):
            with pytest.raises(ValueError, match="compacted"):
                read_corpus_snapshot(spark, corpus, k)

    def test_fold_of_folds_unions_coverage(self, spark, tmp_path):
        corpus = str(tmp_path / "c")
        for i in range(5):
            _write_batch(spark, corpus, i)
        compact_ingest_corpus(spark, corpus, keep_latest=2)  # 0..2 -> 0
        _write_batch(spark, corpus, 5)
        compact_ingest_corpus(spark, corpus, keep_latest=2)  # {0,3} -> 0
        assert fold_history(spark, corpus, "batch") == {0: [0, 1, 2, 3]}
        assert _ids(spark, corpus, 3) == _expect(3)
        assert _ids(spark, corpus, 4) == _expect(4)
        with pytest.raises(ValueError, match="compacted"):
            read_corpus_snapshot(spark, corpus, 2)

    def test_history_survives_finish_fold_rerun(self, spark, tmp_path):
        corpus = str(tmp_path / "c")
        for i in range(4):
            _write_batch(spark, corpus, i)
        compact_ingest_corpus(spark, corpus, keep_latest=1)  # 0..2 -> 0
        # replay the post-journal steps as a roll-forward crash would
        meta = {
            "prefix": "batch",
            "publish": 0,
            "tmp": "_compacting_batch_0",
            "delete": [0, 1, 2],
        }
        _finish_fold(spark, corpus, "batch", meta)
        assert fold_history(spark, corpus, "batch") == {0: [0, 1, 2]}
        assert _ids(spark, corpus, 2) == _expect(2)

    def test_pending_journal_is_visible_to_snapshots(self, spark, tmp_path):
        # post-publish crash window: journal present, tmp gone, sources
        # deleted — the published dir covers the fold even though the
        # history sidecar was not rewritten yet.
        corpus = str(tmp_path / "c")
        for i in range(4):
            _write_batch(spark, corpus, i)
        compact_ingest_corpus(spark, corpus, keep_latest=1)
        hist_path = os.path.join(corpus, "_fold_history_batch.json")
        fsutil.delete(spark, hist_path)  # pretend the rewrite never ran
        fsutil.write_text_atomic(
            spark,
            _journal_path(corpus, "batch"),
            json.dumps(
                {
                    "prefix": "batch",
                    "publish": 0,
                    "tmp": "_compacting_batch_0",
                    "delete": [0, 1, 2],
                }
            ),
        )
        assert snapshot_dir_names(spark, corpus, "batch", 2) == ["batch=0"]
        with pytest.raises(ValueError, match="compacted"):
            snapshot_dir_names(spark, corpus, "batch", 1)
        assert _ids(spark, corpus, 3) == _expect(3)
