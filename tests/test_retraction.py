"""Corpus retraction (streaming/retraction.py): erasure through the
maintained-index ingest family.

The properties under test are the module's two contracts: (1) after
retraction, identical or near-duplicate content REINGESTS — no ghost
dedup against erased rows, even when sidecars are deliberately left
stale (correctness is not sidecar-dependent); (2) row removal is
journaled publish-before-destroy — every crash window rolls forward
idempotently and never loses surviving rows.
"""

from __future__ import annotations

import json
import os

from backend_big_data_spark.sources import fsutil
from backend_big_data_spark.streaming.ingest_dedup import (
    ingest_dedup_sink,
    load_corpus_bloom,
    read_corpus,
    read_corpus_bands,
)
from backend_big_data_spark.streaming.retraction import (
    _journal_path,
    recover_retraction,
    retract_from_ingest_corpus,
    retract_ids,
)
from backend_big_data_spark.text.dedup import release_dedup_caches


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "w x y z a b c d e f g h i j k l m n o p q r s t u v"


def _build(spark, corpus_dir):
    sink = ingest_dedup_sink(corpus_dir, threshold=0.5)
    sink(_docs(spark, [(1, BASE), (2, "totally unrelated tokens in here")]), 0)
    sink(
        _docs(spark, [(3, "another fully distinct document body zz qq")]), 1
    )
    release_dedup_caches()
    return sink


def _ids(spark, corpus_dir):
    return sorted(r.doc_id for r in read_corpus(spark, corpus_dir).collect())


def test_retract_then_reingest_is_admitted(spark, tmp_path):
    """The no-ghost-dedup contract: after erasing doc 1, both an exact
    twin and a near-dup of its text are ADMITTED by the next batch."""
    cdir = str(tmp_path / "corpus")
    sink = _build(spark, cdir)
    assert _ids(spark, cdir) == [1, 2, 3]

    out = retract_from_ingest_corpus(spark, cdir, [1])
    assert out["dirs_rewritten"] == ["batch=0"] and out["rows_removed"] == 1
    assert _ids(spark, cdir) == [2, 3]

    sink(_docs(spark, [(10, BASE), (11, BASE + " tail2")]), 2)
    release_dedup_caches()
    # 10 (exact twin of the erased text) admitted; 11 is a near-dup of 10
    # WITHIN the batch, so it dedups against 10 — not against a ghost
    assert _ids(spark, cdir) == [2, 3, 10]
    # bloom sidecar was rebuilt tight: covers exactly the current dirs
    words, covered = load_corpus_bloom(spark, cdir)
    assert covered == set(fsutil.list_subdirs(spark, cdir, prefix="batch="))


def test_stale_sidecars_stay_correct(spark, tmp_path):
    """Correctness is not sidecar-dependent: leave the Bloom AND band
    sidecars completely stale (raw retract_ids, no rebuild) — the exact
    twin of the erased doc must still be admitted."""
    cdir = str(tmp_path / "corpus")
    sink = _build(spark, cdir)
    out = retract_ids(
        spark, cdir, [1], id_col="doc_id", drop_band_sidecar=False
    )
    assert out["dirs_rewritten"] == ["batch=0"]
    # sidecars untouched: band rows for doc 1 still on disk
    bands = read_corpus_bands(spark, cdir)
    assert bands.filter("doc_id = 1").count() > 0

    sink(_docs(spark, [(10, BASE)]), 2)
    release_dedup_caches()
    assert 10 in _ids(spark, cdir)


def test_retract_is_idempotent_and_unknown_ids_noop(spark, tmp_path):
    cdir = str(tmp_path / "corpus")
    _build(spark, cdir)
    before = _ids(spark, cdir)
    out = retract_from_ingest_corpus(spark, cdir, [999])
    assert out == {"dirs_rewritten": [], "rows_removed": 0}
    assert _ids(spark, cdir) == before

    retract_from_ingest_corpus(spark, cdir, [2])
    again = retract_from_ingest_corpus(spark, cdir, [2])
    assert again["rows_removed"] == 0
    assert _ids(spark, cdir) == [1, 3]


def test_fully_retracted_dir_is_deleted(spark, tmp_path):
    """Retracting every row of a directory deletes the directory (an
    empty parquet dir would break the union readers)."""
    cdir = str(tmp_path / "corpus")
    _build(spark, cdir)
    retract_from_ingest_corpus(spark, cdir, [1, 2])
    assert fsutil.list_subdirs(spark, cdir, prefix="batch=") == ["batch=1"]
    assert _ids(spark, cdir) == [3]
    # its band sidecar went with it
    assert "batch=0" not in fsutil.list_subdirs(
        spark, os.path.join(cdir, "bands"), prefix="batch="
    )


def test_crash_before_journal_rolls_back(spark, tmp_path):
    """Temp dir written but no journal: the retraction never committed —
    recovery leaves the corpus exactly as it was (rollback)."""
    cdir = str(tmp_path / "corpus")
    _build(spark, cdir)
    surviving = spark.read.parquet(f"{cdir}/batch=0").filter("doc_id != 1")
    surviving.write.parquet(f"{cdir}/_retracting_batch_0")
    recover_retraction(spark, cdir)
    assert _ids(spark, cdir) == [1, 2, 3]


def test_crash_after_journal_rolls_forward(spark, tmp_path):
    """Journal committed with the temp dir complete: recovery publishes
    the rewrite, drops the recorded band dir, drops the journal —
    idempotently (run twice)."""
    cdir = str(tmp_path / "corpus")
    _build(spark, cdir)
    surviving = spark.read.parquet(f"{cdir}/batch=0").filter("doc_id != 1")
    surviving.write.parquet(f"{cdir}/_retracting_batch_0")
    fsutil.write_text_atomic(
        spark,
        _journal_path(cdir),
        json.dumps(
            {
                "dir": "batch=0",
                "tmp": "_retracting_batch_0",
                "bands": "bands/batch=0",
            }
        ),
    )
    recover_retraction(spark, cdir)
    recover_retraction(spark, cdir)
    assert _ids(spark, cdir) == [2, 3]
    assert fsutil.read_text(spark, _journal_path(cdir)) is None
    assert "batch=0" not in fsutil.list_subdirs(
        spark, os.path.join(cdir, "bands"), prefix="batch="
    )


def test_retraction_survives_fold_compaction(spark, tmp_path):
    """Folded directories are ordinary batch dirs to retraction: compact
    first, then erase a doc that lives inside the folded prefix."""
    from backend_big_data_spark.streaming.maintenance import (
        compact_ingest_corpus,
    )

    cdir = str(tmp_path / "corpus")
    sink = _build(spark, cdir)
    sink(_docs(spark, [(5, "yet another very different body of words")]), 2)
    release_dedup_caches()
    compact_ingest_corpus(spark, cdir, keep_latest=1)
    out = retract_from_ingest_corpus(spark, cdir, [2])
    assert out["rows_removed"] == 1
    assert _ids(spark, cdir) == [1, 3, 5]


def test_partitioned_layout_preserved(spark, tmp_path):
    """Retracting from a cluster-partitioned embedding corpus keeps the
    partitioned layout (the incremental probe's pruning depends on it)."""
    base = str(tmp_path / "emb")
    df = spark.createDataFrame(
        [(i, [float(i)], i % 2) for i in range(6)],
        "vec_id long, embedding array<double>, cluster int",
    )
    df.write.partitionBy("cluster").parquet(f"{base}/batch=0")
    out = retract_ids(
        spark, base, [2], id_col="vec_id", partition_by=("cluster",)
    )
    assert out["rows_removed"] == 1
    sub = fsutil.list_subdirs(spark, f"{base}/batch=0", prefix="cluster=")
    assert sorted(sub) == ["cluster=0", "cluster=1"]
    left = sorted(
        r.vec_id for r in spark.read.parquet(f"{base}/batch=0").collect()
    )
    assert left == [0, 1, 3, 4, 5]


# ---------------------------------------------------------------------------
# linkage-master retraction
# ---------------------------------------------------------------------------


def test_linkage_master_retraction(spark, tmp_path):
    """Erase master entity 1: its rows, gram-index rows, and link rows
    naming it all go; a dirty record of the erased entity then ADMITS as
    a new master (no ghost link), while surviving masters keep linking
    (the rewritten gram index stays complete)."""
    from backend_big_data_spark.streaming.linkage_ingest import (
        linkage_ingest_sink,
        read_master,
        read_master_grams,
    )
    from backend_big_data_spark.streaming.retraction import (
        retract_from_linkage_master,
    )

    mdir = str(tmp_path / "m")
    sink = linkage_ingest_sink(mdir)
    sink(
        spark.createDataFrame(
            [
                (1, "alpha consolidated mills"),
                (2, "beta containers corp"),
                (9, "gamma fabrication works"),
            ],
            "id long, s string",
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(10, "alpha consolidated millsx")], "id long, s string"
        ),
        1,
    )
    assert sorted(
        (r.dirty_id, r.master_id)
        for r in spark.read.parquet(f"{mdir}/links/batch=1").collect()
    ) == [(10, 1)]

    out = retract_from_linkage_master(spark, mdir, [1])
    assert out["rows_removed"] == 1 and out["link_rows_removed"] == 1
    assert sorted(r.id for r in read_master(spark, mdir).collect()) == [2, 9]
    assert {r.id for r in read_master_grams(spark, mdir).collect()} == {2, 9}
    # batch 1's links dir held only the purged row -> deleted outright
    assert "batch=1" not in fsutil.list_subdirs(
        spark, os.path.join(mdir, "links"), prefix="batch="
    )

    # dirty twin of the ERASED entity admits as novel; dirty variant of a
    # SURVIVING master still links (gram rewrite kept the index complete)
    sink(
        spark.createDataFrame(
            [(20, "alpha consolidated mills"), (21, "beta containers korp")],
            "id long, s string",
        ),
        2,
    )
    assert sorted(
        (r.dirty_id, r.master_id)
        for r in spark.read.parquet(f"{mdir}/links/batch=2").collect()
    ) == [(21, 2)]
    assert sorted(r.id for r in read_master(spark, mdir).collect()) == [2, 9, 20]
