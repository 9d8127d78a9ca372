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

import pytest

import json
import os

from pyspark.sql import functions as F

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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_crash_before_journal_rolls_back(spark, tmp_path):
    """Temp dir written but no journal: the retraction never committed —
    recovery leaves the corpus exactly as it was (rollback)."""
    cdir = str(tmp_path / "corpus")
    _build(spark, cdir)
    surviving = spark.read.parquet(f"{cdir}/batch=0").filter("doc_id != 1")
    surviving.write.parquet(f"{cdir}/_retracting_batch_0")
    recover_retraction(spark, cdir)
    assert _ids(spark, cdir) == [1, 2, 3]


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def _linkage_master(spark, tmp_path):
    from backend_big_data_spark.streaming.linkage_ingest import (
        linkage_ingest_sink,
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
    return mdir


def _gramfreq_consistent(spark, mdir):
    """The maintained gramfreq totals equal the gram index's aggregate."""
    from backend_big_data_spark.streaming.linkage_ingest import (
        read_master_gram_freq,
        read_master_grams,
    )

    gf = read_master_gram_freq(spark, mdir)
    assert gf is not None, "gramfreq sidecar lost coverage"
    maintained = {
        (r.gram, r.cnt)
        for r in gf.groupBy("gram").agg(F.sum("cnt").alias("cnt")).collect()
    }
    on_the_fly = {
        (r.gram, r["count"])
        for r in read_master_grams(spark, mdir).groupBy("gram").count().collect()
    }
    assert maintained == on_the_fly


@pytest.mark.slow
def test_linkage_retraction_rewrites_gramfreq(spark, tmp_path):
    from backend_big_data_spark.streaming.retraction import (
        retract_from_linkage_master,
    )

    mdir = _linkage_master(spark, tmp_path)
    out = retract_from_linkage_master(spark, mdir, [1])
    assert out["gram_dirs_rewritten"] == ["batch=0"]
    _gramfreq_consistent(spark, mdir)


@pytest.mark.slow
def test_linkage_crash_between_row_removal_and_sidecar_purge(spark, tmp_path):
    """The advisor's crash window: master rows already removed (inner
    journal cleared) but the gram/gramfreq/link purges not yet run. The
    linkage journal must replay them — ghost gram rows largely
    reconstruct the erased string, so they are an ERASURE violation, not
    a tightness issue."""
    from backend_big_data_spark.streaming.linkage_ingest import (
        read_master_grams,
    )
    from backend_big_data_spark.streaming.retraction import (
        _linkage_journal_path,
        recover_linkage_retraction,
        retract_ids,
    )

    mdir = _linkage_master(spark, tmp_path)
    # simulate the crash state: journal committed, row removal done,
    # nothing else — exactly what a kill between the two steps leaves
    fsutil.write_text_atomic(
        spark, _linkage_journal_path(mdir), json.dumps({"ids": [1], "q": 3})
    )
    retract_ids(spark, mdir, [1], id_col="id", drop_band_sidecar=False)
    assert 1 in {r.id for r in read_master_grams(spark, mdir).collect()}, (
        "precondition: ghost gram rows present"
    )

    recover_linkage_retraction(spark, mdir)

    assert {r.id for r in read_master_grams(spark, mdir).collect()} == {2, 9}
    _gramfreq_consistent(spark, mdir)
    assert "batch=1" not in fsutil.list_subdirs(
        spark, os.path.join(mdir, "links"), prefix="batch="
    ), "link purge must replay too"
    assert fsutil.read_text(spark, _linkage_journal_path(mdir)) is None
    # replay is idempotent
    recover_linkage_retraction(spark, mdir)
    assert {r.id for r in read_master_grams(spark, mdir).collect()} == {2, 9}


@pytest.mark.slow
def test_linkage_sink_still_probes_after_crash_recovery(spark, tmp_path):
    """After a recovered retraction the maintained-freq probe path keeps
    working (coverage intact) and links stay correct."""
    from backend_big_data_spark.streaming.linkage_ingest import (
        linkage_ingest_sink,
        read_master_gram_freq,
    )
    from backend_big_data_spark.streaming.retraction import (
        _linkage_journal_path,
        recover_linkage_retraction,
        retract_ids,
    )

    mdir = _linkage_master(spark, tmp_path)
    fsutil.write_text_atomic(
        spark, _linkage_journal_path(mdir), json.dumps({"ids": [1], "q": 3})
    )
    retract_ids(spark, mdir, [1], id_col="id", drop_band_sidecar=False)
    recover_linkage_retraction(spark, mdir)
    assert read_master_gram_freq(spark, mdir) is not None
    linkage_ingest_sink(mdir)(
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


def test_retract_preserves_null_id_rows(spark, tmp_path):
    """A NULL id can never be named by a retraction request; the rewrite
    must keep such rows (``~isin`` alone silently drops them)."""
    base = str(tmp_path / "c")
    spark.createDataFrame(
        [(1, "keep"), (None, "null-id survivor"), (2, "erase")],
        "doc_id long, text string",
    ).write.parquet(f"{base}/batch=0")
    out = retract_ids(spark, base, [2])
    assert out["rows_removed"] == 1
    rows = sorted(
        ((r.doc_id, r.text) for r in spark.read.parquet(f"{base}/batch=0").collect()),
        key=str,
    )
    assert (None, "null-id survivor") in rows and (1, "keep") in rows


# ---------------------------------------------------------------------------
# embedding-corpus and image-corpus retraction (family parity)
# ---------------------------------------------------------------------------


def _emb_corpus(spark, tmp_path):
    from backend_big_data_spark.streaming.semdedup_ingest import (
        semdedup_ingest_sink,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cluster int, centroid array<double>",
    )
    cdir = str(tmp_path / "emb")
    sink = semdedup_ingest_sink(cdir, cents, threshold=0.8)
    sink(
        spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        ),
        0,
    )
    return cdir, sink


def test_embedding_retraction_no_ghost_and_layout(spark, tmp_path):
    """Erase vector 1, then re-ingest an exact twin: it must be ADMITTED
    (no ghost cosine match against the erased row), and the rewritten
    directory keeps its cluster-partitioned layout."""
    from backend_big_data_spark.streaming.retraction import (
        retract_from_embedding_corpus,
    )
    from backend_big_data_spark.streaming.semdedup_ingest import (
        read_embedding_corpus,
    )

    cdir, sink = _emb_corpus(spark, tmp_path)
    out = retract_from_embedding_corpus(spark, cdir, [1])
    assert out["rows_removed"] == 1
    assert sorted(
        r.vec_id for r in read_embedding_corpus(spark, cdir).collect()
    ) == [3]
    sub = fsutil.list_subdirs(spark, f"{cdir}/batch=0", prefix="cluster=")
    assert sub == ["cluster=1"]

    sink(
        spark.createDataFrame(
            [(10, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
        ),
        1,
    )
    got = {
        (r.vec_id, r.cluster)
        for r in read_embedding_corpus(spark, cdir).collect()
    }
    assert got == {(3, 1), (10, 0)}


def test_embedding_retraction_crash_rolls_forward(spark, tmp_path):
    from backend_big_data_spark.streaming.retraction import (
        retract_from_embedding_corpus,
    )
    from backend_big_data_spark.streaming.semdedup_ingest import (
        read_embedding_corpus,
    )

    cdir, _ = _emb_corpus(spark, tmp_path)
    surviving = spark.read.parquet(f"{cdir}/batch=0").filter("vec_id != 1")
    surviving.write.partitionBy("cluster").parquet(
        f"{cdir}/_retracting_batch_0"
    )
    fsutil.write_text_atomic(
        spark,
        _journal_path(cdir),
        json.dumps({"dir": "batch=0", "tmp": "_retracting_batch_0", "bands": None}),
    )
    # next wrapper call rolls the journal forward before its own work
    retract_from_embedding_corpus(spark, cdir, [])
    assert sorted(
        r.vec_id for r in read_embedding_corpus(spark, cdir).collect()
    ) == [3]


def _image_corpus(spark, tmp_path):
    import numpy as np

    from backend_big_data_spark.multimodal.png import encode_png
    from backend_big_data_spark.streaming.image_ingest import image_ingest_sink

    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, size=(24, 32, 3), dtype=np.uint8)
    b = rng.randint(0, 256, size=(24, 32, 3), dtype=np.uint8)
    cdir = str(tmp_path / "imgs")
    sink = image_ingest_sink(cdir)
    sink(
        spark.createDataFrame(
            [
                (1, bytearray(encode_png(a))),
                (3, bytearray(encode_png(b))),
                (4, bytearray(b"garbage bytes")),  # quarantined
            ],
            "media_id long, payload binary",
        ),
        0,
    )
    return cdir, sink, a


def test_image_retraction_no_ghost_and_quarantine_purge(spark, tmp_path):
    """Erase image 1 (and quarantined id 4): rows AND maintained dhash go
    together, the quarantine record goes too, and a re-ingested twin of
    the erased image is ADMITTED (no ghost near-dup hit)."""
    from backend_big_data_spark.multimodal.png import encode_png
    from backend_big_data_spark.streaming.image_ingest import read_image_corpus
    from backend_big_data_spark.streaming.retraction import (
        retract_from_image_corpus,
    )

    cdir, sink, a = _image_corpus(spark, tmp_path)
    out = retract_from_image_corpus(spark, cdir, [1, 4])
    assert out["rows_removed"] == 1
    assert out["quarantine_rows_removed"] == 1
    assert sorted(
        r.media_id for r in read_image_corpus(spark, cdir).collect()
    ) == [3]
    assert "batch=0" not in fsutil.list_subdirs(
        spark, os.path.join(cdir, "quarantine"), prefix="batch="
    )

    sink(
        spark.createDataFrame(
            [(10, bytearray(encode_png(a)))], "media_id long, payload binary"
        ),
        1,
    )
    assert sorted(
        r.media_id for r in read_image_corpus(spark, cdir).collect()
    ) == [3, 10]


def test_image_retraction_crash_rolls_forward(spark, tmp_path):
    from backend_big_data_spark.streaming.image_ingest import read_image_corpus
    from backend_big_data_spark.streaming.retraction import (
        retract_from_image_corpus,
    )

    cdir, _, _ = _image_corpus(spark, tmp_path)
    surviving = spark.read.parquet(f"{cdir}/batch=0").filter("media_id != 1")
    surviving.write.parquet(f"{cdir}/_retracting_batch_0")
    fsutil.write_text_atomic(
        spark,
        _journal_path(cdir),
        json.dumps({"dir": "batch=0", "tmp": "_retracting_batch_0", "bands": None}),
    )
    retract_from_image_corpus(spark, cdir, [])
    assert sorted(
        r.media_id for r in read_image_corpus(spark, cdir).collect()
    ) == [3]
