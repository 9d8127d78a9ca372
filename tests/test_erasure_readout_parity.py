"""Retract→readout parity (judge r10 "next" #6): after a journaled
erasure, every readout served from MAINTAINED state must hash-equal the
same readout fully recomputed from the surviving corpus — for the three
maintained families that gained state this cycle: the margin master's
covariance MOMENT sidecars, the drift monitor fed from those sidecars,
and the semdedup corpus' stored IVF list assignments. Each parity is
also asserted through a crash window (journal present, mutation partial,
recovery rolls forward) so the guarantee covers the failure path, not
just the happy one."""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from backend_big_data_spark.sources import fsutil
from backend_big_data_spark.streaming.margin_ingest import (
    margin_ingest_sink,
    read_margin_master,
    read_master_moments,
)
from backend_big_data_spark.streaming.retraction import (
    _journal_path,
    _margin_journal_path,
    recover_margin_retraction,
    retract_from_embedding_corpus,
    retract_from_margin_master,
    retract_ids,
)

DIM = 4


def _vec(i: int) -> list[float]:
    raw = [math.sin(i * 37 + d) for d in range(DIM)]
    nrm = math.sqrt(sum(x * x for x in raw))
    return [x / nrm for x in raw]


def _emb(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "id long, embedding array<double>"
    )


def _master(spark, tmp_path, name="m"):
    mdir = str(tmp_path / name)
    sink = margin_ingest_sink(
        mdir, dim=DIM, threshold=float("inf"), dedup_exact=False
    )
    sink(_emb(spark, range(0, 10)), 0)
    sink(_emb(spark, range(10, 20)), 1)
    return mdir


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _scan_stats(master):
    """Full-rescan per-dimension statistics of a master frame — the
    recompute twin of pca.dim_stats_from_moments."""
    return (
        master.select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "i", "x"
            )
        )
        .groupBy("i")
        .agg(
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@pytest.mark.slow
def test_post_erasure_covariance_moments_equal_recompute(spark, tmp_path):
    from backend_big_data_spark.similarity.pca import (
        covariance_from_moments,
        embedding_covariance,
    )

    mdir = _master(spark, tmp_path)
    retract_from_margin_master(
        spark, mdir, [3, 12], dim=DIM, num_bits=4, num_tables=4
    )
    moments = read_master_moments(spark, mdir)
    assert moments is not None, "coverage guard must hold after erasure"
    surviving = read_margin_master(spark, mdir)
    assert sorted(r.id for r in surviving.select("id").collect()) == sorted(
        set(range(20)) - {3, 12}
    )
    assert _rows(covariance_from_moments(moments)) == _rows(
        embedding_covariance(surviving, dim=DIM)
    )


@pytest.mark.slow
def test_post_erasure_drift_from_moments_equals_recompute(spark, tmp_path):
    """The embedding_drift_from_moments serving shape: reference master
    untouched, current master loses rows to erasure — the drift report
    from the maintained sidecars must equal the report from full
    rescans of the surviving corpora."""
    from backend_big_data_spark.similarity.pca import (
        dim_stats_from_moments,
        drift_readout,
    )

    ref_dir = _master(spark, tmp_path, "ref")
    cur_dir = _master(spark, tmp_path, "cur")
    retract_from_margin_master(
        spark, cur_dir, [0, 7, 15], dim=DIM, num_bits=4, num_tables=4
    )
    from_moments = drift_readout(
        dim_stats_from_moments(read_master_moments(spark, ref_dir)),
        dim_stats_from_moments(read_master_moments(spark, cur_dir)),
    )
    from_scan = drift_readout(
        _scan_stats(read_margin_master(spark, ref_dir)),
        _scan_stats(read_margin_master(spark, cur_dir)),
    )
    got, want = _rows(from_moments), _rows(from_scan)
    assert got == want and len(got) == DIM


@pytest.mark.slow
def test_drift_parity_through_crash_window(spark, tmp_path):
    """Crash matrix for the moment path: rows removed and journal
    written, but moment/bucket/link purges LOST — recovery must roll
    forward and restore moments == recompute; a second recovery run is
    a no-op (idempotent)."""
    from backend_big_data_spark.similarity.pca import (
        covariance_from_moments,
        embedding_covariance,
    )

    mdir = _master(spark, tmp_path)
    fsutil.write_text_atomic(
        spark,
        _margin_journal_path(mdir),
        json.dumps(
            {
                "ids": [5, 11],
                "dim": DIM,
                "num_bits": 4,
                "num_tables": 4,
                "moment_dirs": ["batch=0", "batch=1"],
            }
        ),
    )
    retract_ids(spark, mdir, [5, 11], id_col="id", drop_band_sidecar=False)
    # crash here: moments still carry the erased rows' mass
    recover_margin_retraction(spark, mdir)
    assert fsutil.read_text(spark, _margin_journal_path(mdir)) is None
    moments = read_master_moments(spark, mdir)
    assert moments is not None
    surviving = read_margin_master(spark, mdir)
    assert _rows(covariance_from_moments(moments)) == _rows(
        embedding_covariance(surviving, dim=DIM)
    )
    recover_margin_retraction(spark, mdir)  # idempotent no-op
    assert _rows(covariance_from_moments(read_master_moments(spark, mdir))) == _rows(
        embedding_covariance(read_margin_master(spark, mdir), dim=DIM)
    )


# ---------------------------------------------------------------------------
# Maintained IVF list index (semdedup corpus' stored cluster column)
# ---------------------------------------------------------------------------


def _centroids(spark):
    basis = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
    ]
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(basis)],
        "list_id int, centroid array<double>",
    )


def _ivf_corpus(spark, tmp_path):
    from backend_big_data_spark.streaming.semdedup_ingest import (
        semdedup_ingest_sink,
    )

    cents = _centroids(spark).select(
        F.col("list_id").alias("cluster"), "centroid"
    )
    cdir = str(tmp_path / "ivf")
    sink = semdedup_ingest_sink(cdir, cents, threshold=1.1)  # admit all
    sink(
        _emb(spark, range(0, 12)).select(
            F.col("id").alias("vec_id"), "embedding"
        ),
        0,
    )
    sink(
        _emb(spark, range(12, 24)).select(
            F.col("id").alias("vec_id"), "embedding"
        ),
        1,
    )
    return cdir


def _serve_maintained(spark, corpus, queries):
    from backend_big_data_spark.similarity.ivf_serve import ivf_maintained_topk

    assigned = corpus.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("vec"),
        F.col("cluster").cast("int").alias("list_id"),
    )
    return ivf_maintained_topk(
        assigned, queries, _centroids(spark), k=3, nprobe=2
    )


def _serve_recomputed(spark, corpus, queries):
    from backend_big_data_spark.similarity.ivf_serve import (
        assign_lists,
        ivf_maintained_topk,
    )

    fresh = assign_lists(
        corpus.select("vec_id", "embedding"), _centroids(spark)
    )
    return ivf_maintained_topk(fresh, queries, _centroids(spark), k=3, nprobe=2)


@pytest.mark.slow
def test_post_erasure_ivf_maintained_equals_recompute(spark, tmp_path):
    from backend_big_data_spark.streaming.semdedup_ingest import (
        read_embedding_corpus,
    )

    cdir = _ivf_corpus(spark, tmp_path)
    retract_from_embedding_corpus(spark, cdir, [2, 13, 20])
    corpus = read_embedding_corpus(spark, cdir)
    assert corpus.filter(F.col("vec_id").isin([2, 13, 20])).count() == 0
    queries = _emb(spark, [100, 101]).select(
        F.col("id").alias("vec_id"), "embedding"
    )
    got = _rows(_serve_maintained(spark, corpus, queries))
    want = _rows(_serve_recomputed(spark, corpus, queries))
    assert got == want and got, "maintained lists must serve the survivors"
    served_ids = {r[1] for r in got}
    assert not served_ids & {2, 13, 20}, "erased ids must never be served"


@pytest.mark.slow
def test_ivf_parity_through_crash_window(spark, tmp_path):
    """Crash matrix for the list index: the survivors tmp dir and the
    journal exist but the publish was lost — the next retraction call
    rolls it forward, and the served top-k equals the recompute."""
    from backend_big_data_spark.streaming.semdedup_ingest import (
        read_embedding_corpus,
    )

    cdir = _ivf_corpus(spark, tmp_path)
    surviving = spark.read.parquet(f"{cdir}/batch=0").filter("vec_id != 4")
    surviving.write.partitionBy("cluster").parquet(
        f"{cdir}/_retracting_batch_0"
    )
    fsutil.write_text_atomic(
        spark,
        _journal_path(cdir),
        json.dumps(
            {"dir": "batch=0", "tmp": "_retracting_batch_0", "bands": None}
        ),
    )
    retract_from_embedding_corpus(spark, cdir, [])  # rolls forward
    corpus = read_embedding_corpus(spark, cdir)
    assert corpus.filter(F.col("vec_id") == 4).count() == 0
    queries = _emb(spark, [200]).select(F.col("id").alias("vec_id"), "embedding")
    assert _rows(_serve_maintained(spark, corpus, queries)) == _rows(
        _serve_recomputed(spark, corpus, queries)
    )


# ---------------------------------------------------------------------------
# Drift-monitor count log (round 12): negate-delta erasure — the one
# maintained family that is exactly subtractable, so parity is asserted
# against a from-scratch recount of the surviving corpus with NO recount
# step in the erasure itself.
# ---------------------------------------------------------------------------

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _doc_frame(spark, ids):
    rows = [
        (i, " ".join(_WORDS[(i + j) % len(_WORDS)] for j in range(3 + i % 4)))
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _drift_log(spark, tmp_path, name="dc"):
    from backend_big_data_spark.streaming.drift_monitor import (
        drift_monitor_sink,
    )

    cdir = str(tmp_path / name)
    mdir = str(tmp_path / (name + "_metrics"))
    sink = drift_monitor_sink(cdir, mdir)
    for b in range(3):
        sink(_doc_frame(spark, range(b * 10, b * 10 + 10)), b)
    return cdir


def test_post_erasure_drift_counts_equal_recount(spark, tmp_path):
    """Maintained counts after a negate-delta erasure must be
    row-identical to re-tokenizing the surviving documents — including
    tokens zeroed out entirely — and every readout built on them
    (heavy hitters, drift score of a probe batch) must match the
    recompute bit-for-bit."""
    from backend_big_data_spark.streaming.drift_monitor import (
        drift_score,
        read_corpus_counts,
        retract_from_drift_counts,
        token_counts,
    )

    cdir = _drift_log(spark, tmp_path)
    erased_ids = [3, 11, 12, 25]
    res = retract_from_drift_counts(
        spark, cdir, _doc_frame(spark, erased_ids)
    )
    assert res["dir"] == "delta=-1" and res["tokens_negated"] > 0
    surviving = _doc_frame(
        spark, [i for i in range(30) if i not in erased_ids]
    )
    maintained = read_corpus_counts(spark, cdir)
    recount = token_counts(surviving)
    assert _rows(maintained) == _rows(recount)
    # heavy-hitters readout parity (the registered query's shape)
    top_m = _rows(maintained.orderBy(F.desc("n"), "tok").limit(3))
    top_r = _rows(recount.orderBy(F.desc("n"), "tok").limit(3))
    assert top_m == top_r
    # drift readout parity: a probe batch scores identically against
    # maintained state and against the recount
    probe = token_counts(_doc_frame(spark, range(100, 105)))
    assert _rows(drift_score(probe, maintained)) == _rows(
        drift_score(probe, recount)
    )


def test_drift_erasure_crash_window_rolls_forward(spark, tmp_path):
    """Journal present + negate-delta tmp on disk but publish lost: the
    next reader rolls the erasure forward and parity holds."""
    from backend_big_data_spark.streaming.drift_monitor import (
        read_corpus_counts,
        token_counts,
    )

    cdir = _drift_log(spark, tmp_path)
    erased = _doc_frame(spark, [0, 1])
    token_counts(erased).select("tok", (-F.col("n")).alias("n")).write.mode(
        "overwrite"
    ).parquet(f"{cdir}/_erasing_1")
    fsutil.write_text_atomic(
        spark,
        f"{cdir}/_erase_journal.json",
        json.dumps({"dir": "delta=-1", "tmp": "_erasing_1"}),
    )
    maintained = read_corpus_counts(spark, cdir)  # recovery on entry
    assert not fsutil.exists(spark, f"{cdir}/_erase_journal.json")
    recount = token_counts(_doc_frame(spark, range(2, 30)))
    assert _rows(maintained) == _rows(recount)


def test_drift_erasure_precommit_crash_rolls_back(spark, tmp_path):
    """Negate-delta tmp on disk but NO journal (crash before the commit
    point): the erasure never happened — readers must serve the
    pre-erasure counts and the orphan tmp must not leak into the merge."""
    from backend_big_data_spark.streaming.drift_monitor import (
        read_corpus_counts,
        token_counts,
    )

    cdir = _drift_log(spark, tmp_path)
    token_counts(_doc_frame(spark, [0, 1])).select(
        "tok", (-F.col("n")).alias("n")
    ).write.mode("overwrite").parquet(f"{cdir}/_erasing_1")
    maintained = read_corpus_counts(spark, cdir)
    assert _rows(maintained) == _rows(token_counts(_doc_frame(spark, range(30))))


def test_drift_erasure_survives_compaction(spark, tmp_path):
    """Folding the delta log AFTER an erasure (negate delta included in
    the fold) must preserve parity — the negate rows sum away inside the
    folded directory exactly as they did across directories."""
    from backend_big_data_spark.streaming.drift_monitor import (
        read_corpus_counts,
        retract_from_drift_counts,
        token_counts,
    )
    from backend_big_data_spark.streaming.maintenance import (
        compact_drift_counts,
    )

    cdir = _drift_log(spark, tmp_path)
    retract_from_drift_counts(spark, cdir, _doc_frame(spark, [5, 15]))
    folded = compact_drift_counts(spark, cdir, keep_latest=1)
    assert folded, "fold must have work: 3 batch deltas + 1 negate delta"
    maintained = read_corpus_counts(spark, cdir)
    recount = token_counts(
        _doc_frame(spark, [i for i in range(30) if i not in (5, 15)])
    )
    assert _rows(maintained) == _rows(recount)


def test_drift_over_erasure_raises(spark, tmp_path):
    """Erasing documents that were never ingested drives merged counts
    negative — the read path must raise, never serve silently skewed
    counts."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from backend_big_data_spark.streaming.drift_monitor import (
        read_corpus_counts,
        retract_from_drift_counts,
    )

    cdir = _drift_log(spark, tmp_path)
    never_ingested = spark.createDataFrame(
        [(999, "omega omega omega")], "doc_id long, text string"
    )
    retract_from_drift_counts(spark, cdir, never_ingested)
    with pytest.raises(SparkRuntimeException, match="DriftCountsNegative"):
        read_corpus_counts(spark, cdir).collect()
