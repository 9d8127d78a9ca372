"""Streaming corpus-drift monitor (streaming/drift_monitor.py): streaming
== sequential-batch equivalence, log-structured count maintenance, and
the drift signal's direction (same-distribution ≈ small, shifted vocab =
large)."""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_big_data_spark.streaming.drift_monitor import (
    drift_monitor_stream,
    drift_score,
    read_corpus_counts,
    read_drift_metrics,
    token_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_drift_matches_sequential_and_maintains_counts(spark, tmp_path):
    b1 = [(1, "alpha beta gamma alpha"), (2, "beta gamma delta")]
    b2 = [(3, "alpha beta gamma beta"), (4, "gamma delta alpha")]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    df1, df2 = _docs(spark, b1), _docs(spark, b2)
    df1.coalesce(1).write.parquet(str(in_dir / "b1"))
    df2.coalesce(1).write.parquet(str(in_dir / "b2"))
    counts_dir = str(tmp_path / "counts")
    metrics_dir = str(tmp_path / "metrics")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    q = drift_monitor_stream(
        stream, counts_dir, metrics_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    metrics = {
        r.batch_id: r for r in read_drift_metrics(spark, metrics_dir).collect()
    }
    assert set(metrics) == {0, 1}

    # sequential replay: batch 1 vs its empty corpus, batch 2 vs batch 1
    empty = spark.createDataFrame([], "tok string, n long")
    m0 = drift_score(token_counts(df1), empty).collect()[0]
    m1 = drift_score(token_counts(df2), token_counts(df1)).collect()[0]
    assert metrics[0].drift_fp == m0.drift_fp
    assert metrics[1].drift_fp == m1.drift_fp
    assert metrics[1].tokens_corpus == 7  # batch-1 tokens only

    # maintained counts == counts over the concatenated corpus
    merged = {
        (r.tok, r.n)
        for r in read_corpus_counts(spark, counts_dir).collect()
    }
    want = {
        (r.tok, r.n)
        for r in token_counts(df1.unionByName(df2)).collect()
    }
    assert merged == want


def test_drift_signal_direction(spark):
    base = _docs(spark, [(1, "alpha beta gamma delta alpha beta")])
    same = _docs(spark, [(2, "alpha beta gamma delta beta alpha")])
    shifted = _docs(spark, [(3, "omega psi chi phi omega psi")])
    c = token_counts(base)
    d_same = drift_score(token_counts(same), c).collect()[0].drift_fp
    d_shift = drift_score(token_counts(shifted), c).collect()[0].drift_fp
    # same distribution ≈ 0 (token-for-token identical counts), disjoint
    # vocabulary strongly positive (every batch token unseen in corpus)
    assert abs(d_same) < abs(d_shift)
    assert d_shift > 0


def test_replayed_batch_is_idempotent(spark, tmp_path):
    from backend_big_data_spark.streaming.drift_monitor import drift_monitor_sink

    df = _docs(spark, [(1, "alpha beta"), (2, "beta gamma")])
    counts_dir = str(tmp_path / "c")
    metrics_dir = str(tmp_path / "m")
    sink = drift_monitor_sink(counts_dir, metrics_dir)
    sink(df, 0)
    first = {
        (r.tok, r.n) for r in read_corpus_counts(spark, counts_dir).collect()
    }
    m_first = read_drift_metrics(spark, metrics_dir).collect()[0].drift_fp
    sink(df, 0)  # replay of the SAME batch id
    assert {
        (r.tok, r.n) for r in read_corpus_counts(spark, counts_dir).collect()
    } == first
    assert read_drift_metrics(spark, metrics_dir).collect()[0].drift_fp == m_first
