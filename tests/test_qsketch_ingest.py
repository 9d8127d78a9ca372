"""Streaming quantile-sketch sidecar (`streaming/qsketch_ingest.py`):
merged readout equals the single-pass sample, replay idempotence, and
the recount-based erasure path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from backend_big_data_spark.operators.qsketch import (
    bottomk_sample,
    sample_quantiles,
)
from backend_big_data_spark.streaming.qsketch_ingest import (
    qsketch_ingest_sink,
    qsketch_merged_readout,
    read_qsketch_sidecar,
    recount_qsketch_sidecar,
)

K = 16
PCTS = [25, 50, 75, 100]


def _df(spark, n):
    rows = [(i, float((i * 13) % 997)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v double")


def _sink_batches(spark, sdir, n, n_batches=3):
    sink = qsketch_ingest_sink(sdir, [], F.col("id"), F.col("v"), k=K)
    df = _df(spark, n)
    for b in range(n_batches):
        sink(df.filter(F.col("id") % n_batches == b), b)
    return df


def _est_map(df):
    return {r["pct"]: r["est"] for r in df.collect()}


def test_merged_readout_equals_single_pass(spark, tmp_path):
    sdir = str(tmp_path / "qs")
    df = _sink_batches(spark, sdir, 300)
    merged = qsketch_merged_readout(
        read_qsketch_sidecar(spark, sdir), [], PCTS, k=K
    )
    direct = sample_quantiles(
        bottomk_sample(df, [], F.col("id"), F.col("v"), k=K), [], PCTS
    )
    assert _est_map(merged) == _est_map(direct)


def test_replay_is_idempotent(spark, tmp_path):
    sdir = str(tmp_path / "qs")
    df = _sink_batches(spark, sdir, 300)
    before = _est_map(
        qsketch_merged_readout(read_qsketch_sidecar(spark, sdir), [], PCTS, k=K)
    )
    qsketch_ingest_sink(sdir, [], F.col("id"), F.col("v"), k=K)(
        df.filter(F.col("id") % 3 == 2), 2
    )
    after = _est_map(
        qsketch_merged_readout(read_qsketch_sidecar(spark, sdir), [], PCTS, k=K)
    )
    assert before == after


def test_recount_after_erasure_matches_surviving_corpus(spark, tmp_path):
    sdir = str(tmp_path / "qs")
    df = _sink_batches(spark, sdir, 300)
    erased = [5, 17, 200]
    surviving = df.filter(~F.col("id").isin(erased))
    rebuilt = recount_qsketch_sidecar(
        spark,
        sdir,
        {b: surviving.filter(F.col("id") % 3 == b) for b in range(3)},
        [],
        F.col("id"),
        F.col("v"),
        k=K,
    )
    assert rebuilt == ["batch=0", "batch=1", "batch=2"]
    merged = qsketch_merged_readout(
        read_qsketch_sidecar(spark, sdir), [], PCTS, k=K
    )
    direct = sample_quantiles(
        bottomk_sample(surviving, [], F.col("id"), F.col("v"), k=K), [], PCTS
    )
    assert _est_map(merged) == _est_map(direct)


def test_read_before_first_batch_is_none(spark, tmp_path):
    assert read_qsketch_sidecar(spark, str(tmp_path / "none")) is None
