"""Streaming quality-calibration monitor: stream == batch equivalence,
replay idempotency, auto-compaction semantics preservation."""

from __future__ import annotations

import pytest

from backend_big_data_spark.plans.round6c import (
    calibration_from_grid,
    score_grid,
)
from backend_big_data_spark.streaming.quality_monitor import (
    quality_monitor_sink,
    read_calibration_metrics,
    read_grid,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


BATCHES = [
    [(1, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10", "a"),
     (2, "b1 b2 b3 b4 b5 b1 b2 b3 b4 b5", "a")],
    [(3, "c1 c2 c1 c2 c1 c2 c1 c2 c1 c2", "b")],
    [(4, "d d d d d d d d d d", "b"),
     (5, "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10", "a")],
]


def test_stream_equals_batch_calibration(spark, tmp_path):
    g, m = str(tmp_path / "g"), str(tmp_path / "m")
    sink = quality_monitor_sink(g, m)
    for i, rows in enumerate(BATCHES):
        sink(_docs(spark, rows), i)
    all_docs = _docs(spark, [r for b in BATCHES for r in b])
    metrics = read_calibration_metrics(spark, m)
    last = metrics.filter("batch_id = 2").drop("batch_id", "batch")
    # the partition column lands last on read; compare as dicts
    want_rows = [
        r.asDict() for r in calibration_from_grid(score_grid(all_docs)).collect()
    ]
    got_rows = [r.asDict() for r in last.collect()]
    assert sorted(got_rows, key=lambda d: d["source"]) == sorted(
        want_rows, key=lambda d: d["source"]
    )


def test_replay_idempotent(spark, tmp_path):
    g, m = str(tmp_path / "g"), str(tmp_path / "m")
    sink = quality_monitor_sink(g, m)
    for i, rows in enumerate(BATCHES):
        sink(_docs(spark, rows), i)
    before = sorted(
        map(tuple, read_calibration_metrics(spark, m).collect())
    )
    sink(_docs(spark, BATCHES[2]), 2)  # at-least-once retry of batch 2
    after = sorted(map(tuple, read_calibration_metrics(spark, m).collect()))
    assert before == after
    grid = sorted(map(tuple, read_grid(spark, g).collect()))
    again = sorted(map(tuple, read_grid(spark, g).collect()))
    assert grid == again


@pytest.mark.slow
def test_auto_compaction_preserves_calibration(spark, tmp_path):
    import os

    g1, m1 = str(tmp_path / "g1"), str(tmp_path / "m1")
    g2, m2 = str(tmp_path / "g2"), str(tmp_path / "m2")
    auto = quality_monitor_sink(g1, m1, auto_compact_every=1)
    plain = quality_monitor_sink(g2, m2)
    for i, rows in enumerate(BATCHES):
        auto(_docs(spark, rows), i)
        plain(_docs(spark, rows), i)
    assert len([d for d in os.listdir(g1) if d.startswith("delta=")]) <= 2
    a = sorted(map(tuple, read_grid(spark, g1).collect()))
    b = sorted(map(tuple, read_grid(spark, g2).collect()))
    assert a == b
    ma = {r.batch_id for r in read_calibration_metrics(spark, m1).collect()}
    assert ma == {0, 1, 2}
