"""Event-time session closing (streaming/session_close.py): in-data gap
closure, watermark-timeout closure, and field-level equivalence with the
batch sessionizer for every emitted session."""

from __future__ import annotations

import pytest

import datetime

from backend_big_data_spark.streaming.session_close import close_user_sessions

T0 = datetime.datetime(2024, 3, 1, 8, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _m(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


def test_event_time_session_close_matches_batch_sessions(spark, tmp_path):
    # batch 1: user 1 session A (2 events), user 2 lone session
    b1 = [(1, _m(0)), (1, _m(10)), (2, _m(5))]
    # batch 2: user 1 returns after a 110-minute gap -> session A closes
    # IN-DATA; watermark advances to _m(125)
    b2 = [(1, _m(120)), (1, _m(125))]
    # batch 3: a later user-3 event fires user 2's EVENT-TIME TIMEOUT
    # (watermark at start of batch 3 is _m(125) > user-2 last + 30m)
    b3 = [(3, _m(180))]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate((b1, b2, b3)):
        _ev(spark, rows).coalesce(1).write.parquet(str(in_dir / f"b{i}"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        close_user_sessions(stream, gap_minutes=30)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    closed = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.duration_sec)
        for r in spark.read.parquet(out_dir).collect()
    }
    # user 1 session A closes IN-DATA (the 110-minute gap arrives inside
    # batch 2); user 2's and user 1's second session close via EVENT-TIME
    # TIMEOUT (availableNow runs a final watermark-advancing batch, so
    # every session with last + gap < the final watermark _m(180) is
    # provably complete); user 3's session (last + gap = _m(210)) stays
    # OPEN — no watermark ever proves it finished
    assert closed == {
        (1, _m(0), _m(10), 2, 600),
        (1, _m(120), _m(125), 2, 300),
        (2, _m(5), _m(5), 1, 0),
    }

    # field-level equivalence: every emitted session is byte-identical to
    # the batch sessionizer's row for the same (user, start)
    from backend_big_data_spark.operators.timeseries import user_sessions

    all_events = _ev(spark, b1 + b2 + b3).withColumn(
        "event_id", __import__("pyspark.sql.functions", fromlist=["F"]).monotonically_increasing_id()
    )
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.duration_sec)
        for r in user_sessions(all_events, gap_minutes=30).collect()
    }
    assert closed <= batch  # closed sessions are a subset, field-for-field


@pytest.mark.slow
def test_out_of_order_event_lowers_session_start(spark, tmp_path):
    """An event that predates the stored session_start (possible whenever
    watermark delay > 0) must MERGE by lowering the start, so the emitted
    session matches the batch sessionizer field-for-field."""
    b1 = [(1, _m(10))]
    b2 = [(1, _m(5))]    # out-of-order: older than the stored start
    b3 = [(9, _m(120))]  # advances the watermark past user 1's last + gap
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate((b1, b2, b3)):
        _ev(spark, rows).coalesce(1).write.parquet(str(in_dir / f"b{i}"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    out_dir, ckpt = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    q = (
        close_user_sessions(stream, gap_minutes=30, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    closed = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.duration_sec)
        for r in spark.read.parquet(out_dir).collect()
    }
    # start lowered to _m(5), duration measured from the true first event;
    # user 9's session stays open (no watermark proves it complete)
    assert closed == {(1, _m(5), _m(10), 2, 300)}


@pytest.mark.slow
def test_early_event_beyond_gap_closes_own_session(spark, tmp_path):
    """A late event that predates the stored start by MORE than the gap
    (possible whenever watermark delay > gap) must NOT be folded into the
    stored session — the batch sessionizer would have closed a separate
    earlier session, and the stream must emit exactly that."""
    b1 = [(1, _m(100)), (4, _m(100))]
    # user 1: 100 minutes early (> 30m gap) -> its own closed session;
    # user 4: 20 minutes early (<= gap) -> merges, start lowered
    b2 = [(1, _m(0)), (4, _m(80))]
    b3 = [(9, _m(300))]  # watermark -> _m(180), closing both stored sessions
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate((b1, b2, b3)):
        _ev(spark, rows).coalesce(1).write.parquet(str(in_dir / f"b{i}"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    out_dir, ckpt = str(tmp_path / "out3"), str(tmp_path / "ckpt3")
    q = (
        close_user_sessions(stream, gap_minutes=30, watermark="120 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    closed = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.duration_sec)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert closed == {
        (1, _m(0), _m(0), 1, 0),        # early event: its own session
        (1, _m(100), _m(100), 1, 0),    # stored session, start NOT lowered
        (4, _m(80), _m(100), 2, 1200),  # within-gap early event: merged
    }

    # field-level equivalence with the batch sessionizer
    from pyspark.sql import functions as F

    from backend_big_data_spark.operators.timeseries import user_sessions

    all_events = _ev(spark, b1 + b2 + b3).withColumn(
        "event_id", F.monotonically_increasing_id()
    )
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.duration_sec)
        for r in user_sessions(all_events, gap_minutes=30).collect()
    }
    assert closed <= batch
