"""Structured Streaming tests: the streaming plans produce the same results
as their batch twins (availableNow → memory sink), watermarked dedup works,
session windows close on gaps."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from backend_big_data_spark.streaming.events import (
    dedup_within_watermark,
    hourly_counts_batch,
    read_events_stream,
    session_windows,
    tumbling_counts,
)
from tests.conftest import SF_SMALL


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_equals_batch(spark):
    from backend_big_data_spark.sources.catalog import load_table

    stream = read_events_stream(spark, SF_SMALL)
    q = _run_stream(tumbling_counts(stream), "tumbling_t")
    got = {
        (r.window_start, r.event_type): (r.event_count, r.avg_value)
        for r in spark.sql("SELECT * FROM tumbling_t").collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.event_count, r.avg_value)
        for r in hourly_counts_batch(load_table(spark, SF_SMALL, "events")).collect()
    }
    q.stop()
    assert got == batch and len(batch) > 0


def test_dedup_within_watermark(spark):
    with tempfile.TemporaryDirectory() as d:
        events = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:01", 1, "click", 1.0, "{}"),
                (1, "2024-01-01 00:00:02", 1, "click", 1.0, "{}"),  # dup id
                (2, "2024-01-01 00:10:00", 2, "view", 2.0, "{}"),
            ],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        events.write.parquet(f"{d}/ev")
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
            )
            .parquet(f"{d}/ev")
        )
        deduped = dedup_within_watermark(stream, "1 hour")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT event_id FROM dedup_t").collect()
        q.stop()
        assert sorted(r.event_id for r in rows) == [1, 2]


def test_session_windows_close_on_gap(spark):
    with tempfile.TemporaryDirectory() as d:
        rows = [
            (1, "2024-01-01 00:00:00"),
            (2, "2024-01-01 00:05:00"),   # same session (gap < 10m)
            (3, "2024-01-01 01:00:00"),   # new session
        ]
        df = spark.createDataFrame(
            [(i, ts, 7, "click", 1.0, "{}") for i, ts in rows],
            "event_id long, ts string, user_id long, event_type string, value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        df.write.parquet(f"{d}/ev")
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
            )
            .parquet(f"{d}/ev")
        )
        q = (
            session_windows(stream, gap="10 minutes")
            .writeStream.format("memory")
            .queryName("sess_t")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.event_count,) for r in spark.sql("SELECT * FROM sess_t").collect()
        )
        q.stop()
        assert got == [(1,), (2,)]
