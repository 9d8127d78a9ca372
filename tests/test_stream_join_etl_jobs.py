"""Tests: stream-stream join equals its batch twin; janitor safety;
end-to-end ETL job."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from backend_big_data_spark.etl.enrich import DeterministicFakeFetcher
from backend_big_data_spark.etl.janitor import clean_spark_scratch
from backend_big_data_spark.etl.jobs import clean_and_enrich_job
from backend_big_data_spark.streaming.events import (
    purchases_with_recent_signup_stream,
)


def test_stream_stream_join_equals_batch(spark, tmp_path):
    rows = [
        (1, "2024-01-01 10:00:00", 7, "signup", 0.0, "{}"),
        (2, "2024-01-01 10:30:00", 7, "purchase", 5.0, "{}"),   # joins 1
        (3, "2024-01-01 12:00:00", 7, "purchase", 5.0, "{}"),   # too late
        (4, "2024-01-01 09:00:00", 8, "signup", 0.0, "{}"),
        (5, "2024-01-01 09:30:00", 9, "purchase", 1.0, "{}"),   # no signup
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "ev")
    df.write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(src)
    q = (
        purchases_with_recent_signup_stream(stream, within="1 hour")
        .writeStream.format("memory")
        .queryName("ssj_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.purchase_id, r.signup_id)
        for r in spark.sql("SELECT * FROM ssj_t").collect()
    }
    q.stop()
    assert got == {(2, 1)}


def test_janitor_dry_run_and_patterns(tmp_path):
    for d in ("blockmgr-abc", "spark-tmp1", "keepme", "blockmgr-xyz"):
        os.makedirs(tmp_path / d)
    (tmp_path / "blockmgr-file").write_text("a file, not a dir")
    listed = clean_spark_scratch(str(tmp_path), dry_run=True)
    assert sorted(os.path.basename(p) for p in listed) == [
        "blockmgr-abc", "blockmgr-xyz", "spark-tmp1",
    ]
    assert (tmp_path / "blockmgr-abc").exists()     # dry run removed nothing
    removed = clean_spark_scratch(str(tmp_path), dry_run=False)
    assert len(removed) == 3
    assert not (tmp_path / "blockmgr-abc").exists()
    assert (tmp_path / "keepme").exists()


def test_clean_and_enrich_job_end_to_end(spark, tmp_path):
    raw = [
        {"id": "a", "datePosted": "Jan 5, 2021 10:00:00 AM",
         "dateTaken": "Jan 1, 0001 12:00:00 AM",
         "owner": {"id": "u1", "username": "x"}},
        {"id": "a", "datePosted": "Jan 5, 2021 10:00:00 AM",
         "dateTaken": "Jan 1, 0001 12:00:00 AM",
         "owner": {"id": "u1", "username": "x"}},              # duplicate
        {"id": "b", "datePosted": "Mar 2, 1999 09:00:00 AM",
         "dateTaken": "Feb 1, 2021 08:00:00 AM",
         "owner": {"id": "u2", "username": "y"}},              # pre-2000
    ]
    src = tmp_path / "raw.json"
    src.write_text("\n".join(json.dumps(r) for r in raw))
    out = str(tmp_path / "out")
    result = clean_and_enrich_job(
        spark, str(src), out, DeterministicFakeFetcher
    )
    back = spark.read.parquet(out)
    assert back.count() == result.count() == 1
    # the job's own post-write verification re-read these; assert the same
    # contract here so a weakened job check fails the suite
    assert set(back.columns) == set(result.columns)
    row = back.collect()[0]
    fake = DeterministicFakeFetcher()("a")
    assert row.id == "a"
    assert row.comments == fake[0]                  # enriched
    assert row.camera_info.make == fake[3]
    assert row.dateTaken is None                    # sentinel nulled


def test_streaming_upsert_merge_semantics(spark, tmp_path):
    from backend_big_data_spark.streaming.upsert import upsert_stream_to_parquet

    src = str(tmp_path / "src")
    out = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, ts timestamp"

    def push(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = upsert_stream_to_parquet(stream, out, ckpt, key="k", order_col="ts")
        q.awaitTermination(120)
        q.stop()

    import datetime as dt

    t = lambda s: dt.datetime.fromisoformat(s)
    # batch 1: two keys, plus an in-batch older duplicate of k=1 that must lose
    push([
        (1, "one-old", t("2024-01-01T00:00:00")),
        (1, "one", t("2024-01-01T01:00:00")),
        (2, "two", t("2024-01-01T00:30:00")),
    ])
    got = {r.k: r.v for r in spark.read.parquet(out).collect()}
    assert got == {1: "one", 2: "two"}
    # batch 2 (checkpoint resume): update k=2, insert k=3
    push([
        (2, "two-v2", t("2024-01-02T00:00:00")),
        (3, "three", t("2024-01-02T00:00:00")),
    ])
    rows = spark.read.parquet(out).collect()
    assert {r.k: r.v for r in rows} == {1: "one", 2: "two-v2", 3: "three"}
    assert len(rows) == 3  # exactly one row per key
