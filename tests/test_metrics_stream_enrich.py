"""Observation-based inline quality metrics and stream-static enrichment."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from backend_big_data_spark.etl.metrics import assert_quality, observe_quality


def test_observe_quality_counts_nulls_inline(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None), (5, "e")],
        "id long, name string",
    )
    observed, obs = observe_quality(df, ["id", "name"])
    assert observed.count() == 5  # the action that materializes metrics
    got = obs.get
    assert got["rows"] == 5
    assert got["null_id"] == 0
    assert got["null_name"] == 2


def test_assert_quality_gates_on_null_fraction(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "y")], "id long, name string"
    )
    observed, obs = observe_quality(df, ["name"])
    observed.count()
    with pytest.raises(ValueError, match="quality gate failed"):
        assert_quality(obs, max_null_fraction=0.25, required_cols=["name"])

    observed2, obs2 = observe_quality(df, ["name"])
    observed2.count()
    fractions = assert_quality(obs2, max_null_fraction=0.6, required_cols=["name"])
    assert fractions == {"name": 0.5}


def test_stream_static_enrichment_join(spark, tmp_path):
    from backend_big_data_spark.streaming.events import enrich_stream_with_dim

    rows = [
        (1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-01-01 10:01:00", 8, "view", 2.0, "{}"),
        (3, "2024-01-01 10:02:00", 9, "click", 3.0, "{}"),  # no dim row
    ]
    schema = "event_id long, ts string, user_id long, event_type string, value double, props string"
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts")
    ).write.parquet(src)

    dim = spark.createDataFrame(
        [(7, "it", True), (8, "de", False)],
        "user_id long, country string, pro boolean",
    )
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(src)
    q = (
        enrich_stream_with_dim(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched_events")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        r.event_id: (r.country, r.pro)
        for r in spark.sql("SELECT * FROM enriched_events").collect()
    }
    # left join: unmatched stream rows survive with null enrichment
    assert got == {1: ("it", True), 2: ("de", False), 3: (None, None)}
