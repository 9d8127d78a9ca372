"""Spark 4 Python DataSource (sources/pyds.py): schema, shard-partitioned
parallel read, and source-side filter pushdown semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_big_data_spark.sources.pyds import (
    EVENT_TYPES,
    CatalogShardReader,
    register,
)
from pyspark.sql.datasource import EqualTo, GreaterThan, InputPartition


def _read(spark, **options):
    register(spark)
    r = spark.read.format("sharded_catalog")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def test_full_scan_shape_and_determinism(spark):
    df = _read(spark, shards=4, rowsPerShard=50)
    assert df.columns == ["event_id", "shard", "event_type", "value"]
    assert df.count() == 200
    assert df.select("shard").distinct().count() == 4
    # reading twice yields identical content (deterministic source)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, _read(spark, shards=4, rowsPerShard=50).collect()))
    assert a == b


def test_filters_push_into_source_and_results_match(spark):
    df = _read(spark, shards=4, rowsPerShard=50)
    full = df.collect()
    # pushed: shard equality + event_type equality; residual: value filter
    q = df.filter(
        (F.col("shard") == 2) & (F.col("event_type") == "click") & (F.col("value") > 1.0)
    )
    expect = [
        t for t in full if t[1] == 2 and t[2] == "click" and t[3] > 1.0
    ]
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, expect))
    assert len(expect) > 0


def test_pushdown_consumes_supported_returns_rest():
    r = CatalogShardReader({"shards": "8", "rowsPerShard": "10"})
    residual = list(
        r.pushFilters(
            [
                EqualTo(("shard",), 3),
                EqualTo(("event_type",), "view"),
                GreaterThan(("value",), 5.0),
            ]
        )
    )
    # the two equalities are consumed; the range predicate is Spark's
    assert residual == [GreaterThan(("value",), 5.0)]
    assert r.shard_eq == 3 and r.type_eq == "view"
    # shard pushdown prunes the FETCH LIST, not just rows
    parts = r.partitions()
    assert [p.value for p in parts] == [3]
    rows = list(r.read(InputPartition(3)))
    assert rows and all(t[1] == 3 and t[2] == "view" for t in rows)


def test_unfiltered_reader_fetches_all_shards():
    r = CatalogShardReader({"shards": "3", "rowsPerShard": "5"})
    assert [p.value for p in r.partitions()] == [0, 1, 2]
    assert len(list(r.read(InputPartition(1)))) == 5
    types = {t[2] for t in r.read(InputPartition(0))}
    assert types <= set(EVENT_TYPES)


def test_streaming_read_drains_in_offset_batches(spark, tmp_path):
    register(spark)
    stream = (
        spark.readStream.format("sharded_catalog")
        .option("totalRows", 40)
        .option("rowsPerBatch", 10)
        .load()
    )
    # default micro-batch trigger: the simple stream reader prefetches one
    # batch per trigger, so poll until the bounded source is drained
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if spark.sql("SELECT COUNT(*) c FROM pyds_stream").collect()[0]["c"] >= 40:
            break
        time.sleep(1)
    q.stop()
    q.awaitTermination(30)
    rows = spark.sql("SELECT * FROM pyds_stream ORDER BY event_id").collect()
    # the stream drains exactly totalRows, each exactly once, and the rows
    # match the batch source's arithmetic for the same ids
    assert [r["event_id"] for r in rows] == list(range(40))
    batch = {t[0]: t for t in _read(spark, shards=1, rowsPerShard=40).collect()}
    for r in rows:
        b = batch[r["event_id"]]
        assert (r["event_type"], r["value"]) == (b[2], b[3])
