"""Corrupt-record quarantine ingest and small-files compaction."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from backend_big_data_spark.sources.compaction import (
    compact_parquet_dataset,
    dataset_file_stats,
)
from backend_big_data_spark.sources.ingest import read_json_with_quarantine

_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
    ]
)


def test_quarantine_splits_good_and_bad_lines(spark, tmp_path):
    lines = [
        json.dumps({"id": 1, "name": "ok"}),
        '{"id": 2, "name": "unterminated',          # malformed JSON
        json.dumps({"id": 3, "name": "fine"}),
        "not json at all",
        '{"id": "notanint", "name": "bad type"}',   # schema-invalid value
    ]
    src = tmp_path / "raw.json"
    src.write_text("\n".join(lines))
    result = read_json_with_quarantine(spark, str(src), _SCHEMA)
    good, quarantine = result  # tuple-style unpacking supported
    try:
        assert {(r.id, r.name) for r in good.collect()} == {
            (1, "ok"),
            (3, "fine"),
        }
        bad = sorted(r.raw_record for r in quarantine.collect())
        # every rejected line is preserved VERBATIM for replay
        assert bad == sorted([lines[1], lines[3], lines[4]])
        assert good.columns == ["id", "name"]  # corrupt col not leaked
    finally:
        result.release()
    # release() unpersists the SHARED parent (unpersisting a derived frame
    # would be a no-op); the catalog must hold no cached entry for it now
    assert not result._parsed.storageLevel.useMemory


def test_quarantine_empty_on_clean_input(spark, tmp_path):
    src = tmp_path / "clean.json"
    src.write_text("\n".join(json.dumps({"id": i, "name": "x"}) for i in range(5)))
    result = read_json_with_quarantine(spark, str(src), _SCHEMA)
    try:
        assert result.good.count() == 5
        assert result.quarantine.count() == 0
    finally:
        result.release()


def test_compaction_reduces_files_and_preserves_data(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(src)
    n_before, bytes_before = dataset_file_stats(spark, src)
    assert n_before == 40

    stats = compact_parquet_dataset(spark, src, out, target_file_mb=128)
    assert stats["files_before"] == 40
    # tiny dataset, generous target → everything folds into one file
    assert stats["files_after"] == stats["target_files"] == 1

    back = spark.read.parquet(out)
    assert back.count() == 10_000
    assert set(back.columns) == {"id", "v"}
    assert back.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]


def test_file_stats_skip_hidden_directories(spark, tmp_path):
    src = tmp_path / "ds"
    spark.range(100).write.parquet(str(src))
    n_clean, bytes_clean = dataset_file_stats(spark, str(src))
    # an in-flight writer's staging tree: files nested under hidden dirs
    # must not count even though their basenames look like data files
    staging = src / "_temporary" / "0" / "task_0"
    staging.mkdir(parents=True)
    (staging / "part-00000.parquet").write_bytes(b"x" * 4096)
    hive = src / ".hive-staging_123"
    hive.mkdir()
    (hive / "part-00001.parquet").write_bytes(b"y" * 4096)
    assert dataset_file_stats(spark, str(src)) == (n_clean, bytes_clean)


def test_partitioned_compaction_preserves_layout(spark, tmp_path):
    src = str(tmp_path / "part_src")
    out = str(tmp_path / "part_out")
    df = (
        spark.range(8_000)
        .withColumn("lang", F.when(F.col("id") % 3 == 0, "en").otherwise("zh"))
        .withColumn("split", F.when(F.col("id") % 5 == 0, "val").otherwise("train"))
        .withColumn("v", F.col("id") * 7)
    )
    # fragment every partition: 8 files per (lang, split) directory
    df.repartition(8).write.partitionBy("lang", "split").parquet(src)
    n_before, _ = dataset_file_stats(spark, src)
    assert n_before == 4 * 8

    stats = compact_parquet_dataset(
        spark, src, out, target_file_mb=128, partition_by=["lang", "split"]
    )
    # (b) file count reduced: every tiny partition folds to one file
    assert stats["files_before"] == 32
    assert stats["files_after"] == stats["target_files"] == 4

    # (a) hive layout preserved — partition dirs intact, partition columns
    # NOT folded into the data files
    import pathlib

    dirs = {
        p.relative_to(out).as_posix()
        for p in pathlib.Path(out).glob("lang=*/split=*")
    }
    assert dirs == {
        "lang=en/split=train", "lang=en/split=val",
        "lang=zh/split=train", "lang=zh/split=val",
    }
    back = spark.read.parquet(out)
    one_file = next(iter(spark.read.parquet(out).inputFiles()))
    import pyarrow.parquet as pq

    assert set(pq.read_schema(one_file.removeprefix("file:")).names) == {"id", "v"}

    # data intact
    assert back.count() == 8_000
    assert (
        back.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]
    )

    # (c) a partition-pruned query touches only its own directory — same
    # pruning behavior as before compaction (one file read instead of 8)
    target_dir = pathlib.Path(out) / "lang=en" / "split=val"
    assert len(list(target_dir.glob("*.parquet"))) == 1
    pruned = back.filter((F.col("lang") == "en") & (F.col("split") == "val"))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
    src_pruned = spark.read.parquet(src).filter(
        (F.col("lang") == "en") & (F.col("split") == "val")
    )
    assert pruned.count() == src_pruned.count()


def test_partitioned_compaction_rejects_unknown_column(spark, tmp_path):
    src = str(tmp_path / "flat_src")
    spark.range(10).write.parquet(src)
    import pytest

    with pytest.raises(ValueError, match="partition_by columns"):
        compact_parquet_dataset(
            spark, src, str(tmp_path / "o"), partition_by=["nope"]
        )


def test_compaction_refuses_overwrite(spark, tmp_path):
    src = str(tmp_path / "a")
    out = str(tmp_path / "b")
    spark.range(10).write.parquet(src)
    compact_parquet_dataset(spark, src, out)
    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception)):
        # mode("error"): compaction never clobbers an existing publish target
        compact_parquet_dataset(spark, src, out)


def test_dynamic_partition_overwrite_touches_only_batch_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from backend_big_data_spark.sources.overwrite import overwrite_partitions

    path = str(tmp_path / "daily")
    base = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (2, "2024-01-02", 20.0), (3, "2024-01-03", 30.0)],
        "id long, day string, v double",
    )
    base.write.partitionBy("day").parquet(path)
    import pathlib

    before = {
        p.name: sorted(f.name for f in p.iterdir() if f.suffix == ".parquet")
        for p in pathlib.Path(path).iterdir()
        if p.name.startswith("day=")
    }

    # backfill day 2 only (new values, two rows)
    batch = spark.createDataFrame(
        [(20, "2024-01-02", 99.0), (21, "2024-01-02", 98.0)],
        "id long, day string, v double",
    )
    touched = overwrite_partitions(batch, path, ["day"])
    assert touched == [("2024-01-02",)]

    after = {
        p.name: sorted(f.name for f in p.iterdir() if f.suffix == ".parquet")
        for p in pathlib.Path(path).iterdir()
        if p.name.startswith("day=")
    }
    # untouched partitions keep their exact files; day 2 was replaced
    assert after["day=2024-01-01"] == before["day=2024-01-01"]
    assert after["day=2024-01-03"] == before["day=2024-01-03"]
    assert after["day=2024-01-02"] != before["day=2024-01-02"]

    # partition values read back type-inferred (string "2024-01-02" → DATE)
    got = {
        (str(r["day"]), r["id"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("2024-01-01", 1),
        ("2024-01-02", 20),
        ("2024-01-02", 21),
        ("2024-01-03", 3),
    }
    # conf restored (no leak into later writes)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC").lower()
        == "static"
    )


def test_read_evolving_parquet_merges_and_aligns(spark, tmp_path):
    from backend_big_data_spark.sources.ingest import read_evolving_parquet

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    )
    v1.write.parquet(path + "/batch=1")
    v2.write.parquet(path + "/batch=2")

    merged = read_evolving_parquet(spark, path)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5

    # aligned to an expected contract: missing col materializes as typed
    # null, extras dropped, order pinned
    aligned = read_evolving_parquet(
        spark, path, expected="id long, score double, lang string"
    )
    assert aligned.columns == ["id", "score", "lang"]
    arows = {r["id"]: r for r in aligned.collect()}
    assert arows[1]["lang"] is None and arows[1]["score"] is None
    assert arows[2]["score"] == 9.5


def test_partitioned_compaction_zero_padded_values_and_exact_targets(spark, tmp_path):
    """Regression: partition dirs whose STRING value re-infers differently
    ('month=01' reads back as int 1) used to miss the stats join and
    collapse to one file; matching now keys on the row's own source path.
    Also: bucket → file mapping is exact (no hash collisions merging two
    target files)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "padsrc")
    out = str(tmp_path / "padout")
    df = (
        spark.range(6_000)
        .withColumn("month", F.when(F.col("id") % 2 == 0, "01").otherwise("11"))
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    )
    df.repartition(6).write.partitionBy("month").parquet(src)
    n_before, _ = dataset_file_stats(spark, src)
    assert n_before == 12

    # ~tiny target so each partition needs MULTIPLE files — sizing must
    # reach the join (the old cast-string match nulled out and forced 1)
    stats = compact_parquet_dataset(
        spark, src, out, target_file_mb=1, partition_by=["month"]
    )
    import math
    import pathlib

    per_part = {}
    for d in pathlib.Path(out).glob("month=*"):
        per_part[d.name] = len(list(d.glob("*.parquet")))
    # both partitions exist, and file counts equal the computed targets
    # EXACTLY (range repartition on the global bucket ordinal)
    assert set(per_part) == {"month=01", "month=11"}
    assert sum(per_part.values()) == stats["files_after"] == stats["target_files"]
    assert all(v >= 1 for v in per_part.values())
    back = spark.read.parquet(out)
    assert back.count() == 6_000
    # month read back as int (type inference) — data equivalence via sums
    assert (
        back.agg(F.sum(F.crc32(F.col("payload")))).collect()[0][0]
        == df.agg(F.sum(F.crc32(F.col("payload")))).collect()[0][0]
    )
