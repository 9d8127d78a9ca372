"""Small-files compaction — the table-maintenance op every long-lived
parquet dataset needs.

Streaming sinks, frequent small appends, and over-parallel writers leave
datasets as thousands of KB-sized files; at 100 TB the scan then pays a
task/footer/open cost per FILE (driver scheduling included), which
dominates long before I/O does. Compaction rewrites the dataset into
size-targeted files. (Table formats — Iceberg/Delta — ship this as
``rewrite_data_files``/``OPTIMIZE``; plain parquet directories, which is
what this engine serves from, need it as an explicit op.)

Two shapes:

- **flat datasets**: one global round-robin repartition to
  ``ceil(bytes/target)`` files (``compact_parquet_dataset`` without
  ``partition_by``).
- **hive-partitioned datasets**: compaction must happen WITHIN each
  partition directory — a global repartition would fold the partition
  columns into the data files (destroying the layout and partition
  pruning) and shuffle 100% of bytes through one exchange. Pass
  ``partition_by`` and each partition is rewritten to its own
  size-targeted file count, layout preserved, so a partition-pruned query
  reads exactly the same bytes before and after.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Directory name Hive/Spark use for a null partition value.
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _iter_data_files(spark: SparkSession, path: str):
    """Yield (relative_component_tuple, byte_length) for every DATA file
    under ``path``. Files under hidden directories (an in-flight writer's
    ``_temporary/.../part-*``, ``.hive-staging*/``, ``.spark-staging*/``)
    are skipped by checking EVERY path component below the dataset root,
    not just the basename — counting them would skew file/byte stats and
    target sizing."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    root = fs.getFileStatus(p).getPath().toUri().getPath()
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        full = f.getPath().toUri().getPath()
        rel = full[len(root) :].lstrip("/")
        parts = tuple(rel.split("/"))
        if any(c.startswith("_") or c.startswith(".") for c in parts):
            continue  # _SUCCESS, checksums, staging/temporary dirs
        yield parts, f.getLen()


def dataset_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(file_count, total_bytes) of a parquet dataset, via the Hadoop
    FileSystem API — works on any supported filesystem, not just local."""
    n, total = 0, 0
    for _, size in _iter_data_files(spark, path):
        n += 1
        total += size
    return n, total


def partition_file_stats(
    spark: SparkSession, path: str, depth: int
) -> dict[tuple[str, ...], tuple[int, int]]:
    """Per-partition (file_count, total_bytes) for a hive-layout dataset
    with ``depth`` partition levels. Keys are the ``key=value`` directory
    component tuples, e.g. ``('lang=en', 'split=train')``."""
    stats: dict[tuple[str, ...], tuple[int, int]] = {}
    for parts, size in _iter_data_files(spark, path):
        key = parts[:depth]
        if len(parts) <= depth or not all("=" in c for c in key):
            raise ValueError(
                f"file {'/'.join(parts)} does not sit {depth} key=value "
                f"directories below the dataset root — wrong partition_by?"
            )
        n, b = stats.get(key, (0, 0))
        stats[key] = (n + 1, b + size)
    return stats


def compact_parquet_dataset(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 128,
    partition_by: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite ``in_path`` to ``out_path`` as size-targeted parquet files;
    returns before/after file stats.

    Sizing uses the dataset's ACTUAL on-disk bytes (compressed), so the
    output files land near the target as written, not at a guessed
    in-memory width. Writes to a NEW path: compacting in place would read
    and clobber the same files (callers swap directories after validating,
    the same publish pattern as any blind overwrite).

    Flat datasets (``partition_by=None``): one round-robin repartition to
    ``ceil(bytes/target)`` files — no keyed shuffle.

    Partitioned datasets: pass the partition scheme and each hive
    partition is compacted WITHIN itself — per-partition byte stats set a
    per-partition file target, rows shuffle keyed on (partition values,
    bucket) where the bucket count is that partition's own target, and the
    write goes through ``partitionBy`` so the directory layout (and with
    it partition pruning) is preserved. Partition columns never fold into
    data files. Scale: the shuffle is keyed, AQE coalesces the small
    partitions' buckets; a 100 TB table compacts partition-parallel
    instead of through one global round-robin exchange.
    """
    df: DataFrame = spark.read.parquet(in_path)
    target_bytes = target_file_mb * 1024 * 1024

    if not partition_by:
        n_before, bytes_total = dataset_file_stats(spark, in_path)
        n_target = max(1, math.ceil(bytes_total / target_bytes))
        df.repartition(n_target).write.mode("error").parquet(out_path)
        n_after, bytes_after = dataset_file_stats(spark, out_path)
        return {
            "files_before": n_before,
            "files_after": n_after,
            "bytes_before": bytes_total,
            "bytes_after": bytes_after,
            "target_files": n_target,
        }

    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(f"partition_by columns not in dataset: {missing}")
    per_part = partition_file_stats(spark, in_path, len(partition_by))
    n_before = sum(n for n, _ in per_part.values())
    bytes_total = sum(b for _, b in per_part.values())
    # per-partition file target, joined in as a tiny broadcast map keyed on
    # the hive directory components (null → __HIVE_DEFAULT_PARTITION__)
    targets = [
        (*(c.split("=", 1)[1] for c in key), max(1, math.ceil(b / target_bytes)))
        for key, (_, b) in sorted(per_part.items())
    ]
    n_target = sum(t[-1] for t in targets)
    tmap = spark.createDataFrame(
        targets,
        ", ".join(f"__pv{i} string" for i in range(len(partition_by)))
        + ", __nfiles int",
    )
    join_cond = [
        F.coalesce(F.col(c).cast("string"), F.lit(_HIVE_NULL))
        == F.col(f"__pv{i}")
        for i, c in enumerate(partition_by)
    ]
    # deterministic row → bucket assignment; buckets per partition = its own
    # file target. repartition on (partition cols, bucket) keys the shuffle
    # so every output file holds one partition's rows only.
    data_cols = [c for c in df.columns if c not in partition_by]
    bucket = F.pmod(
        F.abs(F.xxhash64(*[F.col(c) for c in data_cols])), F.col("__nfiles")
    )
    (
        df.join(F.broadcast(tmap), join_cond, "left")
        .withColumn("__bucket", F.coalesce(bucket, F.lit(0)))
        .repartition(n_target, *partition_by, F.col("__bucket"))
        .drop("__bucket", "__nfiles", *[f"__pv{i}" for i in range(len(partition_by))])
        .write.mode("error")
        .partitionBy(*partition_by)
        .parquet(out_path)
    )
    n_after, bytes_after = dataset_file_stats(spark, out_path)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_before": bytes_total,
        "bytes_after": bytes_after,
        "target_files": n_target,
    }
