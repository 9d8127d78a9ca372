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
    # partition values stay the literal directory strings: type inference
    # would read month=01 back as int 1 and the compacted write would
    # re-render the directory as month=1 — a silently different layout
    _TI = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev_ti = spark.conf.get(_TI, None)
    spark.conf.set(_TI, "false")
    try:
        df: DataFrame = spark.read.parquet(in_path)
    finally:
        if prev_ti is None:
            spark.conf.unset(_TI)
        else:
            spark.conf.set(_TI, prev_ti)
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
    depth = len(partition_by)
    per_part = partition_file_stats(spark, in_path, depth)
    n_before = sum(n for n, _ in per_part.values())
    bytes_total = sum(b for _, b in per_part.values())
    # Per-partition (cumulative file offset, file target), keyed by the
    # partition DIRECTORY string exactly as the FS listing produced it.
    # Rows are matched to their stats via input_file_name() — the row's own
    # source path — never by casting partition VALUES back to strings,
    # which silently misses whenever hive escaping or type inference
    # changes the rendering (month=01 reads back as int 1 ≠ '01').
    targets = []
    offset = 0
    for key, (_, b) in sorted(per_part.items()):
        nfiles = max(1, math.ceil(b / target_bytes))
        targets.append(("/".join(key), offset, nfiles))
        offset += nfiles
    n_target = offset
    tmap = spark.createDataFrame(
        targets, "__pdir string, __offset int, __nfiles int"
    )
    # row → partition dir: decode the file URI (input_file_name URI-escapes
    # special characters), strip the scheme and the dataset root, keep the
    # first `depth` components. Root resolved through the same Hadoop Path
    # normalization partition_file_stats used.
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(in_path)
    root = p.getFileSystem(conf).getFileStatus(p).getPath().toUri().getPath()
    row_dir = F.concat_ws(
        "/", F.slice(F.split(F.col("__rel"), "/"), 1, depth)
    )
    # deterministic row → GLOBAL bucket ordinal (partition offset + local
    # bucket): every output file has its own bucket value, and the range
    # repartition maps distinct ordinals to distinct shuffle partitions —
    # hash-partitioning on (partition, bucket) let unrelated buckets
    # collide into double-size files
    data_cols = [c for c in df.columns if c not in partition_by]
    local_bucket = F.pmod(
        F.abs(F.xxhash64(*[F.col(c) for c in data_cols])), F.col("__nfiles")
    )
    gbucket = F.when(
        F.col("__nfiles").isNull(),
        F.raise_error(
            F.concat(F.lit("partition stats missed source dir: "), F.col("__rel"))
        ).cast("int"),
    ).otherwise(F.col("__offset") + local_bucket)
    (
        df.withColumn(
            "__rel",
            F.regexp_replace(
                F.url_decode(F.input_file_name()),
                "^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?",
                "",
            ).substr(F.lit(len(root) + 2), F.lit(1 << 20)),
        )
        .withColumn("__pdir", row_dir)
        .join(F.broadcast(tmap), "__pdir", "left")
        .withColumn("__gbucket", gbucket)
        .repartitionByRange(n_target, F.col("__gbucket"))
        .drop("__rel", "__pdir", "__gbucket", "__offset", "__nfiles")
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
