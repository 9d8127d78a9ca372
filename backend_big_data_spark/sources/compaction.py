"""Small-files compaction — the table-maintenance op every long-lived
parquet dataset needs.

Streaming sinks, frequent small appends, and over-parallel writers leave
datasets as thousands of KB-sized files; at 100 TB the scan then pays a
task/footer/open cost per FILE (driver scheduling included), which
dominates long before I/O does. Compaction rewrites the dataset into
size-targeted files. (Table formats — Iceberg/Delta — ship this as
``rewrite_data_files``/``OPTIMIZE``; plain parquet directories, which is
what this engine serves from, need it as an explicit op.)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dataset_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(file_count, total_bytes) of a parquet dataset, via the Hadoop
    FileSystem API — works on any supported filesystem, not just local."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    n, total = 0, 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums, hidden marker files
        n += 1
        total += f.getLen()
    return n, total


def compact_parquet_dataset(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 128,
) -> dict[str, int]:
    """Rewrite ``in_path`` to ``out_path`` as ``ceil(bytes / target)``
    size-targeted parquet files; returns before/after file stats.

    Sizing uses the dataset's ACTUAL on-disk bytes (compressed), so the
    output files land near the target as written, not at a guessed
    in-memory width. The rewrite is one round-robin repartition — no keyed
    shuffle — and writes to a NEW path: compacting in place would read and
    clobber the same files (callers swap directories after validating, the
    same publish pattern as any blind overwrite).
    """
    n_before, bytes_total = dataset_file_stats(spark, in_path)
    df: DataFrame = spark.read.parquet(in_path)
    n_target = max(1, math.ceil(bytes_total / (target_file_mb * 1024 * 1024)))
    df.repartition(n_target).write.mode("error").parquet(out_path)
    n_after, bytes_after = dataset_file_stats(spark, out_path)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes_before": bytes_total,
        "bytes_after": bytes_after,
        "target_files": n_target,
    }
