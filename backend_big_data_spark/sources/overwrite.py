"""Dynamic partition overwrite — replace ONLY the partitions a batch
touches (the incremental-backfill write a partitioned warehouse table
needs: recompute day X, overwrite day X's directory, leave every other
day's files untouched).

Spark's static overwrite mode truncates the WHOLE table first; the
dynamic mode (``spark.sql.sources.partitionOverwriteMode=dynamic``)
scopes the overwrite to partitions present in the incoming frame. The
helper pins the conf per-write (and restores it) so callers can't leak
the mode into unrelated writes, and returns the set of partition values
it replaced — the audit line a backfill job logs.

Scale notes: the write shuffles nothing beyond what the caller's frame
already needs; untouched partitions are never listed, read, or
rewritten. Pair with ``sources/compaction.py`` for the file-count
hygiene of frequently-rewritten partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
) -> list[tuple]:
    """Overwrite exactly the ``partition_by`` partitions present in ``df``
    at ``path``; returns the replaced partition tuples (sorted)."""
    spark = df.sparkSession
    # persist before the audit collect: otherwise the caller's lineage
    # (possibly an expensive or nondeterministic pipeline) executes twice —
    # once for the partition listing, again for the write — and the audit
    # list could disagree with what the write actually replaced
    df = df.persist()
    try:
        touched = sorted(
            tuple(r) for r in df.select(*partition_by).distinct().collect()
        )
        prev = spark.conf.get(_MODE_KEY, None)
        spark.conf.set(_MODE_KEY, "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(_MODE_KEY)
            else:
                spark.conf.set(_MODE_KEY, prev)
    finally:
        df.unpersist()
    return touched


__all__ = ["overwrite_partitions"]
