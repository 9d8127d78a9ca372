"""Deterministic content/key-hash sampling (north-star additive scope):
the reproducible sampling machinery a training-data pipeline needs.

Everything here derives from a STABLE hash of a key (not ``rand()``), so:
- the same row lands in the same sample/split on every run, on any engine,
  at any parallelism — no seed-plumbing, no order dependence;
- samples are consistent across tables sharing the key (join a 1% sample
  of docs with its embeddings by hashing the same id);
- adding data never reshuffles existing assignments (hash ranges are
  stable), which is what makes incremental dataset construction sane.

Hash: first 15 hex chars of md5 (60 bits, positive in any signed type) —
portable to any SQL engine for oracle checks; swap in ``xxhash64`` for
pure-Spark deployments via ``hash_fn``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stable_hash(key: Column, hash_fn: str = "md5") -> Column:
    """Deterministic non-negative 60-bit hash of a key column."""
    if hash_fn == "md5":
        return F.conv(
            F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
        ).cast("long")
    if hash_fn == "xxhash64":
        return F.abs(F.xxhash64(key.cast("string")))
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def hash_sample(
    df: DataFrame, key: Column, fraction_pct: int, hash_fn: str = "md5"
) -> DataFrame:
    """Keep rows whose key hashes into the first ``fraction_pct`` of 100
    buckets — systematic (deterministic) sampling. Unlike ``df.sample``,
    re-runs and other engines select the IDENTICAL rows."""
    if not 0 < fraction_pct <= 100:
        raise ValueError("fraction_pct in (0, 100]")
    return df.filter(stable_hash(key, hash_fn) % 100 < fraction_pct)


def hash_split(
    df: DataFrame,
    key: Column,
    val_pct: int = 10,
    test_pct: int = 10,
    hash_fn: str = "md5",
    split_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash range: bucket < val_pct → val,
    < val_pct+test_pct → test, else train. Stable under data growth —
    an existing row never changes split when new rows arrive."""
    bucket = stable_hash(key, hash_fn) % 100
    return df.withColumn(
        split_col,
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def deterministic_shuffle(
    df: DataFrame, key: Column, hash_fn: str = "md5", order_col: str = "__shuffle_key"
) -> DataFrame:
    """Reproducible global shuffle: order by the key hash (tie-break on
    the key itself). The standard way to fix a training-data order that is
    decorrelated from ingestion order yet identical on every run."""
    return (
        df.withColumn(order_col, stable_hash(key, hash_fn))
        .orderBy(order_col, key)
        .drop(order_col)
    )
