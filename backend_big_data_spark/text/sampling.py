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


def stratified_hash_sample(
    df: DataFrame,
    key: Column,
    group_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 100,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-group systematic sampling — the training-mix rebalancer: keep
    ``rates_pct[group]``% of each listed group (``default_pct``% of the
    rest), selected by stable key hash. The standard move for deflating a
    dominant language/source in a corpus while keeping selection
    reproducible and incremental (same guarantees as :func:`hash_sample`,
    per group). Unlike ``df.sampleBy``, re-runs and other engines select
    IDENTICAL rows.

    Scale: a single codegen'd filter over the scan — no shuffle, no
    per-group passes.
    """
    for g, pct in rates_pct.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"rate for {g!r} must be in [0, 100]")
    bucket = stable_hash(key, hash_fn) % 100
    thr: Column | None = None
    for g in sorted(rates_pct):
        cond = F.col(group_col) == g
        thr = (
            F.when(cond, F.lit(rates_pct[g]))
            if thr is None
            else thr.when(cond, F.lit(rates_pct[g]))
        )
    threshold = F.lit(default_pct) if thr is None else thr.otherwise(F.lit(default_pct))
    return df.filter(bucket < threshold)


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    ctx_len: int,
    key: Column,
    shard_col: str | None = None,
    hash_fn: str = "md5",
    seq_col: str = "seq_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing assignment (LLM pretraining
    layout): documents are laid out in the deterministic-shuffle order
    (key hash, then key) and the concatenated token stream is cut every
    ``ctx_len`` tokens; a document's ``seq_col`` is the sequence its FIRST
    token lands in (docs may straddle a boundary — that is the standard
    packing semantic, no padding waste).

    ``seq_id = floor(tokens_before_this_doc / ctx_len)`` via a keyed
    running sum over a ROWS frame (a RANGE frame would merge hash ties).

    Scale: packing is inherently sequential, so it runs per ``shard_col``
    partition (e.g. language, or a hash shard) — one window shuffle per
    shard, each shard's stream independent. A global pack (shard_col=None)
    funnels through ONE partition and is only for tests/small corpora.
    """
    from pyspark.sql import Window

    h = stable_hash(key, hash_fn)
    part = Window.partitionBy(shard_col) if shard_col else Window.partitionBy()
    w = part.orderBy(h, key).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(F.col(token_count_col)).over(w)
    return df.withColumn(
        seq_col,
        F.floor((cum - F.col(token_count_col)) / float(ctx_len)).cast("bigint"),
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
