"""Streaming token-set entity resolution — the SET-SIMILARITY member of
the ingest family (`ingest_dedup` = shingle near-dup, `semdedup_ingest`
= embeddings, `image_ingest` = binary media, `linkage_ingest` =
edit-distance linkage, this = whole-word Jaccard linkage: word order
and count don't matter, whole-word substitutions do).

Per micro-batch of dirty (id, s) records arriving against a master
entity table at ``master_dir``:

1. LINK: every batch record Jaccard-joins the admitted master at
   τ = t_num/t_den via the one-sided prefix probe
   (`operators/setsimjoin.token_jaccard_join_indexed`): the batch's
   rarest-token prefixes are broadcast against the master's MAINTAINED
   token index — candidate generation never re-tokenizes or re-ranks
   the master (the exact verify re-derives the candidates' token arrays
   from master strings in one map-side pass), and the prefix ranks by
   the MAINTAINED per-token counts (``tokfreq`` sidecar), so no probe
   ever aggregates the full index (the linkage sink's gramfreq
   discipline). Links land in ``links/batch=N``.
2. ADMIT: records that matched nothing become new master entities
   (after within-batch exact dedup on the string — min id survives,
   deterministic). Their rows append as ``batch=N``, their distinct
   tokens as ``tokens/batch=N``, and their per-token counts as
   ``tokfreq/batch=N`` — admission maintains the probe state AND its
   ranking statistics, nothing is rebuilt.

Batch-internal NEAR-dups admit as separate entities (the documented
streaming-ER compromise shared with `linkage_ingest`; they link to each
other's rows from the next batch on). Exact duplicates ARE resolved.

Replay safety mirrors the family: ``exclude_batch`` on every master
read plus per-batch directory overwrite make at-least-once retries
rewrite identical links and identical admissions.

Scale: per-batch cost = one tokenize over the BATCH, a broadcast prefix
probe scanning the token index map-side (no index shuffle), and a
candidate-bounded verify keyed on master id. The master fold-compacts
like every family sidecar (`compact_setsim_master`), and erasure runs
through `streaming/retraction.retract_from_setsim_master` (the token
sidecar largely reconstructs the erased record's word set, so its purge
is part of the erasure guarantee — same journal protocol as the
linkage master's gram index).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.operators.setsimjoin import (
    token_index,
    token_jaccard_join_indexed,
)
from backend_big_data_spark.sources import fsutil
from backend_big_data_spark.streaming.linkage_ingest import (
    _covered_names,
    _read_dirs,
)

DEFAULT_T_NUM = 3
DEFAULT_T_DEN = 5


def read_setsim_master(
    spark: SparkSession, master_dir: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """Admitted master entities (id, s) so far, or None."""
    return _read_dirs(spark, master_dir, exclude_batch)


def read_master_tokens(
    spark: SparkSession, master_dir: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """The maintained (id, token) index over the admitted master."""
    return _read_dirs(spark, os.path.join(master_dir, "tokens"), exclude_batch)


def read_master_token_freq(
    spark: SparkSession, master_dir: str, exclude_batch: int | None = None
) -> DataFrame | None:
    """Per-token totals (token, cnt) from the maintained ``tokfreq``
    sidecar (admissions are id-disjoint across batches, so per-batch
    counts sum to the full index's frequencies exactly). None when the
    sidecar does not cover every token directory — callers then fall
    back to batch-local ranking (result-invariant either way)."""
    tf_base = os.path.join(master_dir, "tokfreq")
    names = _covered_names(spark, tf_base, exclude_batch)
    if not names or names != _covered_names(
        spark, os.path.join(master_dir, "tokens"), exclude_batch
    ):
        return None
    return spark.read.option("basePath", tf_base).parquet(
        *[os.path.join(tf_base, n) for n in sorted(names)]
    )


def setsim_link_batch(
    batch: DataFrame,
    master: DataFrame | None,
    master_tokens: DataFrame | None,
    t_num: int = DEFAULT_T_NUM,
    t_den: int = DEFAULT_T_DEN,
    master_token_freq: DataFrame | None = None,
) -> DataFrame:
    """(dirty_id, master_id, inter_cnt, union_cnt) for every batch
    record within Jaccard τ of an admitted master entity (empty frame
    on an empty master)."""
    if master is None or master_tokens is None:
        return batch.sparkSession.createDataFrame(
            [],
            "dirty_id long, master_id long, inter_cnt long, union_cnt long",
        )
    return token_jaccard_join_indexed(
        batch,
        master_tokens,
        master,
        t_num=t_num,
        t_den=t_den,
        index_freq=master_token_freq,
    ).select(
        F.col("probe_id").alias("dirty_id"),
        "master_id",
        "inter_cnt",
        "union_cnt",
    )


def setsim_ingest_sink(
    master_dir: str,
    t_num: int = DEFAULT_T_NUM,
    t_den: int = DEFAULT_T_DEN,
    link_mode: str = "all",
    k: int = 1,
):
    """``foreachBatch`` function maintaining the master table, its token
    index, its token-frequency sidecar, and the per-batch link results
    under ``master_dir``.

    ``link_mode`` selects the recorded-link contract:

    * ``"all"`` (default) — every (batch record, master) pair within τ,
      the candidate-pair shape (rows: dirty_id, master_id, inter_cnt,
      union_cnt).
    * ``"topk"`` — production entity resolution's best-match contract: a
      batch record linking to MANY masters emits only its ``k`` best
      matches, deterministically (exact-fraction Jaccard order via the
      `setsimjoin._topk_rank_key` 2^32-scaled integer key, ties on
      master id ASC — identical semantics to
      `setsimjoin.token_jaccard_topk`). Output is ≤ |batch|·k rows per
      batch no matter how much duplicate mass the master holds (rows:
      dirty_id, master_id, rank, inter_cnt, union_cnt).

    ADMISSION is identical in both modes (a record is novel iff it
    matched nothing at τ — top-k only prunes which links are RECORDED),
    so the maintained master/index/tokfreq state is mode-independent:
    stream≡batch equivalence holds per mode, and switching modes between
    batches never forks the master."""
    if link_mode not in ("all", "topk"):
        raise ValueError(f"link_mode must be 'all' or 'topk', got {link_mode!r}")

    def apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        b = batch.select("id", "s").persist()
        master = read_setsim_master(spark, master_dir, exclude_batch=batch_id)
        toks = read_master_tokens(spark, master_dir, exclude_batch=batch_id)
        tfreq = read_master_token_freq(
            spark, master_dir, exclude_batch=batch_id
        )
        links = setsim_link_batch(
            b, master, toks, t_num=t_num, t_den=t_den, master_token_freq=tfreq
        ).persist()
        out_links = links
        if link_mode == "topk":
            from pyspark.sql import Window

            from backend_big_data_spark.operators.setsimjoin import (
                _topk_rank_key,
            )

            w = Window.partitionBy("dirty_id").orderBy(
                F.desc("__key"), F.asc("master_id")
            )
            out_links = (
                links.withColumn("__key", _topk_rank_key())
                .withColumn("rank", F.row_number().over(w).cast("int"))
                .where(F.col("rank") <= k)
                .select(
                    "dirty_id", "master_id", "rank", "inter_cnt", "union_cnt"
                )
            )
        novel = (
            b.join(
                links.select(F.col("dirty_id").alias("id")).distinct(),
                "id",
                "anti",
            )
            .groupBy("s")
            .agg(F.min("id").alias("id"))
            .select("id", "s")
        )
        bdir = f"batch={batch_id}"
        out_links.write.mode("overwrite").parquet(
            os.path.join(master_dir, "links", bdir)
        )
        novel.write.mode("overwrite").parquet(os.path.join(master_dir, bdir))
        admitted = spark.read.parquet(os.path.join(master_dir, bdir))
        token_index(admitted).write.mode("overwrite").parquet(
            os.path.join(master_dir, "tokens", bdir)
        )
        spark.read.parquet(os.path.join(master_dir, "tokens", bdir)).groupBy(
            "token"
        ).agg(F.count(F.lit(1)).alias("cnt")).write.mode("overwrite").parquet(
            os.path.join(master_dir, "tokfreq", bdir)
        )
        links.unpersist()
        b.unpersist()

    return apply


def setsim_ingest_stream(
    dirty_stream: DataFrame,
    master_dir: str,
    checkpoint: str,
    t_num: int = DEFAULT_T_NUM,
    t_den: int = DEFAULT_T_DEN,
    link_mode: str = "all",
    k: int = 1,
):
    """Attach the set-similarity linkage sink to a dirty-record stream.
    Returns the started StreamingQuery (caller awaits/stops)."""
    return (
        dirty_stream.writeStream.foreachBatch(
            setsim_ingest_sink(
                master_dir, t_num=t_num, t_den=t_den,
                link_mode=link_mode, k=k,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_setsim_master(
    spark: SparkSession, master_dir: str, keep_latest: int = 1
) -> list[int]:
    """Fold the commit-stable prefix of the master, its token index,
    and its token-frequency sidecar (keyed sum keeps the folded sidecar
    one row per token; links stay per-batch — results, not probe
    state).

    The sidecar folds run UNCONDITIONALLY, not gated on the master fold
    having done work this call: a crash between the master fold and the
    sidecar folds leaves the sidecars lagging the master, and on the
    next call the master fold may find nothing left to do — the
    sidecars must still catch up or the misalignment persists forever
    (and `retraction._purge_index_sidecars` then sees index dirs with
    no master dir). When everything is aligned the extra calls are
    metadata-cost no-ops."""
    from backend_big_data_spark.streaming.maintenance import _fold

    folded = _fold(spark, master_dir, "batch", keep_latest)
    tokens_dir = os.path.join(master_dir, "tokens")
    if fsutil.list_subdirs(spark, tokens_dir, prefix="batch="):
        _fold(spark, tokens_dir, "batch", keep_latest)
    tokfreq_dir = os.path.join(master_dir, "tokfreq")
    if fsutil.list_subdirs(spark, tokfreq_dir, prefix="batch="):
        _fold(
            spark,
            tokfreq_dir,
            "batch",
            keep_latest,
            reducer=lambda df: df.groupBy("token").agg(
                F.sum("cnt").alias("cnt")
            ),
        )
    return folded


__all__ = [
    "compact_setsim_master",
    "read_master_token_freq",
    "read_master_tokens",
    "read_setsim_master",
    "setsim_ingest_sink",
    "setsim_ingest_stream",
    "setsim_link_batch",
]
