#!/usr/bin/env python
"""Scale-up measurement for the round-7 operators: Ed-Join fuzzy
linkage and fixed-point PageRank. Replicate the input 1x/4x/16x and
measure wall clock; both should grow ~linearly (the fuzzy join because
prefix-filter candidates stay per-entity-local, PageRank because each
iteration is one keyed shuffle over the edge list).

Replication discipline (same rule as scale_incremental.py): replicas
must not interact. Fuzzy-join replicas get a replica tag INSIDE the
entity string (so strings differ by >k edits across replicas and every
match stays within its replica — otherwise output pairs would grow
quadratically and the experiment would measure the replication
artifact, not the operator). PageRank replicas get namespaced node ids
(disjoint graph components).

Usage: python tools/scale_linkage.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from backend_big_data_spark.operators.fuzzyjoin import (  # noqa: E402
    edit_distance_join,
)
from backend_big_data_spark.operators.pagerank import pagerank  # noqa: E402
from backend_big_data_spark.plans.round7c import (  # noqa: E402
    _corrupt,
    _entities,
)
from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402

FACTORS = [1, 4, 16]
RUNS = 3


def timed(fn) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def replicate_shared_vocab(df: DataFrame, factor: int) -> DataFrame:
    """id-shifted replicas with a leading replica tag: replicas still
    SHARE almost all their q-grams — the adversarial regime where the
    corpus grows but the gram vocabulary does not (TPC-H part names draw
    from 64 color words), so every gram's frequency scales with the
    factor and candidate fan-out grows superlinearly. Kept in the study
    to report that term honestly."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    return df.select("id", "s", reps).select(
        (F.col("id") + F.col("rep") * 10_000_000).alias("id"),
        F.concat(F.lit("rep"), F.col("rep").cast("string"), F.lit(">"), "s").alias(
            "s"
        ),
    )


def replicate_disjoint_grams(df: DataFrame, factor: int) -> DataFrame:
    """id-shifted replicas with a replica letter interleaved every 2nd
    character: every 3-gram of replica r contains r's letter, so the
    replicas' gram spaces are fully disjoint — the long-tail regime
    where corpus growth brings NEW entities with fresh grams (real-world
    name/address vocabularies). Candidates stay within-replica and the
    join should scale ~linearly."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    tag = F.element_at(
        F.split(F.lit("A,B,C,D,E,F,G,H,I,J,K,L,M,N,O,P"), ","),
        F.col("rep") + 1,
    )
    # insert the tag letter after every 2nd character
    interleaved = F.array_join(
        F.transform(
            F.split(F.regexp_replace("s", "(..)", "$1\x1f"), "\x1f"),
            lambda chunk: F.concat(chunk, tag),
        ),
        "",
    )
    return df.select("id", "s", reps).select(
        (F.col("id") + F.col("rep") * 10_000_000).alias("id"),
        interleaved.alias("s"),
    )


def replicate_edges(df: DataFrame, factor: int) -> DataFrame:
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    tag = F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("."))
    return df.select("src", "dst", reps).select(
        F.concat(tag, "src").alias("src"), F.concat(tag, "dst").alias("dst")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="scale_linkage", shuffle_partitions=32)

    clean0 = _entities(spark, sf_dir)

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )

    print(f"== fuzzy linkage / pagerank scale study ({sf_dir}) ==")
    for label, replicate in (
        ("fuzzy_join[disjoint-grams]", replicate_disjoint_grams),
        ("fuzzy_join[shared-vocab]  ", replicate_shared_vocab),
    ):
        for factor in FACTORS:
            clean = replicate(clean0, factor).cache()
            dirty = _corrupt(clean).cache()
            n = clean.count() + dirty.count()
            out = edit_distance_join(dirty, clean, max_dist=2, q=3)
            pairs = out.count()  # warm + sanity: ~linear in factor
            wall = timed(lambda: out.count())
            print(
                f"{label} factor={factor:>2} rows={n:>7} "
                f"pairs={pairs:>7} wall={wall:6.2f}s"
            )
            clean.unpersist()
            dirty.unpersist()

    # incremental probe: hold the arriving batch FIXED (replica 0's
    # dirty records) and grow the at-rest master 1x/4x/16x — the
    # per-batch-cost claim of the streaming linkage sink. Master index
    # is pre-built (as admission maintains it); probe = broadcast prefix
    # grams against the index scan + candidate-bounded verify.
    from backend_big_data_spark.operators.fuzzyjoin import (
        edit_distance_join_indexed,
        gram_index,
    )

    batch = _corrupt(replicate_disjoint_grams(clean0, 1)).cache()
    batch.count()
    for factor in FACTORS:
        master = replicate_disjoint_grams(clean0, factor).cache()
        idx = gram_index(master).cache()
        nm, _ = master.count(), idx.count()
        out = edit_distance_join_indexed(batch, idx, master, max_dist=2, q=3)
        pairs = out.count()
        wall = timed(lambda: out.count())
        print(
            f"linkage_probe factor={factor:>2} master={nm:>7} "
            f"pairs={pairs:>7} wall={wall:6.2f}s"
        )
        master.unpersist()
        idx.unpersist()
    batch.unpersist()

    # maintained gram-frequency sidecar (round 8): the index-frequency
    # ranking minimizes candidate volume, but its on-the-fly form pays a
    # full-index aggregate per probe — exactly the per-batch corpus term
    # the sidecar family exists to eliminate. Mirror the sink's at-rest
    # state (index and freq both parquet, not cached) and probe in the
    # PRODUCTION regime: a small arriving batch against a master grown
    # 4x/16x. On-the-fly pays O(|index|) per probe regardless of batch
    # size, so its wall grows with the master while the maintained
    # variant's only index contact is the candidate scan. (Measured the
    # other regime too: with a MASTER-SIZED batch the candidate verify
    # dominates both variants — sf0.1 walls within noise at 65 s — so
    # the sidecar's win is precisely the small-batch streaming case.)
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="scale_gramfreq_")
    batch_small = _corrupt(replicate_disjoint_grams(clean0, 1)).limit(500).cache()
    batch_small.count()
    for factor in FACTORS:
        master = replicate_disjoint_grams(clean0, factor).cache()
        nm = master.count()
        idx_path = f"{work}/idx_{factor}"
        freq_path = f"{work}/freq_{factor}"
        gram_index(master).write.mode("overwrite").parquet(idx_path)
        spark.read.parquet(idx_path).groupBy("gram").agg(
            F.count(F.lit(1)).alias("cnt")
        ).write.mode("overwrite").parquet(freq_path)
        idx = spark.read.parquet(idx_path)
        freq = spark.read.parquet(freq_path)
        otf = edit_distance_join_indexed(
            batch_small, idx, master, max_dist=2, q=3, rank_by_index_freq=True
        )
        mnt = edit_distance_join_indexed(
            batch_small, idx, master, max_dist=2, q=3, index_freq=freq
        )
        p1, p2 = otf.count(), mnt.count()
        assert p1 == p2, (p1, p2)
        w_otf = timed(lambda: otf.count())
        w_mnt = timed(lambda: mnt.count())
        print(
            f"freq_rank[small-batch] factor={factor:>2} master={nm:>7} "
            f"pairs={p1:>7} on_the_fly={w_otf:6.2f}s maintained={w_mnt:6.2f}s"
        )
        master.unpersist()
    batch_small.unpersist()
    shutil.rmtree(work, ignore_errors=True)

    for factor in FACTORS:
        edges = replicate_edges(edges0, factor).cache()
        ne = edges.count()
        wall = timed(lambda: pagerank(edges, iterations=5).count())
        print(f"pagerank   factor={factor:>2} edges={ne:>8} wall={wall:6.2f}s")
        edges.unpersist()


if __name__ == "__main__":
    main()
