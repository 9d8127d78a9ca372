#!/usr/bin/env python
"""Scale-up measurement for the round-7 tokenizer/community operators:
unigram-LM hard-EM training and label-propagation communities.

Unigram training's scale claim is the working-set collapse: the corpus
is scanned ONCE into the (word, n) table; every EM round touches only
the vocabulary. Two replication regimes separate the terms (same
discipline as scale_linkage.py):

- shared-vocab: replicate the documents verbatim — the corpus (and the
  one scan) grows with the factor but the vocabulary is IDENTICAL, so
  end-to-end wall should stay nearly flat (the EM rounds dominate);
- disjoint-vocab: prefix every token with a per-replica letter — the
  vocabulary itself grows with the factor (the long-tail regime), so
  wall should grow with vocab size: that is the honest linear term.

LPA: disjoint namespaced graph replicas; each round is one keyed
shuffle over the edge list, so wall should grow ~linearly in edges.

Usage: python tools/scale_unigram.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from backend_big_data_spark.functions.textfns import tokens  # noqa: E402
from backend_big_data_spark.operators.graph import label_propagation  # noqa: E402
from backend_big_data_spark.session import get_spark  # noqa: E402
from backend_big_data_spark.sources.catalog import load_table  # noqa: E402
from backend_big_data_spark.text.unigram import hard_em  # noqa: E402

CORPUS_FACTORS = [1, 10, 50]
EDGE_FACTORS = [1, 4, 16]
RUNS = 3


def timed(fn) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def word_counts(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def replicate_shared(docs: DataFrame, factor: int) -> DataFrame:
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    return docs.select("text", reps).select("text")


def replicate_disjoint(docs: DataFrame, factor: int) -> DataFrame:
    """Prefix every token with the replica letter: replicas share NO
    words (and almost no multi-char substrings start the same way), so
    the vocabulary grows with the factor."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    tag = F.concat(F.lit("q"), F.col("rep").cast("string"), F.lit("z"))
    tagged = F.array_join(
        F.transform(tokens(F.col("text")), lambda t: F.concat(tag, t)), " "
    )
    return docs.select("text", reps).select(tagged.alias("text"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="scale_unigram", shuffle_partitions=32)
    docs0 = load_table(spark, sf_dir, "documents").select("text")
    docs0.localCheckpoint(eager=True)

    print(f"== unigram hard-EM / LPA scale study ({sf_dir}) ==")
    for regime, repl in (
        ("shared-vocab", replicate_shared),
        ("disjoint-vocab", replicate_disjoint),
    ):
        for factor in CORPUS_FACTORS:
            docs = repl(docs0, factor).localCheckpoint(eager=True)
            wc = word_counts(docs)
            n_words = wc.count()

            def run():
                hard_em(wc, max_piece_len=4, vocab_size=24, rounds=2).count()

            wall = timed(run)
            print(
                f"unigram {regime:15s} corpus x{factor:3d}: "
                f"{n_words:7d} distinct words, wall {wall:6.2f}s"
            )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges0.localCheckpoint(eager=True)
    for factor in EDGE_FACTORS:
        reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
        tag = F.concat(F.lit("r"), F.col("rep").cast("string"), F.lit("."))
        edges = (
            edges0.select("src", "dst", "w", reps)
            .select(
                F.concat(tag, "src").alias("src"),
                F.concat(tag, "dst").alias("dst"),
                "w",
            )
            .localCheckpoint(eager=True)
        )
        n_edges = edges.count()

        def run_lpa():
            label_propagation(edges, weight="w", iterations=4).count()

        wall = timed(run_lpa)
        print(f"lpa edges x{factor:3d}: {n_edges:8d} edges, wall {wall:6.2f}s")


if __name__ == "__main__":
    main()
