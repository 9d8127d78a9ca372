"""Distributed BPE merge learning — tokenizer training over the corpus.

Classic byte-pair-encoding vocabulary learning (public algorithm:
Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units") re-expressed Spark-first:

1. ONE corpus scan builds the word-frequency table (explode + groupBy —
   map-side combine, shuffle keyed on word). Everything after operates on
   the vocabulary, which is orders of magnitude smaller than the corpus —
   the same working-set collapse every classic BPE learner exploits.
2. Each merge step is pure DataFrame algebra over the vocab table:
   adjacent-pair counts via ``arrays_zip`` of shifted ``slice`` s (JVM
   higher-order functions, no Python on the data path), weighted by word
   frequency; the argmax pair via ``min_by`` over a (−count, left, right)
   ordering struct — count-descending with a DETERMINISTIC lexicographic
   tie-break so reruns and engines agree.
3. The winning pair merges into every word's symbol sequence with a
   greedy left-to-right ``aggregate`` fold (non-overlapping, leftmost
   first — "aaaa" + (a,a) → ["aa","aa"]), again fully JVM-side.

Scale notes (100 TB): the corpus is read exactly once; the k iterations
touch only the vocab table (even web-scale corpora have vocabularies in
the tens of millions — a few GB). The per-step 1-row ``first()`` is the
algorithm's inherent sync point, identical in shape to KMeans' per-round
centroid collect. ``localCheckpoint`` truncates lineage each step so the
plan stays constant-size regardless of k; a production run at very large
vocab would swap it for a parquet round-trip per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation

#: default number of merge operations to learn
DEFAULT_NUM_MERGES = 12


def word_symbols(word_counts: DataFrame) -> DataFrame:
    """(word, n) → (syms array<string>, n): split each word into single
    characters (no end-of-word sentinel — documented simplification; the
    merge algebra is sentinel-agnostic)."""
    return word_counts.select(
        F.filter(
            F.split(F.col("word"), "(?!^)"), lambda c: c != F.lit("")
        ).alias("syms"),
        F.col("n"),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(syms, n) → (l, r, cnt): adjacent symbol pairs weighted by word
    frequency. ``arrays_zip`` of the two shifted slices, exploded."""
    return (
        words.select(
            "n",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1).alias("l"),
                    F.slice("syms", 2, F.size("syms") - 1).alias("r"),
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("n").alias("cnt"))
    )


def merge_pair(syms_col, left: str, right: str):
    """Column expr: greedy left-to-right merge of (left, right) in a
    symbol array — the BPE merge step as an ``aggregate`` fold."""
    merged = left + right
    return F.aggregate(
        syms_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    word_counts: DataFrame, num_merges: int = DEFAULT_NUM_MERGES
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a (word, n) frequency table.

    Returns a DataFrame (step int, left_sym, right_sym, merged string,
    pair_count long) in learning order. Stops early if the vocabulary
    runs out of adjacent pairs."""
    spark = word_counts.sparkSession
    words = pin_single_evaluation(word_symbols(word_counts))
    out = []
    for step in range(num_merges):
        best = (
            _pair_counts(words)
            .select(
                F.min_by(
                    F.struct("l", "r", "cnt"),
                    F.struct((-F.col("cnt")).alias("nc"), "l", "r"),
                ).alias("b")
            )
            .first()
        )
        if best is None or best.b is None:
            break
        left, right, cnt = best.b.l, best.b.r, best.b.cnt
        out.append((step, left, right, left + right, cnt))
        nxt = pin_single_evaluation(
            words.select(
                merge_pair(F.col("syms"), left, right).alias("syms"), "n"
            )
        )
        words.unpersist()
        words = nxt
    words.unpersist()
    return spark.createDataFrame(
        out,
        "step int, left_sym string, right_sym string, merged string, "
        "pair_count long",
    )


#: fixed-point scale for the WordPiece likelihood score (milli-nats,
#: round-half-up — the repo's lm.py convention)
WORDPIECE_SCORE_SCALE = 1000


def _symbol_counts(words: DataFrame) -> DataFrame:
    """(syms, n) → (sym, ucnt): per-symbol occurrence totals weighted by
    word frequency — the denominators of the WordPiece score."""
    return (
        words.select("n", F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("n").alias("ucnt"))
    )


def learn_wordpiece(
    word_counts: DataFrame, num_merges: int = DEFAULT_NUM_MERGES
) -> DataFrame:
    """Learn ``num_merges`` WordPiece merges from a (word, n) table.

    Same iteration skeleton as :func:`learn_bpe` (pair counts via
    ``arrays_zip``, greedy fold merge), but the selected pair maximizes
    the LIKELIHOOD GAIN score count(l,r) / (count(l)·count(r)) instead
    of the raw pair count (Schuster & Nakajima 2012, "Japanese and
    Korean voice search"; the merge rule used for BERT's vocabulary) —
    merging what co-occurs more than its parts' frequencies predict.
    The score is compared in fixed point,
    ``floor(1000·(ln cnt − ln ucnt_l − ln ucnt_r) + 0.5)`` (milli-nats,
    round-half-up), with a deterministic (score DESC, l, r) tie-break —
    engine-portable like the unigram module's costs.

    Returns (step int, left_sym, right_sym, merged string, score_fp
    long, pair_count long) in learning order; stops early when no
    adjacent pair remains."""
    spark = word_counts.sparkSession
    words = pin_single_evaluation(word_symbols(word_counts))
    out = []
    for step in range(num_merges):
        pc = _pair_counts(words)
        uc = _symbol_counts(words)
        score = F.floor(
            (
                F.log(F.col("cnt").cast("double"))
                - F.log(F.col("ul").cast("double"))
                - F.log(F.col("ur").cast("double"))
            )
            * WORDPIECE_SCORE_SCALE
            + F.lit(0.5)
        ).cast("long")
        best = (
            pc.join(uc.select(F.col("sym").alias("l"), F.col("ucnt").alias("ul")), "l")
            .join(uc.select(F.col("sym").alias("r"), F.col("ucnt").alias("ur")), "r")
            .withColumn("score_fp", score)
            .select(
                F.min_by(
                    F.struct("l", "r", "cnt", "score_fp"),
                    F.struct((-F.col("score_fp")).alias("ns"), "l", "r"),
                ).alias("b")
            )
            .first()
        )
        if best is None or best.b is None:
            break
        left, right, cnt, score_fp = best.b.l, best.b.r, best.b.cnt, best.b.score_fp
        out.append((step, left, right, left + right, score_fp, cnt))
        nxt = pin_single_evaluation(
            words.select(
                merge_pair(F.col("syms"), left, right).alias("syms"), "n"
            )
        )
        words.unpersist()
        words = nxt
    words.unpersist()
    return spark.createDataFrame(
        out,
        "step int, left_sym string, right_sym string, merged string, "
        "score_fp long, pair_count long",
    )


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Driver-side reference encoder: apply learned merges in order to
    one word (greedy left-to-right per merge) — the plain-Python twin the
    tests diff the distributed fold against."""
    syms = list(word)
    for left, right in merges:
        acc: list[str] = []
        for s in syms:
            if acc and acc[-1] == left and s == right:
                acc[-1] = left + right
            else:
                acc.append(s)
        syms = acc
    return syms


def apply_bpe(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Encode words with a learned merge list: adds ``syms``
    (array<string>) by chaining one ``aggregate`` fold per merge — a
    constant-depth JVM expression, no Python on the data path."""
    syms = F.filter(F.split(F.col(word_col), "(?!^)"), lambda c: c != F.lit(""))
    for left, right in merges:
        syms = merge_pair(syms, left, right)
    return words.withColumn("syms", syms)


__all__ = [
    "DEFAULT_NUM_MERGES",
    "WORDPIECE_SCORE_SCALE",
    "apply_bpe",
    "learn_bpe",
    "learn_wordpiece",
    "merge_pair",
    "segment_word",
    "word_symbols",
]
