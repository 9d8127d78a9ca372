"""Interpolated Kneser-Ney bigram language model — the canonical n-gram
smoothing (Kneser & Ney 1995, "Improved backing-off for m-gram language
modeling", ICASSP; absolute-discounting interpolation form as in Chen &
Goodman 1999's survey), as exact BIGINT rational algebra.

  P_KN(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·)
              + D·N1+(w1 ·)/c(w1·) · N1+(· w2)/N1+(· ·)

with c the corpus occurrence counts, N1+ the DISTINCT-continuation
counts (the model's defining idea: a word's unigram weight is how many
contexts it follows, not how often it occurs — "San Francisco" makes
"Francisco" frequent but not versatile), and D the absolute discount.

The engine trick: with D = 3/4 every term is a ratio of integers, so
the probability is carried as an exact BIGINT fraction

  kn_num = max(4·c12 − 3, 0)·N1+(··) + 3·N1+(w1 ·)·N1+(· w2)
  kn_den = 4·c(w1·)·N1+(··)

— bit-for-bit reproducible on any engine, no floating point in the
model at all. Floats appear only at SCORING time, where each bigram's
log-probability quantizes to the repo's fixed-point convention
(`text/lm.py::LOGP_SCALE`, round-half-up) before the order-independent
integer per-document sum.

Scale shape: model training is three hash aggregates over the bigram
occurrences (keyed on bigram / w1 / w2 — classic inverted shape, no
broadcast assumption); scoring is two keyed joins plus a per-doc sum.
Nothing is quadratic, nothing collects; at 100 TB train on a sample and
pin the model frame (`kn_doc_nll` accepts any model frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation
from backend_big_data_spark.text.lm import (
    LOGP_SCALE,
    doc_bigram_occurrences,
)

#: absolute discount D as an exact rational (numerator / denominator)
D_NUM = 3
D_DEN = 4



def kn_bigram_model(
    model_df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(w1, w2, c12, kn_num, kn_den): the interpolated KN bigram
    probability of every observed bigram as an exact BIGINT fraction
    (see module docstring). ``c12`` is the raw bigram count.

    Contexts/continuations are the observed-bigram sets; bigrams absent
    from training have no row (a scorer must handle them — for the
    self-trained scoring shape every scored bigram is present)."""
    occ = doc_bigram_occurrences(model_df, text_col, id_col)
    pair = occ.withColumn("w2", F.split(F.col("bigram"), " ")[1])
    c12 = pair.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    return kn_bigram_model_from_counts(c12)


def kn_bigram_model_from_counts(c12: DataFrame) -> DataFrame:
    """`kn_bigram_model` from a PRE-AGGREGATED bigram count table
    (w1, w2, c12) — the incremental-training entry point: bigram counts
    are additive across document batches, so a maintained counts sidecar
    (`streaming/lm_ingest.py`) summed by key feeds this and yields the
    model a full retrain would (equivalence oracle-certified by
    `doc_kn_incremental_model` sharing `doc_kn_bigram_model`'s SQL
    twin). Everything KN needs beyond the counts (context totals,
    distinct-continuation counts) derives from the count TABLE, never
    the corpus.

    The count table is PINNED eagerly before fan-out: it feeds FOUR
    consumers (the model join itself plus the c1 / cont / cont_total
    aggregates), and Spark plans each branch as an independent subtree
    — over the occurrence path that re-ran the corpus explode + bigram
    aggregation once PER BRANCH (r12 plan audit: zero ReusedExchange
    nodes, 4 corpus scans), and over the sidecar path it re-ran the
    delta-union keyed sum per branch. One materialization of the
    bigram-TYPE table (vocabulary-sized, orders of magnitude under the
    occurrence stream) feeds all branches instead. Same eager-pin
    discipline as the armed setsim joins; content is an aggregate, so
    the pin is determinism-neutral."""
    c12 = pin_single_evaluation(c12)
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).alias("n1plus_fw"),  # N1+(w1 ·)
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("cont_w2"))  # N1+(· w2)
    cont_total = c12.agg(F.count(F.lit(1)).alias("cont_total"))  # N1+(· ·)
    disc = F.greatest(
        F.col("c12") * D_DEN - F.lit(D_NUM), F.lit(0).cast("long")
    )
    # c1 / cont are SINGLE-WORD-keyed aggregates of the pinned count
    # table — vocabulary-bounded under the module's documented scale
    # contract (train on a sample / maintained vocab-sized sidecars), so
    # they carry explicit broadcast hints: the checkpointed pin loses
    # its size estimate and the static planner otherwise falls back to
    # SortMergeJoin until AQE rescues it at runtime — after both sides'
    # shuffle writes have already happened (r12 verdict item 3 / guide
    # §3.1). The w1×w2-keyed c12 table itself is TYPE-table-sized and is
    # deliberately NOT hinted (it can be billions of rows at scale).
    return (
        c12.join(F.broadcast(c1), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(cont_total))
        .select(
            "w1",
            "w2",
            "c12",
            (
                disc * F.col("cont_total")
                + F.lit(D_NUM) * F.col("n1plus_fw") * F.col("cont_w2")
            ).alias("kn_num"),
            (F.lit(D_DEN) * F.col("c1") * F.col("cont_total")).alias("kn_den"),
        )
    )


def kn_doc_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document NLL under the KN bigram model: (id, n_bigrams int,
    nll_fp long). ``nll_fp`` is the exact integer sum of per-bigram
    −floor(LOGP_SCALE·ln(kn_num/kn_den) + 0.5) (order-independent).

    ``model_df`` defaults to ``df`` (self-trained — every scored bigram
    then has a model row). With an external model, bigrams unseen in
    training score NULL and poison the doc's sum to NULL rather than
    silently skipping positions (``sum`` alone would skip them and
    under-report the NLL): an honest OOV signal the caller routes
    through a backstop model. Docs with fewer than two tokens emit no
    row (they have no bigram to score)."""
    model = kn_bigram_model(model_df if model_df is not None else df, text_col, id_col)
    return kn_doc_nll_from_model(df, model, text_col, id_col)


def kn_doc_nll_from_model(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """`kn_doc_nll` against a PREBUILT model frame (w1, w2, kn_num,
    kn_den) — the incremental-scoring entry point: the LM sink
    (`streaming/lm_ingest.py`) feeds it the model derived from the
    maintained count sidecars, so each arriving batch scores against
    the corpus-so-far LM without a retrain scan. Same OOV NULL-poisoning
    contract as `kn_doc_nll`."""
    logp_fp = F.floor(
        (F.log(F.col("kn_num").cast("double")) - F.log(F.col("kn_den").cast("double")))
        * LOGP_SCALE
        + F.lit(0.5)
    ).cast("long")
    occ = doc_bigram_occurrences(df, text_col, id_col).withColumn(
        "w2", F.split(F.col("bigram"), " ")[1]
    )
    return (
        occ.join(model.withColumn("logp_fp", logp_fp), ["w1", "w2"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            (-F.sum("logp_fp")).alias("__nll"),
            F.sum(
                F.when(F.col("logp_fp").isNull(), 1).otherwise(0)
            ).alias("__oov"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.when(F.col("__oov") == 0, F.col("__nll")).alias("nll_fp"),
        )
    )


def doc_trigram_occurrences(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, w2, w3) — one row per trigram OCCURRENCE (multiplicity
    kept; the LM scores every position). Same tokenizer as
    `text/lm.py::doc_bigram_occurrences` (lowercased ``[a-z]{2,}``
    runs), so the trigram and bigram models read the same token
    stream."""
    from backend_big_data_spark.text.lm import _tokens

    toks = _tokens(F.col(text_col))
    triples = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("w1"),
                F.element_at(toks, i + 2).alias("w2"),
                F.element_at(toks, i + 3).alias("w3"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
    )
    return df.select(F.col(id_col), F.explode(triples).alias("t")).select(
        id_col, "t.w1", "t.w2", "t.w3"
    )


def kn_trigram_model(
    model_df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(w1, w2, w3, c123, kn_num, kn_den): interpolated Kneser-Ney
    TRIGRAM probabilities with recursive lower-order interpolation
    (Chen & Goodman 1999's recommended form), as exact BIGINT fractions.

    The recursion, with D = 3/4 at every order and lower orders built
    from CONTINUATION counts (the defining KN move — at order n−1 a
    token's weight is how many distinct order-n contexts it continues,
    not how often it occurs):

      P3(w3|w1w2) = max(c123 − D, 0)/c12•  +  D·N1+(w1w2·)/c12• · P2
      P2(w3|w2)   = max(c'23 − D, 0)/c'2•  +  D·N1+(w2·)/c'2•  · P1
      P1(w3)      = N1+(·w3) / N1+(··)

    where c123 are trigram occurrence counts, c12• their per-context
    sums, N1+(w1w2·) the distinct-continuation counts; c'23 =
    N1+(·w2w3) is the MODIFIED bigram count (distinct w1 preceding the
    bigram), c'2• its per-w2 sum, N1+(w2·) the distinct w3 after w2;
    and the unigram level counts distinct (w2,w3) bigram TYPES: N1+(·w3)
    = |{w2 : (w2,w3) observed}|, N1+(··) their total. Everything derives
    from ONE trigram-type table via four hash aggregates — the same
    inverted, never-quadratic shape as the bigram model.

    Exact fraction (U = N1+(··)):

      p2_num = max(4·c'23 − 3, 0)·U + 3·N1+(w2·)·N1+(·w3)
      p2_den = 4·c'2•·U
      kn_num = max(4·c123 − 3, 0)·p2_den + 3·N1+(w1w2·)·p2_num
      kn_den = 4·c12•·p2_den

    Overflow bound: kn_num/kn_den ≤ 16·c12•·c'2•·U must fit int64.
    Spark 4 runs ANSI arithmetic by default, so a count table past the
    bound RAISES ARITHMETIC_OVERFLOW at execution instead of silently
    wrapping (tested in test_kneser_ney.py); at web scale train on a
    sample (the module docstring's standard shape) or reduce the
    fraction. The gate corpora are orders of magnitude inside the
    bound."""
    occ = doc_trigram_occurrences(model_df, text_col, id_col)
    c123 = occ.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c123"))
    return kn_trigram_model_from_counts(c123)


def kn_trigram_model_from_counts(c123: DataFrame) -> DataFrame:
    """`kn_trigram_model` from a PRE-AGGREGATED trigram count table
    (w1, w2, w3, c123) — the incremental entry point (see
    `kn_bigram_model_from_counts`); every lower order of the recursion
    is a continuation count over the trigram TYPES, so the count table
    alone determines the whole model.

    Both count tables are PINNED eagerly before fan-out (the
    `kn_bigram_model_from_counts` rationale): c123 feeds the model join
    + ctx3 + the c23p derivation, and c23p feeds the model join + ctx2
    + u3 + utot — without the pins every branch re-ran the corpus
    trigram explode and aggregation (r12 plan audit: 6 corpus scans,
    zero ReusedExchange). The pinned tables are trigram/bigram-TYPE
    sized (vocabulary-bounded), not occurrence-stream sized."""
    c123 = pin_single_evaluation(c123)
    # highest order: context totals + distinct continuations
    ctx3 = c123.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12dot"),
        F.count(F.lit(1)).alias("n3lam"),  # N1+(w1w2 ·)
    )
    # modified bigram counts: c'(w2w3) = N1+(· w2w3) over trigram types
    c23p = pin_single_evaluation(
        c123.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("c23p"))
    )
    ctx2 = c23p.groupBy("w2").agg(
        F.sum("c23p").alias("c2pdot"),  # N1+(· w2 ·)
        F.count(F.lit(1)).alias("n2lam"),  # N1+(w2 ·)
    )
    # unigram continuation counts over the (w2,w3) bigram types
    u3 = c23p.groupBy("w3").agg(F.count(F.lit(1)).alias("u3"))  # N1+(· w3)
    utot = c23p.agg(F.count(F.lit(1)).alias("utot"))  # N1+(· ·)
    disc3 = F.greatest(
        F.col("c123") * D_DEN - F.lit(D_NUM), F.lit(0).cast("long")
    )
    disc2 = F.greatest(
        F.col("c23p") * D_DEN - F.lit(D_NUM), F.lit(0).cast("long")
    )
    p2_num = disc2 * F.col("utot") + F.lit(D_NUM) * F.col("n2lam") * F.col(
        "u3"
    )
    p2_den = F.lit(D_DEN) * F.col("c2pdot") * F.col("utot")
    # ctx2 / u3 are SINGLE-WORD-keyed, vocabulary-bounded — explicit
    # broadcast hints for the same reason as the bigram chain (the pin
    # loses its size estimate; static SMJ otherwise pays both shuffle
    # writes before AQE converts). c23p and ctx3 are bigram-TYPE-keyed
    # and deliberately NOT hinted: at scale they are the big tables the
    # r12 disposition said must never be broadcast-forced.
    return (
        c123.join(c23p, ["w2", "w3"])
        .join(ctx3, ["w1", "w2"])
        .join(F.broadcast(ctx2), "w2")
        .join(F.broadcast(u3), "w3")
        .crossJoin(F.broadcast(utot))
        .select(
            "w1",
            "w2",
            "w3",
            "c123",
            (
                disc3 * p2_den + F.lit(D_NUM) * F.col("n3lam") * p2_num
            ).alias("kn_num"),
            (F.lit(D_DEN) * F.col("c12dot") * p2_den).alias("kn_den"),
        )
    )


def kn3_doc_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document NLL under the KN trigram model: (id, n_trigrams int,
    nll_fp long) — the trigram twin of `kn_doc_nll` (same fixed-point
    quantization, same NULL-poisoning OOV contract for external models;
    docs with fewer than three tokens emit no row)."""
    model = kn_trigram_model(
        model_df if model_df is not None else df, text_col, id_col
    )
    logp_fp = F.floor(
        (
            F.log(F.col("kn_num").cast("double"))
            - F.log(F.col("kn_den").cast("double"))
        )
        * LOGP_SCALE
        + F.lit(0.5)
    ).cast("long")
    occ = doc_trigram_occurrences(df, text_col, id_col)
    return (
        occ.join(
            model.withColumn("logp_fp", logp_fp), ["w1", "w2", "w3"], "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_trigrams"),
            (-F.sum("logp_fp")).alias("__nll"),
            F.sum(
                F.when(F.col("logp_fp").isNull(), 1).otherwise(0)
            ).alias("__oov"),
        )
        .select(
            id_col,
            "n_trigrams",
            F.when(F.col("__oov") == 0, F.col("__nll")).alias("nll_fp"),
        )
    )


__all__ = [
    "D_DEN",
    "D_NUM",
    "doc_trigram_occurrences",
    "kn3_doc_nll",
    "kn_bigram_model",
    "kn_bigram_model_from_counts",
    "kn_doc_nll",
    "kn_doc_nll_from_model",
    "kn_trigram_model",
    "kn_trigram_model_from_counts",
]
