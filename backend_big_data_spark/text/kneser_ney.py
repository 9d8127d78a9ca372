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
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"),
        F.count(F.lit(1)).alias("n1plus_fw"),  # N1+(w1 ·)
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("cont_w2"))  # N1+(· w2)
    cont_total = c12.agg(F.count(F.lit(1)).alias("cont_total"))  # N1+(· ·)
    disc = F.greatest(
        F.col("c12") * D_DEN - F.lit(D_NUM), F.lit(0).cast("long")
    )
    return (
        c12.join(c1, "w1")
        .join(cont, "w2")
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


__all__ = ["D_DEN", "D_NUM", "kn_bigram_model", "kn_doc_nll"]
