"""N-gram language-model scoring — the perplexity-style quality filter of
the CCNet pipeline (Wenzek et al. 2020, "CCNet: Extracting high quality
monolingual datasets from web crawl data", arXiv:1911.00359): score every
document by its negative log-likelihood under a language model and filter
or bucket on the score. CCNet uses a KenLM 5-gram; the declarative analog
here is an add-k-smoothed bigram model whose "training" is two corpus
count aggregates — which keeps the entire scorer (training + scoring) one
Catalyst DAG and bit-for-bit reproducible on any engine.

Model: p(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V), with c(·) corpus
occurrence counts, V the unigram vocabulary size, k = 0.5. Per-document
NLL = -Σ ln p over its bigram occurrences; per-bigram log-probs are
rounded to 1e-4 and SCALED TO INTEGER before the per-doc sum (the DSIR
fixed-point convention — FP sums are order-dependent, integer sums are
not).

Scale shape: two hash aggregates build the model (bigram counts keyed on
the bigram, unigram counts keyed on the token — the classic inverted
shape; no broadcast assumption, the model tables are corpus-vocabulary
sized), then scoring is two keyed joins + one per-doc sum. Every shuffle
is keyed (bigram / token / doc_id); nothing is quadratic and nothing
collects. At 100 TB you'd train on a sample and PIN the model tables —
the scorer below accepts any (bigram, count) / (token, count) frames, so
a pinned model is a drop-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Add-k smoothing mass.
SMOOTH_K = 0.5
#: Fixed-point scale for per-bigram log-probs.
LOGP_SCALE = 10_000


def _tokens(text):
    return F.regexp_extract_all(F.lower(text), F.lit("[a-z]{2,}"), F.lit(0))


def doc_bigram_occurrences(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, w1, bigram) — one row per bigram OCCURRENCE (multiplicity
    kept; the LM scores every position). ``bigram`` is the space-joined
    pair, ``w1`` its context token."""
    toks = _tokens(F.col(text_col))
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.explode(pairs).alias("bigram")
    ).withColumn("w1", F.split(F.col("bigram"), " ")[0])


def bigram_nll(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_df: DataFrame | None = None,
    model_text_col: str | None = None,
) -> DataFrame:
    """Per-document NLL under the smoothed bigram model: ``(id, n_bigrams
    int, nll_fp long, avg_nll double)``. ``nll_fp`` is the exact integer
    fixed-point sum (1e-4 nats); ``avg_nll`` = nll per bigram, NULL for
    docs with fewer than two tokens.

    ``model_df``: the frame the model TRAINS on (its ``text_col`` column;
    default: ``df`` itself, the self-trained form). A separate training
    frame is the CCNet shape — train on the corpus (or a pinned sample),
    score sub-document chunks or a new batch. Scoring units may then
    contain bigrams/contexts absent from the model; smoothing handles
    them (count 0), via left joins + coalesce — for the self-trained case
    every join key is present, so the results are unchanged."""
    if model_df is None:
        model_df = df
    mcol = model_text_col or text_col
    occ = doc_bigram_occurrences(df, text_col, id_col)
    if model_df is df:
        model_occ = occ
    else:
        # id-free bigram occurrences of the training frame
        mt = _tokens(F.col(mcol))
        pairs = F.when(
            F.size(mt) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(mt) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(mt, i + 1), F.element_at(mt, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        model_occ = model_df.select(F.explode(pairs).alias("bigram"))
    c2 = model_occ.groupBy("bigram").agg(F.count("*").alias("__c2"))
    c1 = (
        model_df.select(F.explode(_tokens(F.col(mcol))).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("__c1"))
    )
    vocab = c1.agg(F.count("*").alias("__v"))
    logp_fp = F.floor(
        (
            F.log(F.coalesce(F.col("__c2"), F.lit(0)) + F.lit(SMOOTH_K))
            - F.log(
                F.coalesce(F.col("__c1"), F.lit(0))
                + F.lit(SMOOTH_K) * F.col("__v")
            )
        )
        * LOGP_SCALE
        + F.lit(0.5)
    ).cast("long")
    scored = (
        occ.join(c2, on="bigram", how="left")
        .join(c1, on="w1", how="left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            (-F.sum(logp_fp)).alias("nll_fp"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("nll_fp", F.lit(0)).alias("nll_fp"),
            F.when(
                F.col("n_bigrams") > 0,
                (F.col("nll_fp") / LOGP_SCALE) / F.col("n_bigrams"),
            ).alias("avg_nll"),
        )
    )
