"""Blocklist-based document filtering (C4-style "bad word" rule).

The public C4 pipeline drops any page containing a blocklisted word; later
corpora (e.g. RefinedWeb-style cleanups described in the public literature)
soften that to a density threshold so a single incidental hit does not
discard an otherwise-good document. This module implements the density
form: per-document blocked-token counts and a keep/drop verdict at a
configurable ratio.

Everything is a Catalyst higher-order expression over the token array —
at 100 TB this runs inside whole-stage codegen on the scan, no shuffle at
all until whatever aggregate the caller adds.

Lives in its own module (not ``text/quality.py``) so the quality-profile
queries' standing driver certifications stay pinned to an unchanged file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.functions.textfns import tokens

#: Deterministic demo blocklist (shared verbatim with the DuckDB oracle).
#: Real deployments load thousands of terms; the engine path is identical —
#: a literal array up to a few thousand entries stays an in-plan constant,
#: beyond that it becomes a broadcast join against a one-column table.
DEFAULT_BLOCKLIST = ["slow", "error", "dup"]


def blocked_hits(toks: Column, blocklist: list[str]) -> Column:
    """Count of tokens present in the blocklist (with multiplicity)."""
    return F.size(F.filter(toks, lambda x: x.isin(blocklist)))


def blocklist_profile(
    df: DataFrame,
    blocklist: list[str] | None = None,
    max_ratio: float = 0.05,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document blocklist statistics and keep/drop verdict.

    Output: ``(id_col, n_tokens int, n_blocked int, blocked_ratio double
    [4dp], kept boolean)`` — ``kept`` is true when the blocked-token density
    is at or below ``max_ratio``.
    """
    blocklist = DEFAULT_BLOCKLIST if blocklist is None else blocklist
    t = tokens(F.col(text_col))
    out = df.select(
        F.col(id_col),
        F.size(t).cast("int").alias("n_tokens"),
        blocked_hits(t, blocklist).cast("int").alias("n_blocked"),
    )
    ratio = F.col("n_blocked") / F.col("n_tokens")
    return out.select(
        id_col,
        "n_tokens",
        "n_blocked",
        F.round(ratio, 4).alias("blocked_ratio"),
        (ratio <= max_ratio).alias("kept"),
    )


#: Published fixed weights for the logistic quality scorer (the fastText/
#: classifier-based quality-filter analog from the public pretraining
#: literature, with the TRAINED artifact pinned as plan constants the same
#: way the ANN family pins centroids/codebooks — scoring stays pure SQL).
LR_WEIGHTS = {
    "bias": -2.0,
    "ttr": 1.5,
    "stopword_ratio": 2.0,
    "avg_token_len": 0.1,
    "log_tokens": 0.3,
}


def quality_score_lr(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-based quality score: logistic over (type-token ratio, stopword
    density, avg token length, log token count) with the fixed
    ``LR_WEIGHTS``. Output: ``(id_col, quality_score double [6dp], keep
    boolean)``; ``keep`` is the LINEAR score's sign (≡ sigmoid ≥ 0.5)
    snapped to a millionths grid, so neither the sigmoid's libm tail nor
    a last-bit ``ln`` divergence can flip the verdict cross-engine. Pure
    codegen column math — the scoring side of a quality classifier with
    training done elsewhere (any trainer that emits these weights drops
    in)."""
    from backend_big_data_spark.text.quality import EN_STOPWORDS

    t = tokens(F.col(text_col))
    n_tokens = F.size(t).cast("double")
    ttr = F.size(F.array_distinct(t)) / n_tokens
    stop = blocked_hits(t, EN_STOPWORDS) / n_tokens
    avg_len = (
        F.length(F.regexp_replace(F.col(text_col), r"\s+", "")) / n_tokens
    )
    w = LR_WEIGHTS
    z = (
        F.lit(w["bias"])
        + F.lit(w["ttr"]) * ttr
        + F.lit(w["stopword_ratio"]) * stop
        + F.lit(w["avg_token_len"]) * avg_len
        + F.lit(w["log_tokens"]) * F.log(n_tokens)
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    # verdict on the linear score snapped to a millionths grid (same
    # convention as temperature_mix's integer threshold): z contains a
    # libm ln term, and engines' last-bit differences must not be able to
    # flip the sign comparison
    return df.select(
        F.col(id_col),
        F.round(score, 6).alias("quality_score"),
        (F.floor(z * 1e6 + F.lit(0.5)) >= 0).alias("keep"),
    )


__all__ = [
    "DEFAULT_BLOCKLIST",
    "LR_WEIGHTS",
    "blocked_hits",
    "blocklist_profile",
    "quality_score_lr",
]
