"""Text quality scoring + token statistics (north-star additive scope).

Everything is a Catalyst column expression — at 100 TB these run inside
whole-stage codegen over the parquet scan with zero Python. Metrics follow
the standard pre-training quality-filter family (length, type-token ratio,
stopword density; cf. C4/Gopher-style rules from the public literature).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.functions.textfns import (
    BPE_PATTERN,
    bpe_token_count,
    tokens,
)

#: Small deterministic English stopword list (shared with the DuckDB oracle).
EN_STOPWORDS = ["the", "a", "an", "of", "and", "in", "to", "is", "it", "that"]


def stopword_hits(toks: Column, stopwords: list[str]) -> Column:
    """Count of tokens that are stopwords — higher-order filter, JVM-side."""
    return F.size(F.filter(toks, lambda x: x.isin(stopwords)))


def quality_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token/char statistics and quality signals.

    Output columns (types pinned for oracle parity):
      n_chars, n_tokens, n_distinct_tokens, chars_no_ws, bpe_tokens: int
      avg_token_len, ttr, stopword_ratio: double (rounded 4dp)
    """
    t = tokens(F.col(text_col))
    df = df.select(
        F.col(id_col),
        F.length(text_col).cast("int").alias("n_chars"),
        F.size(t).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("int").alias("n_distinct_tokens"),
        F.length(F.regexp_replace(F.col(text_col), r"\s+", "")).cast("int").alias("chars_no_ws"),
        bpe_token_count(F.col(text_col)).cast("int").alias("bpe_tokens"),
        stopword_hits(t, EN_STOPWORDS).cast("int").alias("stopword_hits"),
    )
    return df.select(
        id_col,
        "n_chars",
        "n_tokens",
        "n_distinct_tokens",
        "chars_no_ws",
        "bpe_tokens",
        "stopword_hits",
        F.round(F.col("chars_no_ws") / F.col("n_tokens"), 4).alias("avg_token_len"),
        F.round(F.col("n_distinct_tokens") / F.col("n_tokens"), 4).alias("ttr"),
        F.round(F.col("stopword_hits") / F.col("n_tokens"), 4).alias("stopword_ratio"),
    )


__all__ = ["EN_STOPWORDS", "BPE_PATTERN", "quality_profile", "stopword_hits"]
