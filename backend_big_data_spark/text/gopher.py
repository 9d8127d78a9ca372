"""Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", arXiv:2112.11446,
Table A1) — the other canonical rule-based quality filter next to the
C4 blocklist and the logistic scorer: document-level word-count bounds,
mean-word-length bounds, symbol-to-word ratio, alphabetic-word fraction,
and a minimum stop-word presence.

Determinism note: every RATIO threshold is evaluated by integer
cross-multiplication (``chars <= 10 * words`` instead of
``chars/words <= 10.0``), so no floating-point division ever happens and
the verdicts are exact on any engine — boundary documents cannot flip on
a last-ulp quotient.

All pure codegen column expressions — the filter fuses into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3   # chars >= 3*words
MAX_MEAN_WORD_LEN = 10  # chars <= 10*words
#: symbol-to-word ratio < 0.1  ->  10*symbols < words
SYMBOL_RATIO_DEN = 10
#: alphabetic-word fraction > 0.8  ->  5*alpha_words > 4*words
ALPHA_NUM, ALPHA_DEN = 4, 5
#: Gopher Table A1 requires at least two DISTINCT stop words present
MIN_STOPWORD_HITS = 2
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _words(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def gopher_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document rule verdicts + overall keep. Output columns:
    (id, n_words int, ok_word_count, ok_mean_word_len, ok_symbol_ratio,
    ok_alpha_fraction, ok_stopwords, keep)."""
    t = _words(F.col(text_col))
    n_words = F.size(t)
    chars_no_ws = F.length(
        F.regexp_replace(F.col(text_col), r"\s+", "")
    )
    text = F.col(text_col)
    symbols = (
        F.length(text)
        - F.length(F.call_function("replace", text, F.lit("#"), F.lit("")))
        + (
            F.length(text)
            - F.length(F.call_function("replace", text, F.lit("..."), F.lit("")))
        )
        / F.lit(3)
    ).cast("long")
    alpha_words = F.size(
        F.filter(t, lambda x: x.rlike("[A-Za-z]"))
    )
    # distinct stop words matched (Table A1: "at least two OF the listed
    # words") — array_intersect dedups, so 'the the' counts once
    stop_hits = F.size(
        F.array_intersect(t, F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    ok_wc = (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)
    ok_mwl = (chars_no_ws >= MIN_MEAN_WORD_LEN * n_words) & (
        chars_no_ws <= MAX_MEAN_WORD_LEN * n_words
    )
    ok_sym = (SYMBOL_RATIO_DEN * symbols) < n_words
    ok_alpha = (ALPHA_DEN * alpha_words) > (ALPHA_NUM * n_words)
    ok_stop = stop_hits >= MIN_STOPWORD_HITS
    return df.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_alpha.alias("ok_alpha_fraction"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_sym & ok_alpha & ok_stop).alias("keep"),
    )
