"""Heuristic language identification (north-star additive scope).

Stopword-hit scoring against small per-language lists — the classic cheap
n-gram/stopword heuristic. Pure column expressions; ties broken by a fixed
language priority so results are deterministic and SQL-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from backend_big_data_spark.functions.textfns import tokens

#: Priority-ordered: on tied scores the earlier language wins.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "an", "of", "and", "in", "to", "is"],
    "es": ["el", "la", "los", "de", "y", "que", "un", "una"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ein", "eine", "ist", "nicht"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不"],
}


def lang_scores(text: Column) -> dict[str, Column]:
    t = tokens(text)
    return {
        lang: F.size(F.filter(t, lambda x: x.isin(words)))
        for lang, words in LANG_STOPWORDS.items()
    }


def predict_lang(text: Column, default: str = "und") -> Column:
    """argmax over language scores with fixed priority tie-break; ``und``
    when no stopword hits at all."""
    scores = lang_scores(text)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr: Column = F.lit(default)
    for lang in reversed(langs):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit(default))
