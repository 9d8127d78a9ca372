"""Interpolated Kneser-Ney bigram model (`text/kneser_ney.py`).

The model is exact BIGINT rationals, so the tests check it with exact
`fractions.Fraction` arithmetic: a hand-built reference model on a
crafted corpus, the exact normalization identity (probabilities over
the seen vocabulary sum to 1 for every context), the defining
continuation-count behavior ("Francisco" is frequent but follows only
one context), and the scorer's OOV-poisoning contract.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from fractions import Fraction

from backend_big_data_spark.text.kneser_ney import (
    D_DEN,
    D_NUM,
    kn_bigram_model,
    kn_doc_nll,
)

# "san francisco" dominates by count, but 'francisco' follows only 'san'
# — its continuation count (1) must beat down its unigram frequency (4)
CORPUS = [
    (1, "san francisco san francisco san francisco san francisco"),
    (2, "new york and old york"),
    (3, "new deal and old deal and new york"),
]


def _ref_model(rows):
    toks = {i: re.findall("[a-z]{2,}", t.lower()) for i, t in rows}
    bigrams = Counter()
    for t in toks.values():
        for a, b in zip(t, t[1:]):
            bigrams[(a, b)] += 1
    c1 = Counter()
    n1plus_fw = Counter()
    cont = Counter()
    for (a, b), c in bigrams.items():
        c1[a] += c
        n1plus_fw[a] += 1
        cont[b] += 1
    cont_total = len(bigrams)
    D = Fraction(D_NUM, D_DEN)
    model = {}
    for (a, b), c in bigrams.items():
        p = max(c - D, 0) / c1[a] + D * n1plus_fw[a] / c1[a] * Fraction(
            cont[b], cont_total
        )
        model[(a, b)] = (c, p)
    return model, toks


def _spark_model(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return {
        (r.w1, r.w2): (r.c12, Fraction(r.kn_num, r.kn_den))
        for r in kn_bigram_model(df).collect()
    }


def test_model_matches_exact_reference(spark):
    got = _spark_model(spark)
    want, _ = _ref_model(CORPUS)
    assert got == want


def test_normalization_sums_to_one_per_context(spark):
    """Interpolated KN is a proper distribution over the SEEN vocabulary:
    for every context w1, Σ_w2 P(w2|w1) = 1 exactly, where unseen-pair
    (w1, w2) terms contribute only the continuation part. Checked in
    exact rational arithmetic — any discount/continuation bookkeeping
    bug breaks this identity."""
    got = _spark_model(spark)
    want, toks = _ref_model(CORPUS)
    bigrams = set(got)
    contexts = {a for a, _ in bigrams}
    vocab = {w for t in toks.values() for w in t}
    cont = Counter()
    c1 = Counter()
    n1plus = Counter()
    for (a, b), (c, _) in want.items():
        cont[b] += 1
        c1[a] += c
        n1plus[a] += 1
    cont_total = len(bigrams)
    D = Fraction(D_NUM, D_DEN)
    for a in contexts:
        total = Fraction(0)
        for b in vocab:
            if (a, b) in got:
                total += got[(a, b)][1]
            elif cont[b]:
                total += (
                    D * n1plus[a] / c1[a] * Fraction(cont[b], cont_total)
                )
        assert total == 1, (a, total)


def test_continuation_beats_raw_frequency(spark):
    """The KN signature: 'francisco' occurs 4 times but always after
    'san', so as a CONTINUATION after a fresh context it is weighted by
    cont=1 — less likely than 'york' (cont 2, freq 3) despite the higher
    unigram count."""
    got = _spark_model(spark)
    # continuation probability ∝ cont_w2; compare through any shared
    # context's interpolation weight — use the backoff terms directly
    p_francisco = got[("san", "francisco")][1]
    # francisco after 'san' is near-deterministic (every bigram from
    # 'san' goes to francisco) — high, minus the D=3/4 discount mass
    assert p_francisco > Fraction(4, 5)
    # but its continuation share is 1/cont_total vs york's 2/cont_total:
    want, _ = _ref_model(CORPUS)
    cont = Counter()
    for (a, b) in want:
        cont[b] += 1
    assert cont["francisco"] == 1 < cont["york"]


def test_doc_nll_fixed_point_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.nll_fp) for r in kn_doc_nll(df).collect()
    }
    model, toks = _ref_model(CORPUS)
    for i, t in toks.items():
        fps = []
        for a, b in zip(t, t[1:]):
            p = model[(a, b)][1]
            fps.append(
                math.floor(
                    (math.log(p.numerator) - math.log(p.denominator)) * 10_000
                    + 0.5
                )
            )
        assert got[i] == (len(fps), -sum(fps)), i


def test_external_model_oov_poisons_to_null(spark):
    """Scoring against a model that has never seen a bigram must NULL
    that doc's nll_fp (silently skipping positions would under-report),
    while fully-covered docs still score."""
    train = spark.createDataFrame(CORPUS, "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "san francisco san francisco"), (11, "totally unseen words")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.nll_fp for r in kn_doc_nll(score, model_df=train).collect()}
    assert got[10] is not None
    assert got[11] is None


# ---------------------------------------------------------------------------
# trigram order (recursive lower-order interpolation)
# ---------------------------------------------------------------------------


def _ref3(rows):
    """Exact-Fraction reference for the interpolated KN trigram recursion
    (continuation counts at every lower order)."""
    toks = {i: re.findall("[a-z]{2,}", t.lower()) for i, t in rows}
    tri = Counter()
    for t in toks.values():
        for a, b, c in zip(t, t[1:], t[2:]):
            tri[(a, b, c)] += 1
    ctx3_c, ctx3_n, c23p = Counter(), Counter(), Counter()
    for (a, b, c), n in tri.items():
        ctx3_c[(a, b)] += n
        ctx3_n[(a, b)] += 1
        c23p[(b, c)] += 1
    ctx2_c, ctx2_n, u3 = Counter(), Counter(), Counter()
    for (b, c), n in c23p.items():
        ctx2_c[b] += n
        ctx2_n[b] += 1
        u3[c] += 1
    utot = len(c23p)
    D = Fraction(D_NUM, D_DEN)

    def p1(c):
        return Fraction(u3[c], utot)

    def p2(b, c):
        seen = max(c23p[(b, c)] - D, 0) if (b, c) in c23p else Fraction(0)
        return seen / ctx2_c[b] + D * ctx2_n[b] / ctx2_c[b] * p1(c)

    def p3(a, b, c):
        seen = max(tri[(a, b, c)] - D, 0) if (a, b, c) in tri else Fraction(0)
        return (
            seen / ctx3_c[(a, b)]
            + D * ctx3_n[(a, b)] / ctx3_c[(a, b)] * p2(b, c)
        )

    model = {k: (n, p3(*k)) for k, n in tri.items()}
    return model, toks, p2, p3


def _spark_model3(spark):
    from backend_big_data_spark.text.kneser_ney import kn_trigram_model

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    return {
        (r.w1, r.w2, r.w3): (r.c123, Fraction(r.kn_num, r.kn_den))
        for r in kn_trigram_model(df).collect()
    }


def test_trigram_model_matches_exact_reference(spark):
    got = _spark_model3(spark)
    want, _, _, _ = _ref3(CORPUS)
    assert got == want and got


def test_trigram_normalization_sums_to_one_per_context(spark):
    """Order-3 identity: for every seen context (w1, w2),
    Σ_w3 P3(w3|w1 w2) over the WHOLE vocabulary equals 1 exactly —
    unseen trigrams contribute through the recursive backoff chain
    (D·λ3·P2, itself backing off through D·λ2·P1). Any discount or
    continuation-count slip at ANY of the three orders breaks this."""
    got = _spark_model3(spark)
    want, toks, p2, p3 = _ref3(CORPUS)
    vocab = {w for t in toks.values() for w in t}
    contexts = {(a, b) for (a, b, _) in got}
    for a, b in contexts:
        total = Fraction(0)
        for c in vocab:
            if (a, b, c) in got:
                total += got[(a, b, c)][1]
            else:
                total += p3(a, b, c)
        assert total == 1, ((a, b), total)


def test_trigram_doc_nll_fixed_point_matches_reference(spark):
    from backend_big_data_spark.text.kneser_ney import kn3_doc_nll

    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_trigrams, r.nll_fp) for r in kn3_doc_nll(df).collect()
    }
    model, toks, _, _ = _ref3(CORPUS)
    for i, t in toks.items():
        fps = []
        for k in zip(t, t[1:], t[2:]):
            p = model[k][1]
            fps.append(
                math.floor(
                    (math.log(p.numerator) - math.log(p.denominator)) * 10_000
                    + 0.5
                )
            )
        assert got[i] == (len(fps), -sum(fps)), i


def test_trigram_external_model_oov_poisons_to_null(spark):
    from backend_big_data_spark.text.kneser_ney import kn3_doc_nll

    train = spark.createDataFrame(CORPUS, "doc_id long, text string")
    score = spark.createDataFrame(
        [
            (10, "san francisco san francisco san"),
            (11, "totally unseen words here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.nll_fp
        for r in kn3_doc_nll(score, model_df=train).collect()
    }
    assert got[10] is not None
    assert got[11] is None


def test_trigram_short_docs_emit_no_row(spark):
    from backend_big_data_spark.text.kneser_ney import kn3_doc_nll

    df = spark.createDataFrame(
        CORPUS + [(99, "two words")], "doc_id long, text string"
    )
    got = {r.doc_id for r in kn3_doc_nll(df).collect()}
    assert 99 not in got and {1, 2, 3} <= got


def test_overflow_guard_raises_instead_of_wrapping(spark):
    """The exact-fraction engine must never emit a WRAPPED (wrong)
    fraction: Spark 4's default ANSI arithmetic raises
    ARITHMETIC_OVERFLOW when a count table's products exceed int64 —
    this test pins that contract through the real model builders (if a
    future session config disabled ANSI, fractions would silently wrap
    and this test would catch it)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import (
        ArithmeticException,
        PySparkRuntimeError,
        SparkRuntimeException,
    )

    from backend_big_data_spark.text.kneser_ney import (
        kn_bigram_model_from_counts,
        kn_trigram_model_from_counts,
    )

    big = 1 << 50
    # |vocab| rows with huge counts: c1 = 2^50, cont_total = 4000, so
    # 4·c1·cont_total ≈ 2^64 — past the 2^62 guard on both orders
    rows = [(f"w{i}", f"w{(i + 1) % 4000}", big) for i in range(4000)]
    c12 = spark.createDataFrame(rows, "w1 string, w2 string, c12 long")
    with pytest.raises(
        (
            ArithmeticException,
            Py4JJavaError,
            PySparkRuntimeError,
            SparkRuntimeException,
        ),
        match="(?i)overflow",
    ):
        kn_bigram_model_from_counts(c12).collect()

    rows3 = [
        (f"w{i}", f"w{(i + 1) % 4000}", f"w{(i + 2) % 4000}", big)
        for i in range(4000)
    ]
    c123 = spark.createDataFrame(
        rows3, "w1 string, w2 string, w3 string, c123 long"
    )
    with pytest.raises(
        (
            ArithmeticException,
            Py4JJavaError,
            PySparkRuntimeError,
            SparkRuntimeException,
        ),
        match="(?i)overflow",
    ):
        kn_trigram_model_from_counts(c123).collect()
