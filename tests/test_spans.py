"""Semantics tests for duplicate-span removal (text/spans.py) beyond the
oracle-parity gate (doc_duplicate_spans is hash-checked vs DuckDB at
sf0.001/sf0.01)."""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_big_data_spark.text.spans import (
    duplicate_span_profile,
    positional_kgrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_shared_prefix_removed_from_both(spark):
    shared = "a b c d e f g h"  # exactly k=8 tokens
    df = _docs(spark, [
        (1, shared + " one uniq tokens here now ok fine yes"),
        (2, shared + " two other suffix words go right here"),
        (3, "totally different content with no repeats at all whatsoever"),
    ])
    out = {r.doc_id: r for r in duplicate_span_profile(df, k=8).collect()}
    # the shared 8-gram occurs twice -> its 8 tokens scrubbed in BOTH docs
    assert out[1].n_removed == 8 and out[2].n_removed == 8
    assert out[1].clean_text == "one uniq tokens here now ok fine yes"
    assert out[2].clean_text == "two other suffix words go right here"
    assert out[3].n_removed == 0
    assert out[3].clean_text.startswith("totally different")


def test_self_repetition_within_one_doc_counts(spark):
    # the paper's self-repetition case: one doc looping an 8-token block —
    # the block's gram occurs twice IN THE SAME doc, so everything the two
    # occurrences cover is scrubbed
    block = "r1 r2 r3 r4 r5 r6 r7 r8"
    df = _docs(spark, [
        (1, block + " " + block),
        (2, "other words that appear nowhere else in this tiny corpus"),
    ])
    out = {r.doc_id: r for r in duplicate_span_profile(df, k=8).collect()}
    assert out[1].n_tokens == 16 and out[1].n_removed == 16
    assert out[1].clean_text == ""
    assert out[2].n_removed == 0


def test_doc_shorter_than_k_contributes_no_grams(spark):
    df = _docs(spark, [(1, "only seven tokens in this one here"),
                       (2, "only seven tokens in this one here")])
    # 7 tokens < k=8: no positional grams at all, even for exact twins
    assert positional_kgrams(df, 8).count() == 0
    out = {r.doc_id: r for r in duplicate_span_profile(df, k=8).collect()}
    assert out[1].n_removed == 0 and out[2].n_removed == 0


def test_overlapping_duplicated_spans_merge(spark):
    # a 9-token duplicated span = two overlapping duplicated 8-grams;
    # coverage must be the union (9 tokens), not 16
    span9 = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    df = _docs(spark, [
        (1, span9 + " tail alpha beta gamma delta epsilon zeta eta"),
        (2, span9 + " other end words without any shared gram run"),
    ])
    out = {r.doc_id: r for r in duplicate_span_profile(df, k=8).collect()}
    assert out[1].n_removed == 9 and out[2].n_removed == 9
    assert out[1].clean_text.startswith("tail alpha")


def test_plan_has_no_cartesian_or_python(spark):
    df = _docs(spark, [(1, "a b c d e f g h i"), (2, "a b c d e f g h j")])
    plan = duplicate_span_profile(df, k=8)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_eval_overlap_profile_strips_leaked_spans(spark):
    """A train doc sharing an 8-token span with the eval set loses exactly
    that span; clean train docs and sub-k overlaps are untouched."""
    from backend_big_data_spark.text.spans import eval_overlap_profile

    leak = "the quick brown fox jumps over the lazy"  # 8 tokens
    train = spark.createDataFrame(
        [
            (1, f"intro words {leak} trailing tail"),
            (2, "a fully clean document with original content only"),
            (3, "short overlap quick brown fox nothing more here"),  # 3 < k
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, f"eval question uses {leak} verbatim")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in eval_overlap_profile(train, eval_df, k=8).collect()}
    assert got[1].n_removed == 8
    assert got[1].clean_text == "intro words trailing tail"
    assert got[2].n_removed == 0 and got[3].n_removed == 0
    assert got[3].clean_text == train.collect()[2].text
