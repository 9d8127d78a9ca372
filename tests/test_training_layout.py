"""Training-data layout ops: stratified sampling, sequence packing,
decontamination. Cross-engine value parity is covered by
test_oracle_parity (doc_stratified_sample / doc_pack_sequences /
doc_contamination); these tests pin the SEMANTICS on hand-built inputs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from backend_big_data_spark.text.dedup import containment_vs_index
from backend_big_data_spark.text.sampling import (
    pack_sequences,
    stratified_hash_sample,
)


def _h(key) -> int:
    """Mirror of text/sampling.stable_hash (md5 family)."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)


def _docs(spark, n=200):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_rates_zero_and_full(spark):
    df = _docs(spark)
    out = stratified_hash_sample(
        df, F.col("doc_id"), "lang", {"en": 0, "de": 100}
    ).collect()
    assert all(r.lang == "de" for r in out)
    assert len(out) == 100  # every de row kept, every en row dropped


def test_stratified_matches_reference_hash_and_nests(spark):
    df = _docs(spark)
    got25 = {r.doc_id for r in stratified_hash_sample(
        df, F.col("doc_id"), "lang", {"en": 25}, default_pct=100
    ).collect()}
    expected = {
        i for i in range(200)
        if (i % 2 == 1) or (_h(i) % 100 < 25)
    }
    assert got25 == expected
    # nested thresholds: the 25% sample is a subset of the 50% sample
    got50 = {r.doc_id for r in stratified_hash_sample(
        df, F.col("doc_id"), "lang", {"en": 50}, default_pct=100
    ).collect()}
    assert got25 <= got50


def test_pack_sequences_matches_reference_layout(spark):
    rows = [(i, 7 + (i % 5)) for i in range(40)]  # token counts 7..11
    df = spark.createDataFrame(rows, "doc_id long, n_tok int")
    got = {
        r.doc_id: r.seq_id
        for r in pack_sequences(
            df, "n_tok", ctx_len=20, key=F.col("doc_id")
        ).collect()
    }
    order = sorted(range(40), key=lambda i: (_h(i), i))
    cum = 0
    expected = {}
    for i in order:
        expected[i] = cum // 20
        cum += 7 + (i % 5)
    assert got == expected


def test_pack_sequences_preserves_tokens_and_is_sharded(spark):
    rows = [(i, "s%d" % (i % 3), 5) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n_tok int")
    packed = pack_sequences(
        df, "n_tok", ctx_len=12, key=F.col("doc_id"), shard_col="shard"
    )
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.sum("n_tok").alias("tok")
    )
    # token mass is preserved and every shard starts its own stream at seq 0
    assert per_seq.agg(F.sum("tok")).collect()[0][0] == 60 * 5
    firsts = {
        r.shard: r.mn
        for r in packed.groupBy("shard").agg(F.min("seq_id").alias("mn")).collect()
    }
    assert firsts == {"s0": 0, "s1": 0, "s2": 0}


def test_hash_sample_is_consistent_across_tables(spark):
    """The claimed cross-table property of key-hash sampling (sampling.py
    module docstring): sampling documents and embeddings INDEPENDENTLY by
    the same shared key selects matching row sets — join the samples and
    nothing is lost on either side."""
    from backend_big_data_spark.sources.catalog import load_table
    from backend_big_data_spark.text.sampling import hash_sample

    sf = "/root/testdata/sf0.001"
    docs = hash_sample(
        load_table(spark, sf, "documents").select("doc_id"),
        F.col("doc_id"),
        20,
    )
    embs = hash_sample(
        load_table(spark, sf, "embeddings").select(
            F.col("vec_id").alias("doc_id")
        ),
        F.col("doc_id"),
        20,
    )
    d = {r.doc_id for r in docs.collect()}
    e = {r.doc_id for r in embs.collect()}
    shared = d & {r.vec_id for r in load_table(spark, sf, "embeddings")
                  .select("vec_id").collect()}
    assert shared == e  # same keys sampled on both tables
    assert 0 < len(d)


def test_incremental_dedup_planted_policy(spark):
    """Each removal rule exercised once: exact-vs-corpus, within-batch
    non-canonical, near-dup-vs-existing; within-batch NEAR dups are out of
    scope by contract (left to the batch pipelines)."""
    from backend_big_data_spark.text.dedup import incremental_dedup_kept

    docs = spark.createDataFrame(
        [
            (1, "aaa", False),   # corpus
            (2, "bbb", False),   # corpus
            (10, "aaa", True),   # exact dup of corpus doc 1 → removed
            (11, "ccc", True),   # batch canonical → kept
            (12, "ccc", True),   # within-batch exact dup of 11 → removed
            (13, "ddd", True),   # near-dup of corpus doc 2 → removed
            (14, "eee", True),   # clean → kept
            (15, "fff", True),   # near-dup of batch doc 14 → KEPT (contract)
        ],
        "doc_id long, text string, is_new boolean",
    )
    pairs = spark.createDataFrame(
        [(2, 13), (14, 15)], "doc_a long, doc_b long"
    )
    kept = incremental_dedup_kept(docs, F.col("is_new"), pairs)
    assert {r.doc_id for r in kept.collect()} == {11, 14, 15}


def test_containment_planted_fractions(spark):
    target = spark.createDataFrame(
        [(1, s) for s in ("a", "b", "c", "d")]
        + [(2, s) for s in ("a", "b")]
        + [(3, s) for s in ("x", "y")],
        "doc_id long, shingle string",
    )
    index = spark.createDataFrame(
        [("a",), ("c",), ("b",)], "shingle string"
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination)
        for r in containment_vs_index(target, index).collect()
    }
    assert got[1] == (4, 3, 0.75)   # a, b, c hit; d misses
    assert got[2] == (2, 2, 1.0)    # fully contained → leaked
    assert got[3] == (2, 0, 0.0)    # disjoint


def test_incremental_dedup_full_composition(spark):
    """All three removal classes at once, with the within-batch near-dup
    composition enabled: exact-vs-corpus, within-batch non-canonical,
    cross near-dup, AND a transitive within-batch near chain {14,15,16}
    (pairs 14~15, 15~16 only) that must keep exactly its min id."""
    from backend_big_data_spark.text.dedup import incremental_dedup_kept

    docs = spark.createDataFrame(
        [
            (1, "aaa", False),   # corpus
            (2, "bbb", False),   # corpus
            (10, "aaa", True),   # exact dup of corpus doc 1 → removed
            (11, "ccc", True),   # batch canonical → kept
            (12, "ccc", True),   # within-batch exact dup of 11 → removed
            (13, "ddd", True),   # near-dup of corpus doc 2 → removed
            (14, "eee", True),   # chain min → kept
            (15, "fff", True),   # near 14 → removed (component min is 14)
            (16, "ggg", True),   # near 15, never compared to 14 → removed
            (17, "hhh", True),   # clean → kept
        ],
        "doc_id long, text string, is_new boolean",
    )
    pairs = spark.createDataFrame(
        [(2, 13), (14, 15), (15, 16)], "doc_a long, doc_b long"
    )
    kept = incremental_dedup_kept(
        docs, F.col("is_new"), pairs, within_batch_near=True
    )
    assert {r.doc_id for r in kept.collect()} == {11, 14, 17}
    # default contract unchanged: without the flag the whole chain stays
    kept_default = incremental_dedup_kept(docs, F.col("is_new"), pairs)
    assert {r.doc_id for r in kept_default.collect()} == {11, 14, 15, 16, 17}


def test_containment_bloom_equivalence_and_plan(spark):
    """The Bloom pre-filter must be result-invariant (no false negatives)
    and must apply BEFORE the semi-join exchange — a pre-drop at the scan,
    not a post-shuffle filter."""
    import re

    rows = [(i, f"sh{i % 37}") for i in range(400)] + [(500, "only-miss")]
    target = spark.createDataFrame(rows, "doc_id long, shingle string")
    index = spark.createDataFrame(
        [(f"sh{i}",) for i in range(0, 37, 2)], "shingle string"
    )
    plain = containment_vs_index(target, index).collect()
    bloomed_df = containment_vs_index(target, index, bloom_bits=1 << 12)
    assert sorted(map(tuple, bloomed_df.collect())) == sorted(map(tuple, plain))

    plan = bloomed_df._jdf.queryExecution().executedPlan().toString()
    assert "getbit" in plan
    # tree prints parents first: the getbit filter (child side of the
    # semi-join) must sit BELOW the first shuffle exchange line, i.e. it
    # executes before rows reach the exchange
    lines = plan.splitlines()
    bloom_line = min(i for i, l in enumerate(lines) if "getbit" in l)
    exch = [i for i, l in enumerate(lines) if re.search(r"Exchange hashpartitioning", l)]
    assert exch and bloom_line > exch[0], (bloom_line, exch)


def test_shingle_bloom_no_false_negatives(spark):
    """Every indexed shingle must probe positive (the Bloom guarantee the
    equivalence rests on); absent keys mostly probe negative."""
    from backend_big_data_spark.text.dedup import (
        apply_bloom_prefilter,
        build_shingle_bloom,
    )

    index = spark.createDataFrame(
        [(f"gram-{i}",) for i in range(300)], "shingle string"
    )
    words = build_shingle_bloom(index, num_bits=1 << 13, num_hashes=3)
    probe = spark.createDataFrame(
        [(f"gram-{i}",) for i in range(600)], "shingle string"
    )
    hits = apply_bloom_prefilter(
        probe, words, F.col("shingle"), 1 << 13, 3
    ).collect()
    got = {r.shingle for r in hits}
    assert {f"gram-{i}" for i in range(300)} <= got      # zero false negatives
    fp = len(got) - 300
    assert fp < 60, f"false-positive rate too high: {fp}/300"


def test_bloom_merge_equals_union_build(spark):
    """Incremental maintenance contract: merging per-batch bitmaps equals
    building one bitmap over the union — exactly, not probabilistically —
    so ingest can absorb a batch without rescanning the at-rest corpus."""
    import pytest

    from backend_big_data_spark.text.dedup import (
        build_shingle_bloom,
        merge_blooms,
    )

    corpus = spark.createDataFrame(
        [(f"at-rest-{i}",) for i in range(200)], "shingle string"
    )
    batch = spark.createDataFrame(
        [(f"arriving-{i}",) for i in range(80)]
        + [(f"at-rest-{i}",) for i in range(50)],   # overlap is fine
        "shingle string",
    )
    kw = dict(num_bits=1 << 12, num_hashes=3)
    merged = merge_blooms(
        build_shingle_bloom(corpus, **kw), build_shingle_bloom(batch, **kw)
    )
    assert merged == build_shingle_bloom(corpus.unionByName(batch), **kw)
    with pytest.raises(ValueError, match="shapes differ"):
        merge_blooms(merged, merged[:-1])
