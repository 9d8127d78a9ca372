"""Unit tests: scalar/text column functions + text-analysis operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_big_data_spark.functions.scalars import bucketize, haversine_km, photo_url
from backend_big_data_spark.functions.textfns import (
    bpe_token_count,
    char_shingles,
    tokens,
    word_shingles,
)
from backend_big_data_spark.text.dedup import (
    doc_shingles,
    exact_dedup_fingerprints,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from backend_big_data_spark.text.langid import predict_lang
from backend_big_data_spark.text.quality import quality_profile


def test_haversine_paris_london(spark):
    df = spark.createDataFrame([(48.8566, 2.3522, 51.5074, -0.1278)], "a double, b double, c double, d double")
    (km,) = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0]
    assert abs(km - 343.5) < 2.0  # great-circle Paris-London ≈ 343-344 km


def test_photo_url_format(spark):
    df = spark.createDataFrame([("9", "srv", "123", "sec")], "f string, s string, i string, x string")
    (url,) = df.select(photo_url(F.col("f"), F.col("s"), F.col("i"), F.col("x")).alias("u")).collect()[0]
    assert url == "https://farm9.staticflickr.com/srv/123_sec.jpg"


def test_bucketize_edges(spark):
    df = spark.createDataFrame([(i,) for i in [0, 49, 50, 149, 150]], "x int")
    out = df.select("x", bucketize(F.col("x"), [50, 150], ["s", "m", "l"]).alias("b"))
    assert {(r.x, r.b) for r in out.collect()} == {
        (0, "s"), (49, "s"), (50, "m"), (149, "m"), (150, "l"),
    }


def test_shingles_and_tokens(spark):
    df = spark.createDataFrame([("  a b  c d ",), ("x y",), ("",)], "text string")
    out = df.select(
        tokens(F.col("text")).alias("t"),
        word_shingles(tokens(F.col("text")), 3).alias("w3"),
        char_shingles(F.col("text"), 5).alias("c5"),
        bpe_token_count(F.col("text")).alias("bpe"),
    ).collect()
    assert out[0].t == ["a", "b", "c", "d"]
    assert out[0].w3 == ["a b c", "b c d"]
    assert out[1].w3 == []  # shorter than n → empty, not null
    assert out[1].bpe == 2
    assert len(out[0].c5) > 0 and out[2].c5 == []


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], "doc_id long, text string"
    )
    rows = exact_dedup_fingerprints(df).collect()
    by_canon = {r.canonical_doc_id: r.dup_count for r in rows}
    assert by_canon == {1: 2, 3: 1}


def _near_dup_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    mutated = base.replace("today", "tonight")
    other = "completely different words about spark partitions and shuffle behavior entirely"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, mutated), (4, other)], "doc_id long, text string"
    )


def test_minhash_lsh_finds_near_dups(spark):
    docs = _near_dup_corpus(spark)
    for hash_fn in ("md5", "xxhash64"):
        sigs = minhash_signatures(doc_shingles(docs), 16, hash_fn)
        pairs = {(r.doc_a, r.doc_b): r.est_jaccard for r in
                 lsh_candidate_pairs(sigs, 16, 4, hash_fn).collect()}
        assert pairs[(1, 2)] == 1.0  # identical docs: all minhashes agree
        assert (1, 3) in pairs and pairs[(1, 3)] > 0.5  # near-dup caught
        assert not any(4 in p for p in pairs)  # unrelated doc never a candidate


def test_ngram_jaccard_exact_values(spark):
    docs = _near_dup_corpus(spark)
    pairs = {(r.doc_a, r.doc_b): (r.intersection_size, r.jaccard)
             for r in ngram_jaccard_pairs(doc_shingles(docs), 0.2).collect()}
    assert pairs[(1, 2)][1] == 1.0
    # base: 15 tokens → 13 3-shingles; the final token appears only in the
    # last window, so mutating it changes 1 shingle: inter=12,
    # union=13+13-12=14 → 12/14
    inter, jac = pairs[(1, 3)]
    assert inter == 12 and abs(jac - 12 / 14) < 1e-4


def test_simhash_properties(spark):
    docs = _near_dup_corpus(spark)
    sigs = {r.doc_id: r.simhash_hex for r in simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]  # identical text → identical signature
    ham_near = bin(int(sigs[1], 16) ^ int(sigs[3], 16)).count("1")
    ham_far = bin(int(sigs[1], 16) ^ int(sigs[4], 16)).count("1")
    assert ham_near < ham_far  # near-dup closer in Hamming space


def test_langid_real_sentences(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on a mat and it is happy"),
            (2, "el gato que vive en la casa de un amigo"),
            (3, "der hund und die katze sind nicht da"),
            (4, "xyz qrs tuv"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.p for r in df.select("doc_id", predict_lang(F.col("text")).alias("p")).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_quality_profile_hand_computed(spark):
    df = spark.createDataFrame([(1, "the cat the cat")], "doc_id long, text string")
    r = quality_profile(df).collect()[0]
    assert (r.n_chars, r.n_tokens, r.n_distinct_tokens) == (15, 4, 2)
    assert r.chars_no_ws == 12 and r.bpe_tokens == 4
    assert r.stopword_hits == 2  # 'the' twice
    assert r.avg_token_len == 3.0 and r.ttr == 0.5 and r.stopword_ratio == 0.5


def test_lsh_verified_pairs_subset_and_threshold(spark):
    from backend_big_data_spark.text.dedup import lsh_verified_pairs

    docs = _near_dup_corpus(spark)
    out = {(r.doc_a, r.doc_b): (r.est_jaccard, r.jaccard)
           for r in lsh_verified_pairs(doc_shingles(docs), 0.5).collect()}
    # identical pair and near-dup pair survive; unrelated doc 4 never appears
    assert (1, 2) in out and out[(1, 2)][1] == 1.0
    assert (1, 3) in out and 0.5 <= out[(1, 3)][1] < 1.0
    assert not any(4 in p for p in out)
    # exact stage is authoritative: every emitted jaccard meets threshold
    assert all(j >= 0.5 for _, j in out.values())


def test_token_chunks_windows_and_overlap(spark):
    toks = [f"t{i}" for i in range(100)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    from backend_big_data_spark.functions.textfns import token_chunks

    out = df.select(
        F.explode(token_chunks(tokens(F.col("text")), 10, 2)).alias("c")
    ).select("c.chunk_idx", "c.chunk").collect()
    chunks = {r.chunk_idx: r.chunk.split() for r in out}
    # step = 8: chunk i covers tokens [8i, 8i+10)
    assert chunks[0] == toks[0:10]
    assert chunks[1] == toks[8:18]          # 2-token overlap with chunk 0
    assert chunks[len(chunks) - 1][-1] == "t99"  # tail covered
    starts = sorted(int(c[0][1:]) for c in chunks.values())
    assert starts == list(range(0, 98, 8))


def test_udtf_chunker_matches_column_impl(spark):
    """Python UDTF (Spark 4) twin of token_chunks — same output, different
    execution path (per-row Python generator vs JVM array exprs)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string")
    class Chunker:
        def eval(self, text: str):
            toks = text.split()
            step = 10 - 2
            i = 0
            start = 0
            while start < max(len(toks) - 2, 1):
                yield i, " ".join(toks[start : start + 10])
                i += 1
                start += step

    toks = [f"w{i}" for i in range(37)]
    df = spark.createDataFrame([(" ".join(toks),)], "text string")
    df.createOrReplaceTempView("chunk_src")
    spark.udtf.register("chunker", Chunker)
    via_udtf = {
        (r.chunk_idx, r.chunk)
        for r in spark.sql(
            "SELECT c.* FROM chunk_src, LATERAL chunker(text) c"
        ).collect()
    }
    from backend_big_data_spark.functions.textfns import token_chunks

    via_expr = {
        (r.chunk_idx, r.chunk)
        for r in df.select(
            F.explode(token_chunks(tokens(F.col("text")), 10, 2)).alias("c")
        ).select("c.chunk_idx", "c.chunk").collect()
    }
    assert via_udtf == via_expr and len(via_expr) > 1


def test_hash_sampling_stability_and_consistency(spark):
    from backend_big_data_spark.text.sampling import (
        deterministic_shuffle,
        hash_sample,
        hash_split,
    )

    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    s1 = {r.doc_id for r in hash_sample(df, F.col("doc_id"), 10).collect()}
    s2 = {r.doc_id for r in hash_sample(df, F.col("doc_id"), 10).collect()}
    assert s1 == s2 and 50 < len(s1) < 200     # stable, ~10%
    s20 = {r.doc_id for r in hash_sample(df, F.col("doc_id"), 20).collect()}
    assert s1 < s20                             # nested: 10% ⊂ 20%
    # split is a partition of the data, stable under growth
    splits = {r.doc_id: r.split for r in hash_split(df, F.col("doc_id")).collect()}
    bigger = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    splits2 = {r.doc_id: r.split for r in hash_split(bigger, F.col("doc_id")).collect()}
    assert all(splits2[k] == v for k, v in splits.items())  # no reassignment
    counts = {}
    for v in splits.values():
        counts[v] = counts.get(v, 0) + 1
    assert set(counts) == {"train", "val", "test"} and counts["train"] > 600
    # deterministic shuffle: same order both runs, decorrelated from id order
    o1 = [r.doc_id for r in deterministic_shuffle(df, F.col("doc_id")).collect()]
    o2 = [r.doc_id for r in deterministic_shuffle(df, F.col("doc_id")).collect()]
    assert o1 == o2 and o1 != sorted(o1)


def test_arrow_optimized_python_udf_matches_row_udf(spark):
    """Spark 4 Arrow-optimized Python UDF (useArrow=True): same semantics
    as the classic pickled row UDF, vectorized Arrow transfer — the
    documented migration path for unavoidable scalar Python. (The engine's
    hot paths stay JVM-side; this pins the escape hatch's contract.)"""
    from pyspark.sql import functions as F

    def fold_case(s: str) -> str:
        return s.swapcase() if s else s

    arrow_udf = F.udf(fold_case, "string", useArrow=True)
    row_udf = F.udf(fold_case, "string", useArrow=False)
    df = spark.createDataFrame(
        [("MiXeD",), ("lower",), ("UPPER",), (None,)], "s string"
    )
    a = [r["a"] for r in df.select(arrow_udf("s").alias("a")).collect()]
    b = [r["b"] for r in df.select(row_udf("s").alias("b")).collect()]
    assert a == b == ["mIxEd", "LOWER", "upper", None]
    # and it composes inside ordinary column expressions
    out = df.select(F.upper(arrow_udf("s")).alias("u")).collect()
    assert [r["u"] for r in out] == ["MIXED", "LOWER", "UPPER", None]
