"""KMV sketches (`operators/kmv.py`): mergeability, estimator
contracts, and the armed-prefilter refusal."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from backend_big_data_spark.operators.kmv import (
    HASH_DOMAIN,
    kmv_estimate,
    kmv_jaccard_fp,
    kmv_sketch,
    kmv_union_sketch,
)

K = 8


def _h(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def _sketch_map(df):
    return {
        r["g"]: (list(r["sketch"]), r["n_seen"]) for r in df.collect()
    }


def test_sketch_is_k_smallest_distinct_hashes(spark):
    rows = [("a", v) for v in range(40)] + [("a", v) for v in range(10)]
    got, n = _sketch_map(kmv_sketch(_df(spark, rows), ["g"], F.col("v"), k=K))["a"]
    want = sorted(_h(v) for v in range(40))[:K]
    assert got == want and n == 40  # duplicates collapse


def test_small_set_is_exact(spark):
    rows = [("a", v) for v in range(5)]
    sk = kmv_sketch(_df(spark, rows), ["g"], F.col("v"), k=K)
    est = sk.select(kmv_estimate(F.col("sketch"), k=K).alias("e")).collect()
    assert est[0]["e"] == 5  # small-set convention: exact


def test_estimator_within_ksigma(spark):
    n = 5000
    rows = [("a", v) for v in range(n)]
    sk = kmv_sketch(_df(spark, rows), ["g"], F.col("v"), k=64)
    est = sk.select(kmv_estimate(F.col("sketch"), k=64).alias("e")).collect()[0]["e"]
    assert abs(est - n) / n < 4 / (64 ** 0.5)  # ~4 sigma of 1/sqrt(k)


def test_union_sketch_equals_sketch_of_union(spark):
    ra = [("a", v) for v in range(0, 60)]
    rb = [("b", v) for v in range(30, 90)]
    sk = _sketch_map(kmv_sketch(_df(spark, ra + rb), ["g"], F.col("v"), k=K))
    fused = (
        spark.createDataFrame(
            [(sk["a"][0], sk["b"][0])], "sa array<long>, sb array<long>"
        )
        .select(kmv_union_sketch(F.col("sa"), F.col("sb"), k=K).alias("u"))
        .collect()[0]["u"]
    )
    direct, _ = _sketch_map(
        kmv_sketch(
            _df(spark, [("u", v) for v in range(0, 90)]), ["g"], F.col("v"), k=K
        )
    )["u"]
    assert list(fused) == direct  # closed under union


def test_jaccard_exact_in_small_set_regime(spark):
    ra = [("a", v) for v in range(0, 6)]
    rb = [("b", v) for v in range(3, 9)]  # |A∩B|=3, |A∪B|=9
    sk = _sketch_map(kmv_sketch(_df(spark, ra + rb), ["g"], F.col("v"), k=16))
    j = (
        spark.createDataFrame(
            [(sk["a"][0], sk["b"][0])], "sa array<long>, sb array<long>"
        )
        .select(kmv_jaccard_fp(F.col("sa"), F.col("sb"), k=16).alias("j"))
        .collect()[0]["j"]
    )
    assert j == 10000 * 3 // 9


def test_armed_prefilter_starvation_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [("a", v) for v in range(1000)]  # plenty of survivors
    ok = kmv_sketch(
        _df(spark, rows), ["g"], F.col("v"), k=K, prefilter=HASH_DOMAIN // 2
    )
    assert len(_sketch_map(ok)["a"][0]) == K
    starved = kmv_sketch(
        _df(spark, rows[:20]), ["g"], F.col("v"), k=K,
        prefilter=HASH_DOMAIN // 1024,  # ~0.02 expected survivors
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="KmvPrefilterStarved"):
        starved.collect()


def test_jaccard_of_two_empty_sketches_is_null(spark):
    row = spark.createDataFrame(
        [([], [])], "sa array<long>, sb array<long>"
    ).select(kmv_jaccard_fp(F.col("sa"), F.col("sb"), k=8).alias("j"))
    assert row.collect()[0]["j"] is None  # defined-NULL, not an ANSI raise


def test_degenerate_zero_kth_minimum_raises(spark):
    """A full sketch whose kth slot is hash 0 (only possible at k=1 with
    hash value 0 landing — distinct ascending hashes make it impossible
    for k>=2) must raise, not emit the Infinity-floor garbage estimate."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([([0],)], "sketch array<long>")
    with pytest.raises(SparkRuntimeException, match="KmvDegenerateSketch"):
        df.select(kmv_estimate(F.col("sketch"), k=1).alias("e")).collect()


def test_nonzero_kth_minimum_unaffected_by_guard(spark):
    """The zero guard must not change any estimate on the in-contract
    path: a hand-built full sketch replays the closed-form floor."""
    sk = [HASH_DOMAIN // 100, HASH_DOMAIN // 50, HASH_DOMAIN // 10]
    df = spark.createDataFrame([(sk,)], "sketch array<long>")
    got = df.select(kmv_estimate(F.col("sketch"), k=3).alias("e")).collect()
    assert got[0]["e"] == (2 * HASH_DOMAIN) // (HASH_DOMAIN // 10)
