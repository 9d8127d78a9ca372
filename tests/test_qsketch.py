"""Bottom-k-by-hash quantile sketch (`operators/qsketch.py`):
merge-losslessness, small-set exactness, the armed-prefilter refusal,
and cross-run determinism of the sampled multiset."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from backend_big_data_spark.operators.qsketch import (
    HASH_DOMAIN,
    bottomk_sample,
    merge_samples,
    sample_prefilter,
    sample_quantiles,
)

K = 16


def _h(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _df(spark, n, batches=1):
    rows = [(i, i % batches, float(i * 7 % 1000)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, b int, v double")


def test_sample_is_k_hash_smallest(spark):
    df = _df(spark, 200)
    samp = bottomk_sample(df, [], F.col("id"), F.col("v"), k=K)
    got = sorted(r["__h"] for r in samp.collect())
    want = sorted(_h(i) for i in range(200))[:K]
    assert got == want


def test_small_set_sample_is_population_and_quantiles_exact(spark):
    df = _df(spark, 10)
    samp = bottomk_sample(df, [], F.col("id"), F.col("v"), k=K)
    assert samp.count() == 10
    est = {
        r["pct"]: r["est"]
        for r in sample_quantiles(samp, [], [50, 100]).collect()
    }
    vals = sorted(float(i * 7 % 1000) for i in range(10))
    assert est[50] == vals[4] and est[100] == vals[9]  # ceil(.5*10)=5th


def test_merge_equals_direct(spark):
    """Bottom-k sketches are closed under union: per-batch samples
    re-merged must equal the single-pass sample EXACTLY."""
    df = _df(spark, 500, batches=5)
    per_batch = bottomk_sample(df, ["b"], F.col("id"), F.col("v"), k=K)
    merged = merge_samples(per_batch.drop("b"), [], k=K)
    direct = bottomk_sample(df, [], F.col("id"), F.col("v"), k=K)
    m = sorted((r["__h"], r["__k"], r["val"]) for r in merged.collect())
    d = sorted((r["__h"], r["__k"], r["val"]) for r in direct.collect())
    assert m == d


def test_prefilter_preserves_sample_when_not_starved(spark):
    """Any ceiling admitting >= k rows leaves the bottom-k unchanged."""
    df = _df(spark, 400)
    hs = sorted(_h(i) for i in range(400))
    ceiling = hs[4 * K]  # admits exactly 4k survivors
    with_f = bottomk_sample(
        df, [], F.col("id"), F.col("v"), k=K, prefilter=ceiling
    )
    without = bottomk_sample(df, [], F.col("id"), F.col("v"), k=K)
    assert sorted(r["__h"] for r in with_f.collect()) == sorted(
        r["__h"] for r in without.collect()
    )


def test_armed_starvation_raises(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = _df(spark, 400)
    hs = sorted(_h(i) for i in range(400))
    ceiling = hs[K // 2]  # admits only k/2 survivors: starved
    samp = bottomk_sample(
        df, [], F.col("id"), F.col("v"), k=K, prefilter=ceiling
    )
    with pytest.raises(SparkRuntimeException, match="QuantileSampleStarved"):
        samp.collect()


def test_armed_total_starvation_raises(spark):
    """Zero-survivor regression (r11 ADVICE): a ceiling of 1 admits NO
    rows, so the old sample-anchored guard had no row to carry the
    error and the group silently vanished. The sentinel-union guard
    must raise even when the surviving sample is empty."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = _df(spark, 400)
    samp = bottomk_sample(df, [], F.col("id"), F.col("v"), k=K, prefilter=1)
    with pytest.raises(SparkRuntimeException, match="QuantileSampleStarved"):
        samp.collect()


def test_armed_grouped_total_starvation_raises(spark):
    """Grouped form of the zero-survivor hole: one group fully starved
    while the others survive must still raise, not silently disappear
    from the per-group sample."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = _df(spark, 300, batches=3)
    # ceiling admitting >= k survivors for every group would need the
    # per-group kth hash; ceiling=1 starves all three groups to zero.
    samp = bottomk_sample(
        df, ["b"], F.col("id"), F.col("v"), k=K, prefilter=1
    )
    with pytest.raises(SparkRuntimeException, match="QuantileSampleStarved"):
        samp.collect()


def test_sample_prefilter_sizing_rule(spark):
    assert sample_prefilter(100, target=4096) is None  # small-set: disarm
    n = 1_000_000
    ceil = sample_prefilter(n, target=4096)
    assert ceil == (HASH_DOMAIN // n) * 4096
    # expected survivors ~ target, far above any k it will guard
    assert 4000 < n * ceil / HASH_DOMAIN <= 4096


def test_grouped_sample_partitions_independently(spark):
    df = _df(spark, 300, batches=3)
    samp = bottomk_sample(df, ["b"], F.col("id"), F.col("v"), k=K)
    by_b = {
        b: sorted(r["__h"] for r in samp.where(F.col("b") == b).collect())
        for b in (0, 1, 2)
    }
    for b in (0, 1, 2):
        want = sorted(_h(i) for i in range(300) if i % 3 == b)[:K]
        assert by_b[b] == want
