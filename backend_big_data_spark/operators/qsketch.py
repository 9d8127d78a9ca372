"""Mergeable quantile sketch — bottom-k-by-deterministic-hash uniform
row sample: the KMV discipline (`operators/kmv.py`) applied to order
statistics, completing the sketch triple (distinct counts ✓ KMV,
set-operation estimates ✓ KMV, quantiles ✓ here) for 100 TB corpus
monitoring.

Why not t-digest/KLL: those sketches' internals are implementation-
defined, so their readouts could only ever be rows-only at the
correctness gate. A bottom-k-by-hash sample is just *the k rows whose
60-bit md5 hash of a unique row key is smallest* (Rosén's order
sampling; Cohen & Kaplan's bottom-k sketches) — any SQL engine replays
it bit-for-bit (``row_number() OVER (ORDER BY h, key) <= k``), so the
ESTIMATES are hash-oracle-gated like the exact queries, and the sample
is a uniform simple random sample without replacement of the group's
rows, which makes the nearest-rank estimate on it an unbiased quantile
estimator with rank error O(1/√k).

Mergeability (the property t-digest buys with approximation and this
buys exactly): bottom-k sketches are closed under union — every element
of the union's bottom-k is in its own batch's bottom-k, so per-batch
sample rows merge LOSSLESSLY to the corpus sample: merge = re-take the
k hash-smallest of the concatenated per-batch samples. A streaming sink
can append k sample rows per batch and any reader recovers exactly the
single-pass sketch (see ``lineitem_quantile_sketch_merged``).

Scale shape: the only corpus-sized work is one map-side hash + threshold
filter (``prefilter``, the KMV adaptive-integer sizing rule) — the
bottom-k ``row_number`` window then runs over the expectation-bounded
survivor frame, never over the group's full row count. Starvation (a
group left with < k survivors while the filter was armed) raises at
evaluation instead of silently shrinking the sample.

Estimator: type-1 (nearest-rank) quantile of the sample — the value at
sorted position ⌈p·s⌉ of the s sample values. When s = n (the small-set
regime: group smaller than k, no prefilter) this is EXACTLY the
nearest-rank quantile of the group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from backend_big_data_spark.text.sampling import stable_hash

#: 60-bit hash domain (md5, 15 hex chars) — shared with operators/kmv.
HASH_DOMAIN = 1 << 60


def _part(group_cols: list[str]):
    """Window spec partitioned on the group columns, or GLOBAL when the
    sketch is corpus-wide ([]): the deliberately-unpartitioned windows
    here run over expectation-bounded survivor/sample frames (see module
    docstring) — the registry-wide boundedness gate in
    tests/test_plan_stability.py allowlists them by that argument."""
    return Window.partitionBy(*group_cols) if group_cols else Window



def sample_prefilter(n_floor: int, target: int = 4096) -> int | None:
    """Adaptive hash ceiling aiming the map-side filter at ``target``
    expected survivors, from an exact row-count floor ``n_floor`` —
    pure 64-bit integer arithmetic (``(2⁶⁰ // n) * target``) that a SQL
    twin replays verbatim (DuckDB ``//`` is the same floor division).
    Disarms (None) when the population doesn't exceed the target: tiny
    frames are the small-set regime where the sample is the population.
    """
    return (HASH_DOMAIN // n_floor) * target if n_floor > target else None


def bottomk_sample(
    df: DataFrame,
    group_cols: list[str],
    key: Column,
    value: Column,
    k: int = 1024,
    prefilter: int | None = None,
) -> DataFrame:
    """The k hash-smallest rows per group, as ROWS (not an opaque blob):
    ``(group_cols..., __h long, __k string, val)`` — __h the 60-bit hash
    of ``key``, __k the stringified key as the total-order tie-break
    (md5 collisions are ~2⁻⁶⁰ per pair but nonzero at corpus scale, and
    replayability demands a total order).

    ``key`` contract: it must be unique per row for a uniform row
    sample, AND it should FUNCTIONALLY DETERMINE ``value`` (i.e. embed
    the value in the key) so that even if two rows ever tie on the full
    key, they carry equal values and the sampled VALUE multiset stays
    deterministic whatever the physical tie resolution — rows tying on
    (h, key) with different values would make the sample
    engine/partitioning-dependent. (Learned the hard way: this synthetic
    lineitem does not keep (l_orderkey, l_linenumber) unique, and the
    resulting non-total order diverged across engines at sf0.01 only.)

    With ``prefilter`` armed, rows hash ≥ ceiling drop map-side before
    the shuffle, so the per-group bottom-k window runs over
    O(n·prefilter/2⁶⁰) survivors; the k smallest survive any ceiling
    that admits ≥ k rows, and a group starved below k while armed
    poisons its sample with ``raise_error`` (loud, never a silent
    narrow sample) — the same contract as `operators/kmv.kmv_sketch`.

    The guard counts survivors per group on the UNFILTERED frame (a
    conditional count with map-side combine — the shuffled guard frame
    is #groups·#partitions counter rows, never data) and UNIONS one
    raising sentinel row per starved group into the sample. Counting
    the surviving sample rows themselves (the r11 form) had a silent
    hole: a group starved to ZERO survivors left no row to carry the
    error and simply vanished from the sample (round-11 ADVICE). The
    sentinel exists independently of the survivors, so total
    starvation is just as loud as partial. Cost: the guard branch is a
    second scan of ``df`` column-pruned to (group, key) — acceptable
    for a loudness contract; callers that cannot afford it disarm the
    prefilter instead.
    """
    h = stable_hash(key)
    t = df.select(
        *group_cols,
        h.alias("__h"),
        key.cast("string").alias("__k"),
        value.alias("val"),
    )
    if prefilter is None:
        w = _part(group_cols).orderBy("__h", "__k")
        return (
            t.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .drop("__r")
        )
    ceiling = F.lit(int(prefilter))
    w = _part(group_cols).orderBy("__h", "__k")
    samp = (
        t.filter(F.col("__h") < ceiling)
        .withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )
    surv = t.groupBy(*group_cols).agg(
        F.coalesce(
            F.sum(F.when(F.col("__h") < ceiling, 1).otherwise(0)), F.lit(0)
        ).alias("__surv")
    )
    starved = surv.filter(F.col("__surv") < k).select(
        *group_cols,
        F.lit(-1).cast("long").alias("__h"),
        F.lit("").alias("__k"),
        F.raise_error(
            F.lit(
                f"QuantileSampleStarved: a group has fewer than {k} "
                f"survivors under prefilter={int(prefilter)}; raise "
                "the ceiling"
            )
        )
        .cast(dict(t.dtypes)["val"])
        .alias("val"),
    )
    return samp.unionByName(starved)


def sample_quantiles(
    samp: DataFrame,
    group_cols: list[str],
    pcts: list[int],
    est_col: str = "est",
) -> DataFrame:
    """Nearest-rank quantile estimates from a bottom-k sample frame:
    one row per (group, pct) with the sample value at sorted position
    ⌈pct·s/100⌉ (s = the group's sample size; total order by (val, __k)).
    The ordered window here runs over the SAMPLE — ≤ k rows per group by
    construction, bounded by config, never by data."""
    w = _part(group_cols).orderBy("val", "__k")
    ranked = samp.withColumn("__sr", F.row_number().over(w)).withColumn(
        "__s",
        F.count(F.lit(1)).over(
            _part(group_cols).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    marks = samp.sparkSession.createDataFrame([(p,) for p in pcts], "pct int")
    return (
        ranked.crossJoin(F.broadcast(marks))
        .where(
            F.col("__sr")
            == F.ceil(F.col("pct") * F.col("__s") / F.lit(100.0)).cast("long")
        )
        .select(*group_cols, "pct", F.col("val").alias(est_col))
    )


def merge_samples(
    samples: DataFrame, group_cols: list[str], k: int = 1024
) -> DataFrame:
    """Corpus sample from per-batch sample rows ALONE: re-take the k
    hash-smallest of the union. Lossless — every element of the union's
    bottom-k is in its own batch's bottom-k, so this equals the
    single-pass sketch of the concatenated batches (asserted by the
    merged-vs-direct registered query). Input ≤ k·n_batches rows; the
    window is bounded by config × batch count, not by data."""
    w = _part(group_cols).orderBy("__h", "__k")
    return (
        samples.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .drop("__r")
    )


__all__ = [
    "HASH_DOMAIN",
    "bottomk_sample",
    "merge_samples",
    "sample_prefilter",
    "sample_quantiles",
]
