"""KMV (k-minimum-values) distinct-count sketches — the mergeable,
EXACTLY-REPLAYABLE sketch family (Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream"; Beyer et al. SIGMOD'07 for the
unbiased estimator and the set-operation algebra).

Why next to the DataSketches HLL rollups (`events_hll_user_rollup`):
HLL estimates are implementation-defined, so those rows are rows-only in
the correctness gate. A KMV sketch is just *the k smallest values of a
deterministic hash* — any SQL engine reproduces it bit-for-bit, so every
readout here is hash-oracle-gated like the exact queries, AND the sketch
supports the set-operation algebra HLL lacks: the k smallest of a union
are computable from the per-set sketches alone, and Jaccard/intersection
estimates fall out of sketch membership — the audience/source-overlap
question at 100 TB without an exact fingerprint join.

Estimator: with h uniform on [1, 2⁶⁰] (the repo's `stable_hash`
md5-60bit) and m_k the kth smallest of D distinct hashes,
D̂ = ⌊(k−1)·2⁶⁰ / m_k⌋; a sketch holding fewer than k values IS its
exact distinct set (the standard small-set convention — exact, not an
estimate). (k−1)·2⁶⁰ and the hash values are each exactly representable
(or identically rounded) doubles, and IEEE division + floor are
correctly rounded in every engine, so the fixed-point estimate replays
bit-for-bit — no HUGEINT needed. For two sets the union sketch is the
k smallest of the merged sketches, Ĵ = |{x ∈ U : x ∈ A ∧ x ∈ B}| / |U|
(error O(1/√k)), and |A ∩ B| ≈ Ĵ · D̂(U).

Scale shape: the ONLY corpus-sized work is a map-side hash + threshold
filter. ``prefilter`` (an integer hash ceiling) keeps the expected
survivors per group at O(prefilter/2⁶⁰ · D) — the k-smallest selection
then runs a keyed window over that bounded survivor frame, never over
the entity dimension (the B6 discipline; an unfiltered per-group window
over distinct hashes would funnel each group's full cardinality through
one task — the unfiltered mode exists for small/interactive groups and
says so). Correctness is unconditional: the k smallest survive ANY
prefilter ≥ m_k, and the sketch column RAISES at evaluation when a
group's survivor count falls below k while the filter was armed (the
sizing-rule refusal discipline — silence would bias the estimate;
loudness costs a re-run with a higher ceiling, chosen from any coarse
cardinality floor such as an HLL pass or table statistics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from backend_big_data_spark.text.sampling import stable_hash

#: Hash domain size: `stable_hash` md5 keeps 15 hex chars = 60 bits.
HASH_DOMAIN = 1 << 60


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    k: int = 64,
    prefilter: int | None = None,
) -> DataFrame:
    """One row per group: ``(group_cols..., sketch array<long>, n_seen
    long)`` where ``sketch`` holds the k smallest distinct 60-bit hashes
    of ``value`` (ascending) and ``n_seen`` the group's survivor-distinct
    count (= the exact distinct count when no prefilter is armed).

    ``prefilter``: integer hash ceiling — rows with hash ≥ ceiling drop
    MAP-SIDE before the distinct shuffle, so the keyed window that picks
    the k smallest runs over O(D·prefilter/2⁶⁰) rows per group instead
    of the group's full cardinality. Starvation (a group with fewer than
    k survivors while armed) poisons the sketch column with
    ``raise_error`` — loud at first evaluation, never a silent bias.
    Arm it only for groups known to hold ≥ k·2⁶⁰/prefilter distinct
    values (in expectation, with margin)."""
    h = stable_hash(value)
    hashed = df.select(*group_cols, h.alias("__h"))
    if prefilter is not None:
        hashed = hashed.filter(F.col("__h") < F.lit(int(prefilter)))
    distinct = hashed.groupBy(*group_cols, "__h").agg(F.lit(1).alias("__one"))
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = (
        distinct.withColumn("__r", F.row_number().over(w))
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.when(F.col("__r") <= k, F.col("__h")))
            ).alias("sketch"),
            F.count(F.lit(1)).alias("n_seen"),
        )
    )
    if prefilter is not None:
        # The guard must see groups the filter STARVED TO ZERO (no
        # surviving row ⇒ no sketch row to poison), so it anchors on the
        # unfiltered group universe — one extra map-side-combined
        # distinct over the group columns, the price of a loud contract.
        universe = df.select(*group_cols).distinct()
        topk = universe.join(topk, group_cols, "left")
        healthy = F.col("n_seen").isNotNull() & (F.col("n_seen") >= F.lit(k))
        topk = topk.withColumn(
            "sketch",
            F.when(healthy, F.col("sketch")).otherwise(
                F.raise_error(
                    F.lit(
                        f"KmvPrefilterStarved: a group has fewer than {k} "
                        f"survivors under prefilter={int(prefilter)}; raise "
                        "the ceiling"
                    )
                )
            ),
        ).withColumn("n_seen", F.coalesce(F.col("n_seen"), F.lit(0)))
    return topk


def kmv_estimate(sketch: Column, k: int = 64) -> Column:
    """Distinct-count estimate from a sketch as a BIGINT:
    ⌊(k−1)·2⁶⁰ / m_k⌋ when the sketch is full, else the exact element
    count (small-set convention). Double arithmetic on identical
    operands — bit-identical cross-engine (see module docstring).

    ``stable_hash``'s range is [0, 2⁶⁰), so hash value 0 is in-domain —
    but a sketch holds DISTINCT hashes sorted ascending, so a full
    sketch's kth slot can be 0 only when every slot is 0, i.e. only in
    the degenerate k=1 configuration (probability 2⁻⁶⁰ per group). A
    zero divisor would yield Infinity and a silent garbage estimate;
    consistent with the starvation guard, it raises instead."""
    m_k = F.element_at(sketch, k).cast("double")
    return (
        F.when(
            F.size(sketch) >= F.lit(k),
            F.when(
                m_k > 0.0,
                F.floor(F.lit(float((k - 1) * HASH_DOMAIN)) / m_k),
            ).otherwise(
                F.raise_error(
                    F.lit(
                        "KmvDegenerateSketch: kth minimum hash is 0 "
                        "(k=1 with hash value 0); estimate undefined"
                    )
                )
            ),
        )
        .otherwise(F.size(sketch))
        .cast("long")
    )


def kmv_union_sketch(a: Column, b: Column, k: int = 64) -> Column:
    """The union's KMV sketch from two per-set sketches alone: k smallest
    of the merged distinct hashes — sketches are closed under union
    (Beyer et al.), which is what lets per-source sketches answer any
    cross-source question without revisiting data."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_jaccard_fp(
    a: Column, b: Column, k: int = 64, scale: int = 10_000
) -> Column:
    """Fixed-point Jaccard estimate from two sketches as a BIGINT:
    ⌊scale · |U ∩ A ∩ B| / |U|⌋ where U is the union sketch — exact
    small-integer arithmetic, no float crosses an engine. NULL when both
    sketches are empty (two empty sets have no defined Jaccard; an
    unguarded division would ANSI-raise)."""
    u = kmv_union_sketch(a, b, k)
    both = F.size(F.array_intersect(F.array_intersect(u, a), b))
    return F.when(
        F.size(u) > 0,
        F.floor((both * F.lit(scale)).cast("double") / F.size(u)),
    ).cast("long")


def kmv_merge(sketches: Column, k: int = 64) -> Column:
    """Merge an ARRAY OF SKETCHES (e.g. ``collect_list(sketch)`` over
    per-batch or per-shard sketch rows) into one: k smallest of the
    distinct union — the N-way form of :func:`kmv_union_sketch`, and the
    reason maintained per-batch sketch rows ARE an incremental distinct
    counter: merging the sidecar rows equals sketching the full corpus,
    exactly (closure under union), so a streaming ingest can append one
    k-array per (group, batch) and any window of batches folds in O(k·N)
    with no corpus rescan."""
    return F.slice(
        F.array_sort(
            F.array_distinct(F.flatten(sketches))
        ),
        1,
        k,
    )


__all__ = [
    "HASH_DOMAIN",
    "kmv_estimate",
    "kmv_jaccard_fp",
    "kmv_merge",
    "kmv_sketch",
    "kmv_union_sketch",
]
