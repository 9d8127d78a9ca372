"""Skew-mitigation operators: salting for hot keys (SURVEY.md north-star
scale scope; the reference has no skew handling).

AQE's skew-join splitting covers most cases automatically (enabled in
session.py); salting is the explicit tool for the cases AQE can't fix —
a pre-aggregation whose single hot group overwhelms one reducer, or a
shuffle join against a side AQE won't split.

Both operators are semantics-preserving: results are identical to the
unsalted form (aggregation re-combines partials; the join replicates the
small side across salt replicas). Deterministic salts come from hashing a
unique column — no ``rand()``, so plans stay reproducible and retryable
(a retried task re-derives the same salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(unique_col: Column, n: int) -> Column:
    return F.pmod(F.xxhash64(unique_col), F.lit(n)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    unique_col: Column,
    num_salts: int = 16,
    combiners: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-phase aggregation with salted first phase.

    Phase 1 groups by (keys…, salt) — a hot key spreads over ``num_salts``
    reducers; phase 2 re-combines per key. ``aggs`` maps output name →
    phase-1 aggregate; ``combiners`` maps the same names → phase-2
    re-combination of the partials (default: ``F.sum`` — correct for
    count/sum; pass ``F.min``/``F.max`` etc. for others).

    Note Spark's own partial aggregation already does map-side combine —
    salting matters when the DISTRIBUTION of reduce work is the problem
    (one group ≫ others), which map-side combine alone doesn't fix for
    high-cardinality payloads (e.g. collect-like or distinct aggregates).
    """
    keys = list(keys)
    phase1 = (
        df.withColumn("__salt", _salt(unique_col, num_salts))
        .groupBy(*keys, "__salt")
        .agg(*[v.alias(k) for k, v in aggs.items()])
    )
    comb = combiners or {}
    return phase1.groupBy(*keys).agg(
        *[
            (comb[k] if k in comb else F.sum(F.col(k))).alias(k)
            for k in aggs
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    unique_col: Column,
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: the skewed side gets a
    deterministic salt, the small side is replicated ``num_salts`` times
    (explode), and the join key becomes (keys…, salt) — hot keys spread
    over ``num_salts`` tasks. Cost: |small| × num_salts extra rows, which
    is why the replicated side must be the small one."""
    on = list(on)
    left = skewed.withColumn("__salt", _salt(unique_col, num_salts))
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return left.join(right, on=[*on, "__salt"]).drop("__salt")
