"""Temporal join operators Spark lacks as built-ins: as-of join and range
(interval) join.

The reference has no temporal joins at all (SURVEY.md §2.3 — "Absent from
the reference: ... range, as-of, interval joins"); these are additive scope,
implemented as compositions of existing DataFrame ops so Catalyst/Tungsten
still owns execution:

- ``asof_join``: the union + partitioned-window formulation — ONE shuffle on
  the key, a per-partition sort, zero row explosion. This is the scalable
  shape: a naive ``left.join(right, key & right_ts <= left_ts)`` + argmax
  explodes to O(|matches|) intermediate rows; the window formulation is
  O(left + right) regardless of time density.
- ``range_join_pairs``: equi-join on (key, time-bucket) with the left side
  exploded to the two candidate buckets, then the exact range predicate.
  Spark would otherwise plan key-equi + range as an equi-join with the range
  as a post-filter, which is fine — bucketing additionally bounds the
  per-task candidate set when a single key is hot (one user with millions of
  events meets only its ±1-bucket neighborhood, not its full history).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` sharing the ``on`` key (inner semantics: left
    rows with no prior right row are dropped — matching DuckDB ``ASOF
    JOIN``).

    ``right_cols`` maps right column → output alias. Implementation: tag
    sides, align schemas with ``unionByName(allowMissingColumns=True)``
    (absent columns become typed nulls), then one window per key ordered by
    (ts, side) — right rows sort before left rows at equal timestamps so the
    ``<=`` bound is inclusive — carrying the last non-null right payload
    forward. Ties among right rows at the same timestamp resolve to the one
    with the greatest ``right_ts`` tiebreak column order (deterministic for
    unique (key, ts) right streams).
    """
    on = list(on)
    lsel = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    rsel = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c).alias(a) for c, a in right_cols.items()]).alias("__rpay"),
    )
    unioned = lsel.unionByName(rsel, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__rpay", ignorenulls=True).over(w))
    out = matched.filter((F.col("__is_left") == 1) & F.col("__match").isNotNull())
    return out.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{a}").alias(a) for a in right_cols.values()],
    )


def range_join_pairs(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    right_cols: dict[str, str],
) -> DataFrame:
    """Inner range join: pairs where ``left_ts - window <= right_ts <
    left_ts`` and the ``on`` keys match (the "events in the preceding
    window" shape).

    Bucket width == window width, so every qualifying right row lives in the
    left row's bucket or the one before it; the left side is exploded to
    those two candidate buckets and the join is a plain equi-join on
    (key..., bucket) with the exact µs-precision predicate applied after.
    Shuffle volume: 2·|left| + |right| rows keyed by (key, bucket) — no
    per-key cross product.
    """
    on = list(on)
    span_us = F.lit(int(window_seconds) * 1_000_000)
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    lb = left.withColumn("__lus", l_us).withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(F.col("__lus") / span_us),
                F.floor(F.col("__lus") / span_us) - 1,
            )
        ),
    )
    rb = right.select(
        *on,
        r_us.alias("__rus"),
        F.floor(r_us / span_us).alias("__bucket"),
        *[F.col(c).alias(a) for c, a in right_cols.items()],
    )
    joined = lb.join(rb, on=[*on, "__bucket"], how="inner").filter(
        (F.col("__rus") < F.col("__lus"))
        & (F.col("__rus") >= F.col("__lus") - span_us)
    )
    return joined.select(*left.columns, *right_cols.values())
