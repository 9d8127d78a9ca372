"""Aggregation operators (SURVEY.md §2.4).

The reference's aggregations are all hash ``groupBy().agg()`` — those map
1:1 onto Spark and need no wrapper. What lives here are the patterns that
deserve a named, tested form: argmax-of-struct (A5), exact-decimal money
sums (so results are reproducible bit-for-bit across engines), and exact
percentiles (A7).

Scale: every groupBy here benefits from partial aggregation (map-side
combine) automatically; none of these force a Python round-trip.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def argmax_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_cols: Sequence[Column],
    payload: dict[str, Column],
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Row-with-max per group via ``max(struct(...))`` — the reference's A5
    idiom (``queries.py:316-320``: photo with max views per owner, tie-break
    by comments). One hash aggregate, no window, no self-join.

    ``order_cols`` define the (lexicographic) max; ``payload`` maps output
    column name → expression carried along with the winner. ``extra_aggs``
    adds ordinary aggregates (sum/count/...) computed in the SAME hash
    aggregate — the reference's search_owner shape (totals + argmax photo
    in one groupBy, ``queries.py:311-320``).
    """
    s = F.struct(
        *[c.alias(f"_o{i}") for i, c in enumerate(order_cols)],
        *[v.alias(k) for k, v in payload.items()],
    )
    extra = extra_aggs or {}
    agg = df.groupBy(*group_by).agg(
        F.max(s).alias("_top"), *[v.alias(k) for k, v in extra.items()]
    )
    return agg.select(
        *group_by,
        *[F.col(f"_top.{k}").alias(k) for k in payload],
        *extra.keys(),
    )


def money_sum(col: Column, scale: int = 2) -> Column:
    """Exact sum of a money-like double: cast each value to decimal first so
    the aggregate is order-independent (double summation is not associative —
    at 100 TB partial-agg orderings differ run to run). Emit as double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def exact_median(col: Column) -> Column:
    """Exact interpolated median — reference A7 uses ``percentile_approx``
    (``queries.py:252-255``); the engine offers both, exact for parity with
    SQL oracles, approx (``F.percentile_approx``) as the 100 TB scale path."""
    return F.percentile(col, F.lit(0.5))


def count_distinct_exact(df: DataFrame, col: str, alias: str) -> DataFrame:
    """Exact distinct count in ONE job — reference A9 runs two
    (``.distinct().count()``, ``queries.py:289-295``). The approx sibling
    (``F.approx_count_distinct``, HLL sketch) is the 100 TB default."""
    return df.agg(F.countDistinct(col).alias(alias))


def groupwise_minmax_scale(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out_col: str = "scaled",
) -> DataFrame:
    """Per-group min-max scaling via ``applyInPandas`` (grouped-map pandas
    UDF): each group arrives as ONE pandas DataFrame in an Arrow batch and
    is normalized in vectorized numpy. This is the canonical shape for
    per-group Python logic that built-in expressions can't express
    (sklearn-style transforms, per-entity model scoring).

    For THIS particular transform a pure window formulation exists
    ((v - min)/(max - min) over a keyed window) and is what the oracle
    uses — the point here is proving the pandas grouped-map path computes
    bit-compatible results through the Arrow boundary.

    Scale: one shuffle on the group keys; each group must fit in one
    worker's memory (min-max needs only two passes — for giant groups use
    the window form instead).
    """
    keys = list(keys)
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} double"]
    )

    def scale(pdf):
        v = pdf[value_col]
        lo, hi = v.min(), v.max()
        span = hi - lo
        import numpy as np

        scaled = (v - lo) / span if span else v * 0.0
        # floor(x*1e4+0.5)/1e4: same double arithmetic as the SQL oracle
        # (pandas .round is banker's — ties would diverge cross-engine)
        pdf[out_col] = np.floor(scaled * 10000.0 + 0.5) / 10000.0
        return pdf

    return df.groupBy(*keys).applyInPandas(scale, schema=schema)
