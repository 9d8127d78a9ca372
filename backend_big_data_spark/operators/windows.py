"""Window-function operators (SURVEY.md §2.5-2.6).

Implements the reference's three window idioms with its B6 bug fixed:
pagination in the reference rides ``row_number() OVER (ORDER BY lit(1))``
(``queries.py:26``) — nondeterministic page contents AND a single-partition
sort. Here pagination requires an explicit stable key and uses Spark's
native ``offset/limit`` (planned as a global limit, no window at all).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def paginate(df: DataFrame, order_by: Sequence[Column | str], page: int, page_size: int) -> DataFrame:
    """Stable pagination — fixes reference B6 (``queries.py:10-28``).

    ``order_by`` must be a total order (include a unique key as the last
    column) or page contents are undefined. ``page`` is 1-based.
    Planned as TakeOrderedAndProject + offset: only ``page*page_size`` rows
    ever leave the executors — no single-partition global sort of the table.
    """
    if page < 1 or page_size < 1:
        raise ValueError("page and page_size must be >= 1")
    return df.orderBy(*order_by).offset((page - 1) * page_size).limit(page_size)


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group — the reference's canonical idiom
    (``queries.py:470-474``: top-5 camera models per brand). ``order_by``
    should break ties on a unique key for deterministic output.

    Scale: Spark plans a per-partition-key window; with AQE skew handling a
    hot group splits. For extreme k≪group-size cases a groupBy+min_by_k
    (aggregate push-down) variant would cut the shuffle, but the window form
    is the right default.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def global_rank(
    df: DataFrame, order_by: Sequence[Column | str], rank_col: str = "rank"
) -> DataFrame:
    """Global ranking — reference W2 (``queries.py:322``, rank all owners by
    total views). A global ``row_number`` window funnels all rows through one
    partition; acceptable ONLY on pre-aggregated (bounded) inputs, which is
    how the reference uses it and how the engine exposes it. For unbounded
    ranking, use ``F.rank`` over a keyed window or zipWithIndex-style plans.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w))


def lag_delta(
    df: DataFrame,
    partition_by: Sequence[Column | str],
    order_by: Sequence[Column | str],
    value: Column,
    delta_col: str = "delta",
) -> DataFrame:
    """Per-group difference from the previous row (lag) — additive over the
    reference (its Window import at ``queries.py:1`` never uses lag/lead)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(delta_col, value - F.lag(value).over(w))
