"""Join operators (SURVEY.md §2.3).

The reference has exactly one join — a counts-table joined to a 5-row
top-brands table (``queries.py:467``). The engine exposes the full join
surface Spark gives for free (inner/outer/semi/anti) plus explicit
broadcast control, and documents the scale contract for each.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_join(
    left: DataFrame, small_right: DataFrame, on: Sequence[str] | str, how: str = "inner"
) -> DataFrame:
    """Equi-join with the small side broadcast — reference J1
    (``queries.py:467``) relied on auto-broadcast; the engine makes intent
    explicit so dimension joins NEVER shuffle the fact table. At 100 TB the
    fact side streams map-side; only the dim table is replicated."""
    return left.join(F.broadcast(small_right), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """Rows of ``left`` with a match in ``right`` — no duplication, no
    right-side columns (EXISTS semantics)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """Rows of ``left`` without a match in ``right`` (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")
