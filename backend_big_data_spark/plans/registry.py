"""Registry of named queries and their DuckDB oracle SQL.

Every operator claimed done in SURVEY.md §2 appears here as a named query
``fn(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI-SQL
oracle string with IDENTICAL output column names and, as far as types allow,
identical output types. Value parity rules used throughout:

- money/double sums go through ``decimal`` so they are order-independent
  (double addition is not associative; partial-agg order differs per run);
- averages of doubles are rounded (4-6 dp) — the mean's fp error is ~1e-10
  relative, far below the rounding grid;
- int widths are cast explicitly (year/month/hour/rank → int32) because
  Spark and DuckDB default to different widths;
- every ordering that feeds row_number/limit includes a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle=None`` means non-SQL-expressible
    (driver records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
