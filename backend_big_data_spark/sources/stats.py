"""Catalog statistics job — ANALYZE the hot tables so the cost-based
optimizer plans with real rowCounts/NDVs (the promotion of
tests/test_cbo_stats.py's plumbing to a first-class helper; kept out of
sources/catalog.py so that file stays byte-stable for the standing driver
certifications riding it).

Spark cannot ANALYZE a temp view over external parquet, so the helper
materializes each table as a managed ``stats_<name>`` table first — on a
real deployment these ARE the warehouse tables and this is the nightly
stats job; the CBO then has rowCount/size for join reordering and
broadcast decisions (verified in tests/test_cbo_stats.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from backend_big_data_spark.sources.catalog import TABLES, load_table


def analyze_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLES,
    columns: bool = True,
) -> None:
    """Materialize + ANALYZE each table (``FOR ALL COLUMNS`` adds NDV /
    min/max per column — what the CBO's selectivity estimates feed on)."""
    for n in names:
        # a previous session's warehouse dir may survive without a metastore
        # entry (fresh in-memory catalog per session) — drop-then-write
        # keeps the helper idempotent across sessions
        spark.sql(f"DROP TABLE IF EXISTS stats_{n}")
        load_table(spark, sf_dir, n).write.mode("overwrite").saveAsTable(
            f"stats_{n}"
        )
        suffix = " FOR ALL COLUMNS" if columns else ""
        spark.sql(f"ANALYZE TABLE stats_{n} COMPUTE STATISTICS{suffix}")


__all__ = ["analyze_tables"]
