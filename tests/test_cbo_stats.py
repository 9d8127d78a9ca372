"""Cost-based-optimizer sanity: ANALYZE TABLE statistics reach the plan.

At 100 TB the file-size heuristic that drives broadcast decisions is
unreliable (compressed parquet under-measures wide tables; selective filters
over-measure). CBO with per-column stats gives Catalyst real rowCounts for
join reorder/broadcast decisions. The engine's scans are external parquet
tables, so stats come from ``ANALYZE TABLE ... COMPUTE STATISTICS``; this
test proves the plumbing: analyzed table → rowCount in the optimized plan's
cost annotation, and a stats-informed broadcast of the small side.

Reference has no optimizer at all (SURVEY §4.2 — everything delegated to
Catalyst); this is additive engine hygiene.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def cbo(spark):
    old = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    for t in ("cbo_nation", "cbo_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.sql(
        f"CREATE TABLE cbo_nation USING parquet LOCATION '{SF_SMALL}/nation.parquet'"
    )
    spark.sql(
        f"CREATE TABLE cbo_customer USING parquet "
        f"LOCATION '{SF_SMALL}/customer.parquet'"
    )
    spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE cbo_customer COMPUTE STATISTICS FOR ALL COLUMNS")
    yield spark
    for t in ("cbo_nation", "cbo_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _cost_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("cost")
    return buf.getvalue()


def test_analyzed_rowcounts_reach_the_optimized_plan(cbo):
    df = cbo.sql(
        "SELECT n_name, COUNT(*) AS cnt FROM cbo_customer c "
        "JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY n_name"
    )
    cost = _cost_plan(df)
    assert "rowCount=" in cost  # CBO stats annotated, not just sizeInBytes


def test_stats_informed_broadcast_of_small_side(cbo):
    df = cbo.sql(
        "SELECT c_name, n_name FROM cbo_customer c "
        "JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_analyze_tables_helper_populates_stats(spark):
    from backend_big_data_spark.sources.stats import analyze_tables

    analyze_tables(spark, "/root/testdata/sf0.001", names=("region",))
    rows = spark.sql("DESCRIBE EXTENDED stats_region").collect()
    stat_line = [r for r in rows if r["col_name"] == "Statistics"]
    assert stat_line and "rows" in stat_line[0]["data_type"]
    spark.sql("DROP TABLE IF EXISTS stats_region")
