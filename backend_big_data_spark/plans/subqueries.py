"""Correlated-subquery query shapes (TPC-H Q15/Q17/Q21 adapted to the
driver's synthetic schema).

The reference never writes a correlated subquery (its only join is
`queries.py:467`), but any SQL user migrating real workloads will — these
three shapes cover the canonical decorrelation patterns Catalyst must get
right, expressed directly as their decorrelated DataFrame plans:

- scalar correlated aggregate (Q17): per-key aggregate joined back to the
  fact table instead of a per-row subquery;
- EXISTS / NOT EXISTS (Q21): left-semi + left-anti joins with an extra
  non-equi condition;
- aggregate-view max (Q15): scalar global max broadcast against the
  aggregated view.

Oracles state the same queries with real correlated subqueries, so the
gate proves the decorrelated plans compute subquery semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table


@register(
    "part_small_quantity_revenue",
    oracle="""
SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly,
       COUNT(*) AS qualifying_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
""",
)
def part_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: scalar correlated aggregate, decorrelated.

    The per-row subquery ``0.2 * avg(quantity) where partkey = outer key``
    becomes one hash aggregate over the brand-restricted lines joined back
    by partkey. Both the part-id set and the per-part thresholds are
    bounded by the brand's part count, so both join back as broadcasts and
    the fact table never shuffles; at 100 TB, if one brand outgrows the
    broadcast threshold, dropping the hints degrades gracefully to a
    keyed shuffle join (AQE re-plans at runtime).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    brand_lines = li.join(F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"))
    thresholds = brand_lines.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    qualifying = brand_lines.drop("l_partkey").join(
        F.broadcast(thresholds), F.col("p_partkey") == thresholds.l_partkey
    ).filter(F.col("l_quantity") < F.col("qty_threshold"))
    return qualifying.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0, 2
        ).alias("avg_yearly"),
        F.count("*").alias("qualifying_lines"),
    )


@register(
    "sole_delayed_supplier",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
      )
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def sole_delayed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS → left-semi, NOT EXISTS → left-anti, both
    with a non-equi residual (``suppkey <>``) on top of the orderkey
    equi-condition.

    Suppliers who were the ONLY delayed supplier (ship > order date + 90
    days) on a multi-supplier order. The lateness flag is computed once
    per line (one orders⋈lineitem shuffle on orderkey — the same exchange
    all three correlated references need, deduplicated by Spark's
    ReusedExchange within the single execution); the semi and
    anti probes then join line-vs-line on orderkey only, so all three
    legs co-partition and AQE coalesces them. No row explosion: semi/anti
    emit at most one row per left row.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias(
            "is_late"
        ),
    )
    l1 = lines.filter("is_late").select("l_orderkey", "l_suppkey")
    l2 = lines.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = lines.filter("is_late").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.o2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == l3.o3) & (l1.l_suppkey != l3.s3),
            "left_anti",
        )
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(supplier), sole.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "top_supplier_quarter",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
""",
)
def top_supplier_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate view + scalar ``= (SELECT MAX ...)``.

    The revenue view aggregates once (one keyed shuffle over the quarter's
    lines); the scalar max is a single-row broadcast joined back with an
    equality on the DECIMAL revenue — decimal, not double, so "equals the
    max" is exact at any partial-aggregation order. The view's aggregate
    exchange is shared with the max probe via ReusedExchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("total_rev")
        )
    )
    max_rev = revenue.agg(F.max("total_rev").alias("max_rev"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_rev == F.col("max_rev"))
        .join(F.broadcast(supplier), revenue.supplier_no == supplier.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@register(
    "part_min_price_suppliers",
    oracle="""
SELECT l1.l_partkey AS p_partkey, s_suppkey, s_name,
       l1.l_extendedprice AS min_price
FROM lineitem l1
JOIN part ON p_partkey = l1.l_partkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE p_brand = 'Brand#12'
  AND l1.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice)
        FROM lineitem l2
        WHERE l2.l_partkey = l1.l_partkey
      )
ORDER BY p_partkey, s_suppkey
""",
)
def part_min_price_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted — the synthetic catalog has no partsupp, so
    lineitem is the part↔supplier link): rows that EQUAL a correlated MIN.

    The per-row subquery ``min(price) where partkey = outer partkey``
    decorrelates into one hash aggregate over the brand-restricted lines
    joined back by (partkey, price-equality). Equality on the RAW double is
    exact — MIN does no arithmetic, so the correlated comparison can never
    diverge across engines or partial-agg orders. Ties (several suppliers
    at the min price) are all returned, exactly like Q2's multi-row
    output per part.

    Scale: brand part-ids and the per-part minima are both bounded by the
    brand's selectivity → broadcast joins; the fact table never shuffles.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    brand_lines = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey")
    )
    minima = brand_lines.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        brand_lines.drop("l_partkey")
        .join(
            F.broadcast(minima),
            (F.col("p_partkey") == minima.l_partkey)
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select("p_partkey", "s_suppkey", "s_name", "min_price")
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "dominant_part_suppliers",
    oracle="""
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l1.l_suppkey FROM lineitem l1
  WHERE l1.l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#19')
  GROUP BY l1.l_suppkey, l1.l_partkey
  HAVING 6 * SUM(CAST(l1.l_quantity AS DECIMAL(18,2))) >
         (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
          FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
)
ORDER BY s_suppkey
""",
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted, no partsupp): nested IN-subqueries with a
    correlated scalar aggregate in the HAVING — suppliers that ship more
    than 1/6 of some Brand#19 part's total volume (>1.6× the fair share of
    the ~10-supplier-per-part synthetic data; a "more than half" dominance
    bar selects nothing on uniformly-spread volumes, a trivially-matching
    empty result the gate can't distinguish from a broken plan).

    NOTE the oracle aliases the outer table (``l1``): a bare
    ``l2.l_partkey = l_partkey`` correlation resolves to l2 itself and
    silently compares the whole-table total.

    Decorrelated: brand parts broadcast-prune the fact table once; per
    (supplier, part) sums and per-part totals are two aggregates over the
    SAME pruned exchange; the ratio filter then semi-joins supplier. The
    comparison is ``6·supplier_sum > part_total`` on DECIMAL sums — exact
    at any partial-agg order, no double boundary wobble.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#19")
        .select("p_partkey")
    )
    qty = F.col("l_quantity").cast("decimal(18,2)")
    brand_lines = li.join(
        F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey")
    ).select("l_partkey", "l_suppkey", qty.alias("qty"))
    per_supp = brand_lines.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("supp_qty")
    )
    per_part = brand_lines.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("part_qty")
    )
    dominant = (
        per_supp.join(F.broadcast(per_part), per_supp.l_partkey == F.col("pk"))
        .filter(F.lit(6) * F.col("supp_qty") > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        supplier.join(dominant, supplier.s_suppkey == dominant.l_suppkey, "semi")
        .orderBy("s_suppkey")
    )
