"""TPC-H completion module — the remaining canonical query shapes (Q4, Q7,
Q8, Q9, Q12, Q13, Q14, Q16, Q19, Q22), adapted to the driver catalog.

Together with the shapes already registered elsewhere (Q1 ``pricing_summary``,
Q2 ``part_min_price_suppliers``, Q3 ``shipping_priority_top10``, Q5
``revenue_by_region``, Q6 ``revenue_forecast``, Q10
``returned_revenue_by_customer``, Q15 ``top_supplier_quarter``, Q17
``part_small_quantity_revenue``, Q18 ``large_quantity_orders``, Q20
``dominant_part_suppliers``, Q21 ``sole_delayed_supplier``) this closes the
full 22-query TPC-H suite, every one driver-oracle-gated.

Adaptations (the synthetic catalog lacks ``partsupp``, ``l_commitdate`` /
``l_receiptdate`` / ``l_shipmode``, and ``c_phone`` — reference parity work
is in the photo domain; these exist for relational-engine coverage):

- Q4's "committed late" becomes "shipped >30 days after order" — the
  decorrelated EXISTS (left-semi with a cross-table predicate) is intact.
- Q9's ``ps_supplycost`` becomes ``0.6 * p_retailprice`` — the profit
  expression still mixes three tables' columns per line.
- Q12's ship modes become shipping-delay tiers — the conditional two-way
  count pivot over a join is intact.
- Q16's complaint-supplier exclusion keys on negative ``s_acctbal``, and the
  part↔supplier bridge is ``lineitem`` — distinct-count + NOT IN anti-join
  shape intact.
- Q22's phone country code becomes the customer's nation — scalar average
  subquery + anti-join shape intact.

Scale notes: every query here keeps filters on the scan side of joins
(pushdown), broadcasts dimension sides, and aggregates with map-side partial
aggregation. No query collects, no query cross-joins anything non-tiny
(Q8/Q14/Q19/Q22's scalar-threshold sides are 1-row broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.functions.scalars import round_half_up
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table


def _dec(col, scale: int = 4):
    """Decimal-cast a money expression so sums are order-independent."""
    return col.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → left-semi)
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join whose
    condition spans both sides (``l_shipdate > o_orderdate + 30d``).
    The quarter filter prunes the orders scan BEFORE the join; the semi
    join never materializes lineitem columns. (Adapted: the catalog has no
    commit/receipt dates, so "late" = shipped >30 days after order.)"""
    lo = F.lit("1996-07-01 00:00:00").cast("timestamp")
    hi = F.lit("1996-10-01 00:00:00").cast("timestamp")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                     AND TIMESTAMP '1997-12-31 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume. The two nation filters are applied
    on broadcast-joined dimension sides BEFORE the big fact joins, so
    supplier/customer shrink to ~2/25 of their rows pre-shuffle; the
    disjunctive pair predicate runs after both nation names are attached
    (it references both sides, so it cannot push lower)."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = supp.join(F.broadcast(n1), supp.s_nationkey == n1.s_nkey).select(
        "s_suppkey", "supp_nation"
    )
    cust = cust.join(F.broadcast(n2), cust.c_nationkey == n2.c_nkey).select(
        "c_custkey", "cust_nation"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            F.col("l_shipdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1997-12-31 00:00:00").cast("timestamp"),
            )
        )
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle="""
WITH all_nations AS (
  SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n2.n_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
)
SELECT o_year,
       FLOOR(CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mkt_share
FROM all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_1's share of ECONOMY-part volume sold into EUROPE.
    Region/part/nation dimensions broadcast; the only shuffles are the
    lineitem↔orders join and the final year agg. The share division runs
    on decimal-exact sums, so the double result is bit-identical across
    engines (then rounded to the 1e-6 grid)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n2 = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nkey"))
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cust_eu = cust.join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey")).select(
        "c_custkey"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1997-12-31 00:00:00").cast("timestamp"),
            )
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    volume = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    nation_vol = F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(
        _dec(F.lit(0))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp.join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
                          .select("s_suppkey", "supp_nation")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_eu), orders.o_custkey == cust_eu.c_custkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(nation_vol).cast("double")
                / F.sum(volume).cast("double")
            ).alias("_share_raw")
        )
        .select(
            "o_year", round_half_up(F.col("_share_raw"), 6).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit
# ---------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation, CAST(YEAR(l_shipdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation, per-year profit on widget parts.
    (Adapted: no ``partsupp``, so supply cost is modeled as 60% of
    ``p_retailprice``; the three-table profit expression per line and the
    LIKE-filtered part dimension are intact.) The part filter cuts the
    broadcast side before the fact join; profit sums in decimal."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount",
        "l_shipdate",
    )
    profit = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("nation", F.year("l_shipdate").cast("int").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q12 — shipping tiers vs order priority (conditional count pivot)
# ---------------------------------------------------------------------------


@register(
    "q12_shipping_tiers",
    oracle="""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 15 THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 60 THEN 'REGULAR'
            ELSE 'SLOW' END AS ship_tier,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY ship_tier
ORDER BY ship_tier
""",
)
def q12_shipping_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional two-way counts per shipping class.
    (Adapted: no ``l_shipmode``, so the class is a shipping-delay tier
    computed from the join's two date columns — the cross-table CASE and
    the conditional-count pivot are intact.)"""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate")
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    tier = (
        F.when(delay <= 15, "FAST").when(delay <= 60, "REGULAR").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one = F.lit(1)
    zero = F.lit(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(tier.alias("ship_tier"))
        .agg(
            F.sum(F.when(high, one).otherwise(zero)).alias("high_line_count"),
            F.sum(F.when(~high, one).otherwise(zero)).alias("low_line_count"),
        )
        .orderBy("ship_tier")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join + double aggregation)
# ---------------------------------------------------------------------------


@register(
    "q13_order_count_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed N qualifying orders, including
    N=0 — the left-outer join with an ON-clause (not WHERE) filter is the
    whole point: the priority predicate prunes the ORDERS side only, and
    ``COUNT(o_orderkey)`` counts non-null matches so no-order customers
    survive as zero. Double aggregation: per-customer, then histogram."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey", "o_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share (conditional agg over a join, scalar result)
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle="""
SELECT FLOOR(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
       * 1e6 + 0.5) / 1e6 AS promo_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of September-1996 revenue from PROMO parts.
    Part is a broadcast dimension; the month filter prunes the lineitem
    scan; one global agg with two decimal-exact partial sums — the
    division happens once on the driver-side final row."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(_dec(F.lit(0)))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo_rev).cast("double")
                / F.sum(rev).cast("double")
            ).alias("_raw")
        )
        .select(round_half_up(F.col("_raw"), 6).alias("promo_revenue"))
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (distinct count + NOT IN anti-join)
# ---------------------------------------------------------------------------


@register(
    "q16_parts_supplier_counts",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part
JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per surviving (brand, type, size).
    (Adapted: the part↔supplier bridge is lineitem — no ``partsupp`` — and
    the "complaints" exclusion keys on negative account balance.) The NOT
    IN subquery decorrelates to a broadcast left-anti join (``s_suppkey``
    is non-null, so NOT IN ≡ anti-join); part filters push into its scan."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-attribute predicate (OR-of-ANDs revenue)
# ---------------------------------------------------------------------------


@register(
    "q19_disjunctive_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: an OR of three conjunctive brand/size/quantity envelopes.
    Catalyst extracts the common single-side conjuncts: ``p_size <= 15``
    (the OR's union on part) and ``l_quantity <= 30`` push into the two
    scans, while the cross-table disjunction evaluates after the broadcast
    join — exactly how a columnar engine should run Q19."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    pred = (
        ((b == "Brand#2") & sz.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#13") & sz.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#23") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar AVG subquery + anti-join)
# ---------------------------------------------------------------------------


@register(
    "q22_sales_opportunity",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS thresh
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name AS cntry,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
CROSS JOIN avg_bal
WHERE c_acctbal > thresh
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
GROUP BY cntry
ORDER BY cntry
""",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-inactive customers per country. (Adapted:
    no ``c_phone``, so the country code is the customer's nation; and the
    synthetic catalog gives every customer at least one order, so
    "inactive" means no order SINCE 1999 — the date filter pushes into the
    anti-join's orders scan.) The scalar AVG is a 1-row broadcast cross
    join (computed decimal-exact so the threshold is bit-identical across
    engines); NOT EXISTS is a left-anti join against the orders scan
    pruned to its join column."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("cntry")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("thresh")
        )
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("thresh"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("cntry")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntry")
    )
