"""Relational query suite — the reference's §2 operator inventory re-expressed
over the TPC-H-ish test catalog (TESTDATA.md).

Each query maps to inventory rows in SURVEY.md §2 (cited per function) and
carries a DuckDB oracle with identical column names/semantics. The *shape*
of each plan is what the reference computes (histograms, stats, rankings,
search); the tables differ because the driver's correctness gate runs on the
synthetic star schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.functions.scalars import bucketize
from backend_big_data_spark.operators.aggregates import (
    argmax_per_group,
    count_distinct_exact,
    exact_median,
    money_sum,
)
from backend_big_data_spark.operators.joins import anti_join, broadcast_join
from backend_big_data_spark.operators.search import keyword_filter
from backend_big_data_spark.operators.windows import (
    global_rank,
    paginate,
    topk_per_group,
)
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table


# --------------------------------------------------------------------------
# Flagship: scan → filter → derived cols → hash agg → sort (SURVEY §7 step 1;
# the backbone shape of the reference's histogram/stat endpoints, e.g.
# queries.py:84-93, :149-151, :171-173). TPC-H Q1-shaped.
# --------------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS DECIMAL(18,6)) ) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A3/A6 + P6 (SURVEY §2.2/2.4). Filter pushes into the parquet
    scan; single hash aggregate with map-side partials; no Python anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "revenue_by_region",
    oracle="""
SELECT r_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS lineitem_count
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r_name
ORDER BY r_name
""",
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join pipeline (J1 generalized; TPC-H Q5-shaped). Dimension side
    (region⨝nation⨝customer) is broadcast so the lineitem fact table never
    shuffles for the dim lookup; only orders⨝lineitem shuffles on orderkey —
    at 100 TB both sides would be bucketed on orderkey to kill that too."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    dims = (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "r_name")
    )
    facts = lineitem.join(
        orders.select("o_orderkey", "o_custkey"),
        lineitem.l_orderkey == orders.o_orderkey,
    )
    return (
        facts.join(F.broadcast(dims), facts.o_custkey == dims.c_custkey)
        .groupBy("r_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("lineitem_count"),
        )
        .orderBy("r_name")
    )


@register(
    "revenue_forecast",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS qualifying_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P8 conjunctive range predicates + global agg (A6) — TPC-H Q6-shaped.
    All four predicates push down to the parquet scan (check PushedFilters);
    the whole plan is scan→filter→partial agg→final agg, zero shuffle rows
    beyond one partial-agg row per task."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("qualifying_lineitems"),
        )
    )


# --------------------------------------------------------------------------
# Histogram family — reference /photoCountPosted, /photoCountTaken,
# /photoCountHour, /photoPostedPerMonthByYear (queries.py:80-163, bug B1
# fixed: group by the same column family you filter on).
# --------------------------------------------------------------------------
@register(
    "orders_by_month",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       COUNT(*) AS order_count
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + date-part derivation (§2.8) — the /photoCountPosted shape
    (queries.py:80-82). Dates were parsed once at ingest (parquet timestamp),
    not per-query from strings as the reference does."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(F.count("*").alias("order_count"))
        .orderBy("order_year", "order_month")
    )


@register(
    "events_by_hour",
    oracle="""
SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day, COUNT(*) AS event_count
FROM events GROUP BY 1 ORDER BY 1
""",
)
def events_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/photoCountHour semantics (queries.py:147-151): histogram over
    hour-of-day, UTC session timezone for determinism."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.hour("ts").alias("hour_of_day"))
        .agg(F.count("*").alias("event_count"))
        .orderBy("hour_of_day")
    )


@register(
    "avg_order_value_by_year",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       ROUND(AVG(o_totalprice), 4) AS avg_order_value,
       COUNT(*) AS order_count
FROM orders GROUP BY 1 ORDER BY 1
""",
)
def avg_order_value_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — /avgViewsPerYear, /avgCommentsPerYear (queries.py:171-184)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.round(F.avg("o_totalprice"), 4).alias("avg_order_value"),
            F.count("*").alias("order_count"),
        )
        .orderBy("order_year")
    )


@register(
    "first_order_per_customer",
    oracle="""
SELECT o_custkey, MIN(o_orderdate) AS first_order_ts, COUNT(*) AS order_count
FROM orders GROUP BY o_custkey ORDER BY o_custkey
""",
)
def first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — 'first post per user' (queries.py:227-230) as min-timestamp."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.min("o_orderdate").alias("first_order_ts"),
            F.count("*").alias("order_count"),
        )
        .orderBy("o_custkey")
    )


@register(
    "top_order_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
  FROM orders
) t WHERE rn = 1 ORDER BY o_custkey
""",
)
def top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 argmax-of-struct (queries.py:316-320): the winner row per group in
    ONE hash aggregate — no window, no self-join; at scale this is a plain
    partial-aggregable groupBy, strictly cheaper than the oracle's window."""
    orders = load_table(spark, sf_dir, "orders")
    return argmax_per_group(
        orders,
        group_by=["o_custkey"],
        order_cols=[F.col("o_totalprice"), F.col("o_orderkey")],
        payload={
            "top_orderkey": F.col("o_orderkey"),
            "top_totalprice": F.col("o_totalprice"),
        },
    ).orderBy("o_custkey")


@register(
    "distinct_order_priorities",
    oracle="SELECT DISTINCT o_orderpriority FROM orders ORDER BY 1",
)
def distinct_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — /years semantics (queries.py:37-40)."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .orderBy("o_orderpriority")
    )


@register(
    "customer_count_with_orders",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS customer_count FROM orders",
)
def customer_count_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 exact distinct count in one job — /countUsers (queries.py:289-295)
    ran .distinct().count() (two jobs) and then hit bug B4 in the route."""
    return count_distinct_exact(
        load_table(spark, sf_dir, "orders"), "o_custkey", "customer_count"
    )


# --------------------------------------------------------------------------
# Rankings — /getTopBrandAndCameras, /topCamerasPerYear, /top50Owners,
# /searchOwner (queries.py:298-364, 442-516)
# --------------------------------------------------------------------------
@register(
    "top_brand_types",
    oracle="""
WITH counts AS (
  SELECT p_brand, p_type, COUNT(*) AS type_count FROM part GROUP BY 1, 2
), totals AS (
  SELECT p_brand, COUNT(*) AS brand_total FROM part GROUP BY 1
), top5 AS (
  SELECT * FROM totals ORDER BY brand_total DESC, p_brand LIMIT 5
)
SELECT c.p_brand, c.p_type, c.type_count, t.brand_total
FROM counts c JOIN top5 t USING (p_brand)
ORDER BY c.p_brand, c.p_type
""",
)
def top_brand_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 two-level agg + J1 broadcast join (queries.py:460-467): (brand,
    type) counts joined to the top-5 brands; the ≤5-row side is broadcast
    explicitly. B5 fixed by construction (no sentinel rows here)."""
    part = load_table(spark, sf_dir, "part")
    counts = part.groupBy("p_brand", "p_type").agg(F.count("*").alias("type_count"))
    totals = part.groupBy("p_brand").agg(F.count("*").alias("brand_total"))
    top5 = totals.orderBy(F.desc("brand_total"), "p_brand").limit(5)
    return (
        broadcast_join(counts, top5, on="p_brand")
        .select("p_brand", "p_type", "type_count", "brand_total")
        .orderBy("p_brand", "p_type")
    )


@register(
    "top3_parts_per_brand",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INTEGER) AS rnk
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) t WHERE rn <= 3 ORDER BY p_brand, rnk
""",
)
def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 top-k per group (queries.py:470-474) with a deterministic tie-break
    key, which the reference lacks."""
    part = load_table(spark, sf_dir, "part")
    return topk_per_group(
        part.select("p_brand", "p_partkey", "p_retailprice"),
        partition_by=["p_brand"],
        order_by=[F.desc("p_retailprice"), F.col("p_partkey")],
        k=3,
        rank_col="rnk",
    ).orderBy("p_brand", "rnk")


@register(
    "customer_spend_ranking",
    oracle="""
SELECT o_custkey, total_spend, order_count, CAST(rn AS INTEGER) AS spend_rank
FROM (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
         COUNT(*) AS order_count,
         row_number() OVER (ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) DESC,
                            o_custkey) AS rn
  FROM orders GROUP BY o_custkey
) t WHERE rn <= 100 ORDER BY spend_rank
""",
)
def customer_spend_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 global ranking — /top50Owners + /searchOwner rank semantics
    (queries.py:313-322). A rank-filtered top-k needs no global ranking
    pass: TakeOrderedAndProject moves only the top 100 per partition and
    the row_number window runs over the 100-row result (bounded by the
    literal k — `operators/windows.global_topk_ranked`); decimal-exact
    spend + custkey tie-break make the rank deterministic."""
    from backend_big_data_spark.operators.windows import global_topk_ranked

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        money_sum(F.col("o_totalprice")).alias("total_spend"),
        F.count("*").alias("order_count"),
    )
    return global_topk_ranked(
        spend, [F.desc("total_spend"), F.col("o_custkey")], 100,
        rank_col="spend_rank",
    ).orderBy("spend_rank")


# --------------------------------------------------------------------------
# Pagination / limits / search — /getFirstRows, /searchPhotos (§2.6-2.7)
# --------------------------------------------------------------------------
@register(
    "orders_page3",
    oracle="""
SELECT * FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40
""",
)
def orders_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/W1 pagination with bug B6 fixed: stable unique-key order +
    offset/limit (planned as a global limit — no single-partition window)."""
    orders = load_table(spark, sf_dir, "orders")
    return paginate(orders, ["o_orderkey"], page=3, page_size=20)


@register(
    "top50_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
""",
)
def top50_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 global top-k (queries.py:360-364) — Spark plans
    TakeOrderedAndProject: each task keeps 50 rows, no global sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(50)
    )


@register(
    "parts_search_union",
    oracle="""
SELECT p_partkey, p_name, p_type, p_brand FROM part WHERE contains(lower(p_name), 'red')
UNION
SELECT p_partkey, p_name, p_type, p_brand FROM part WHERE contains(lower(p_type), 'promo')
ORDER BY p_partkey
""",
)
def parts_search_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union+dedup of match branches + P10 case-insensitive contains —
    /searchPhotos keyword∪tag semantics (queries.py:377-416), dedup by key."""
    part = load_table(spark, sf_dir, "part")
    cols = ["p_partkey", "p_name", "p_type", "p_brand"]
    by_name = part.filter(keyword_filter([F.col("p_name")], "red")).select(cols)
    by_type = part.filter(keyword_filter([F.col("p_type")], "promo")).select(cols)
    return (
        by_name.unionByName(by_type)
        .dropDuplicates(["p_partkey"])
        .orderBy("p_partkey")
    )


@register(
    "order_price_buckets",
    oracle="""
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS price_bucket,
       COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM orders GROUP BY 1 ORDER BY 1
""",
)
def order_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 when/otherwise conditional bucketing (data_cleaner.py:87-93
    pattern) feeding an aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = bucketize(F.col("o_totalprice"), [50000.0, 150000.0], ["small", "medium", "large"])
    return (
        orders.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count("*").alias("order_count"),
            money_sum(F.col("o_totalprice")).alias("total_value"),
        )
        .orderBy("price_bucket")
    )


@register(
    "avg_ship_delay_by_priority",
    oracle="""
SELECT o_orderpriority,
       ROUND(AVG(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 4)
         AS avg_ship_delay_days,
       COUNT(*) AS lineitem_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def avg_ship_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-diff derived column + global-ish agg — /averageTimeToPost
    (queries.py:204-210). Fact⨝fact equi-join on orderkey: at 100 TB both
    tables bucketed on orderkey make this shuffle-free."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.avg(delay), 4).alias("avg_ship_delay_days"),
            F.count("*").alias("lineitem_count"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "median_order_value_by_priority",
    oracle="""
SELECT o_orderpriority,
       ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_order_value,
       COUNT(*) AS order_count
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def median_order_value_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 percentile — /viewStats,/commentStats (queries.py:252-266) used
    percentile_approx; we expose EXACT percentile for oracle parity and keep
    approx (F.percentile_approx) as the 100 TB default (sketch-based, one
    pass, no full sort of group values)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(exact_median(F.col("o_totalprice")), 2).alias("median_order_value"),
            F.count("*").alias("order_count"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
)
ORDER BY c_custkey
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (absent from the reference, free in Spark — SURVEY §2.3):
    customers with no orders before 1996."""
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        anti_join(customer, orders, on="c_custkey")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "repeat_customer_order_gap",
    oracle="""
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
            CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey) AS DATE),
            CAST(o_orderdate AS DATE)) AS gap
  FROM orders
)
SELECT o_custkey, ROUND(AVG(gap), 4) AS avg_gap_days, COUNT(gap) AS gap_count
FROM g WHERE gap IS NOT NULL GROUP BY o_custkey ORDER BY o_custkey
""",
)
def repeat_customer_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag window (additive; the reference imports Window but never lags —
    SURVEY §2.5): mean days between consecutive orders per customer."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
    )
    return (
        orders.withColumn("gap", gap)
        .filter(F.col("gap").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.round(F.avg("gap"), 4).alias("avg_gap_days"),
            F.count("gap").alias("gap_count"),
        )
        .orderBy("o_custkey")
    )
