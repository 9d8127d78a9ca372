"""Lineitem-heavy classics (TPC-H Q3/Q18 shapes) + an explicitly salted
aggregation — the bench's deep-join and skew-tool coverage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.functions.scalars import round_half_up
from backend_big_data_spark.operators.skew import salted_agg
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table


@register(
    "shipping_priority_top10",
    oracle="""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on all three tables push into the
    scans BEFORE the joins (Catalyst predicate pushdown), the filtered
    customer side broadcasts, and the final top-10 is
    TakeOrderedAndProject — no global sort."""
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "large_quantity_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 200
)
SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders
JOIN big      ON o_orderkey = big.l_orderkey
JOIN lineitem ON lineitem.l_orderkey = o_orderkey
JOIN customer ON c_custkey = o_custkey
GROUP BY c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: a HAVING-filtered semi-ish self-aggregation of the
    fact table feeds the main join. The `big` key set is small after the
    HAVING filter → broadcast; lineitem is touched twice but shuffles only
    for its own aggregations (both on l_orderkey, so a bucketed-at-rest
    layout makes them shuffle-free — PERF.md)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 200)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(F.broadcast(big), "l_orderkey")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty")
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "lineitem_flags_salted",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS line_count,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def lineitem_flags_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salting demo under the oracle gate: (returnflag, linestatus)
    has ~4 giant groups — the canonical hot-key aggregation. The salted
    two-phase plan spreads each group over 16 reducers, then re-combines;
    the oracle proves the rewrite is semantics-preserving (decimal partials
    make even the sums bit-exact under any re-combination order)."""
    li = load_table(spark, sf_dir, "lineitem")
    return salted_agg(
        li,
        keys=["l_returnflag", "l_linestatus"],
        aggs={
            "line_count": F.count("*"),
            "total_qty": F.sum(F.col("l_quantity").cast("decimal(18,2)")),
        },
        unique_col=F.concat_ws("|", "l_orderkey", "l_linenumber"),
        num_salts=16,
    ).select(
        "l_returnflag",
        "l_linestatus",
        "line_count",
        F.col("total_qty").cast("double").alias("total_qty"),
    ).orderBy("l_returnflag", "l_linestatus")


@register(
    "returned_revenue_by_customer",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS lost_revenue,
       COUNT(*) AS returned_lines
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
""",
)
def returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20. The
    returnflag filter pushes into the lineitem scan; customer broadcasts;
    TakeOrderedAndProject caps the result."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("lost_revenue"),
            F.count("*").alias("returned_lines"),
        )
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "events_props_json",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       COUNT(*) AS event_count,
       FLOOR(AVG(value) * 10000.0 + 0.5) / 10000.0 AS avg_value
FROM events
GROUP BY 1 ORDER BY 1
""",
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: the events ``props`` column is a JSON
    string; ``get_json_object`` pulls ``$.k`` JVM-side (no Python, no full
    JSON schema needed). At scale prefer parsing ONCE at ingest with
    ``from_json`` into a typed column — per-query string parsing is the
    date-string mistake the reference made (SURVEY §1.2)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.get_json_object("props", "$.k").cast("int").alias("k")
        )
        .agg(
            F.count("*").alias("event_count"),
            round_half_up(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("k")
    )


@register(
    "customer_spend_deciles",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
), tiled AS (
  SELECT o_custkey, total_spend,
         CAST(ntile(10) OVER (ORDER BY total_spend DESC, o_custkey) AS INTEGER) AS decile
  FROM spend
)
SELECT decile, COUNT(*) AS n_customers,
       MIN(total_spend) AS min_spend, MAX(total_spend) AS max_spend
FROM tiled GROUP BY decile ORDER BY decile
""",
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value decile segmentation: ntile(10) over per-customer
    lifetime spend (W2 family — equi-height bucketing next to the
    existing rank/row_number/lag/RANGE-frame coverage).

    The decile is an EXACT distributed ntile over the one-row-per-customer
    aggregate (`operators/windows.distributed_ntile`: range-partition on
    the sort key, broadcast prefix offsets, closed-form tile from
    (rank, total)) — hash-identical to SQL ntile but with no
    partition-less window, so the same plan survives a 10⁹-row customer
    dimension; spend is an exact decimal sum with a unique (spend desc,
    custkey) tie-break, so tile boundaries are deterministic cross-engine.
    """
    from backend_big_data_spark.operators.windows import distributed_ntile

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_spend")
    )
    tiled = distributed_ntile(
        spend, 10, [F.desc("total_spend"), "o_custkey"], "decile"
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("total_spend").alias("min_spend"),
            F.max("total_spend").alias("max_spend"),
        )
        .orderBy("decile")
    )
