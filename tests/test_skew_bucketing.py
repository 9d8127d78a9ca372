"""Tests: salted aggregation/join equivalence; bucketed co-located join
plans with no shuffle."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from backend_big_data_spark.operators.skew import salted_agg, salted_join
from backend_big_data_spark.sources.bucketing import drop_table, write_bucketed
from backend_big_data_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def test_salted_agg_equals_plain(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    plain = {
        (r.l_returnflag, r.l_linestatus): (r.c, float(r.q))
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.c, float(r.q))
        for r in salted_agg(
            li,
            keys=["l_returnflag", "l_linestatus"],
            aggs={
                "c": F.count("*"),
                "q": F.sum(F.col("l_quantity").cast("decimal(18,2)")),
            },
            unique_col=F.concat_ws("|", "l_orderkey", "l_linenumber"),
            num_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(orders, "l_orderkey").groupBy("o_orderpriority").count()
    salted = (
        salted_join(li, orders, ["l_orderkey"], unique_col=F.col("l_quantity") + F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .count()
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_bucketed_join_has_no_shuffle(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan  # co-located read
            # and the join actually works
            assert joined.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        drop_table(spark, "b_orders")
        drop_table(spark, "b_lineitem")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
