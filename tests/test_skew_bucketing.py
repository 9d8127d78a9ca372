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


def test_dynamic_partition_pruning(spark, tmp_path):
    """Partitioned-at-rest fact + filtered dim join → Spark injects a
    dynamicpruning subquery into the fact scan's PartitionFilters, so only
    matching partitions are read (the 100 TB partition-layout payoff)."""
    orders = load_table(spark, SF_SMALL, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    orders.write.partitionBy("order_year").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(y, "keep") for y in (1995, 1996)], "order_year int, tag string"
    ).filter(F.col("tag") == "keep")
    joined = fact.join(dim, "order_year")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    years = {r.order_year for r in joined.select("order_year").distinct().collect()}
    assert years == {1995, 1996}


def test_streaming_foreachbatch_checkpoint_resume(spark, tmp_path):
    """Checkpointed file-source stream into a parquet sink via foreachBatch:
    stop after the first batch of files, add more files, restart with the
    SAME checkpoint — only the NEW files are processed (exactly-once over
    restarts, the recovery contract real deployments rely on)."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, v double"

    def write_src(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    write_src("a", [(1, 1.0), (2, 2.0)])
    run_once()
    first = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert first == [1, 2]

    write_src("b", [(3, 3.0)])
    run_once()  # same checkpoint: resumes, processes ONLY the new file
    second = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert second == [1, 2, 3]  # no reprocessing of ids 1-2
