"""Unit tests: as-of join, range join, rollup/set-op plans, near-dup pairs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from backend_big_data_spark.operators.temporal import asof_join, range_join_pairs
from backend_big_data_spark.similarity.neardup import blocked_cosine_pairs


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:05")),
            (2, 100, _ts("2024-01-01T10:00:20")),
            (3, 200, _ts("2024-01-01T10:00:10")),
            (4, 300, _ts("2024-01-01T10:00:10")),  # key with no quotes at all
        ],
        "trade_id long, sym long, t timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (10, 100, _ts("2024-01-01T10:00:00"), 1.0),
            (11, 100, _ts("2024-01-01T10:00:05"), 2.0),  # ties trade 1 exactly
            (12, 100, _ts("2024-01-01T10:00:15"), 3.0),
            (13, 200, _ts("2024-01-01T10:00:30"), 9.0),  # only AFTER trade 3
        ],
        "quote_id long, sym long, t timestamp, px double",
    )
    return trades, quotes


def test_asof_join_semantics(spark):
    trades, quotes = _trades_quotes(spark)
    out = {
        r.trade_id: (r.quote_id, r.px)
        for r in asof_join(
            trades, quotes, ["sym"], "t", "t",
            {"quote_id": "quote_id", "px": "px"},
        ).collect()
    }
    # trade 1: quote at the SAME instant matches (<= bound is inclusive)
    assert out[1] == (11, 2.0)
    # trade 2: the latest quote at-or-before 10:00:20 is 10:00:15
    assert out[2] == (12, 3.0)
    # trade 3: sym 200's only quote is in the future → dropped (inner)
    # trade 4: sym 300 has no quotes → dropped
    assert set(out) == {1, 2}


def test_range_join_pairs_window_bounds(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01T12:00:00"))], "id long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [
            (20, 7, _ts("2024-01-01T11:00:00")),  # exactly -1h: INCLUDED (>=)
            (21, 7, _ts("2024-01-01T10:59:59")),  # beyond window
            (22, 7, _ts("2024-01-01T11:59:59")),  # inside
            (23, 7, _ts("2024-01-01T12:00:00")),  # equal to left: EXCLUDED (<)
            (24, 8, _ts("2024-01-01T11:30:00")),  # wrong key
        ],
        "rid long, k long, t timestamp",
    )
    got = sorted(
        r.rid
        for r in range_join_pairs(
            left, right, ["k"], "t", "t", 3600, {"rid": "rid"}
        ).collect()
    )
    assert got == [20, 22]


def test_blocked_cosine_pairs_blocks_and_threshold(spark):
    df = spark.createDataFrame(
        [
            (1, "a", [1.0, 0.0]),
            (2, "a", [1.0, 0.01]),   # ~same direction as 1
            (3, "a", [0.0, 1.0]),    # orthogonal to 1
            (4, "b", [1.0, 0.0]),    # identical to 1 but different block
        ],
        "vec_id long, label string, embedding array<double>",
    )
    pairs = {
        (r.vec_id_a, r.vec_id_b): r.cosine_sim
        for r in blocked_cosine_pairs(df, "label", 0.9).collect()
    }
    assert set(pairs) == {(1, 2)}  # orthogonal pair cut; cross-block never met
    assert pairs[(1, 2)] > 0.99


def test_rollup_levels(spark):
    from backend_big_data_spark.plans.all_plans import QUERIES
    from tests.conftest import SF_SMALL

    rows = QUERIES["orders_rollup"](spark, SF_SMALL).collect()
    grand = [r for r in rows if r.g_year == 1 and r.g_priority == 1]
    years = [r for r in rows if r.g_year == 0 and r.g_priority == 1]
    leaves = [r for r in rows if r.g_year == 0 and r.g_priority == 0]
    assert len(grand) == 1
    assert grand[0].order_count == sum(r.order_count for r in years)
    assert grand[0].order_count == sum(r.order_count for r in leaves)
