"""Unit tests for operator combinators (SURVEY.md §5.2: one test per
inventory row family, tiny inline DataFrames, exact expected rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from backend_big_data_spark.operators.aggregates import (
    argmax_per_group,
    count_distinct_exact,
    money_sum,
)
from backend_big_data_spark.operators.joins import anti_join, broadcast_join, semi_join
from backend_big_data_spark.operators.search import (
    array_membership_filter,
    date_range_filter,
    keyword_filter,
    union_distinct_by_key,
)
from backend_big_data_spark.operators.windows import (
    global_rank,
    lag_delta,
    paginate,
    topk_per_group,
)


def _people(spark):
    return spark.createDataFrame(
        [
            ("a", "g1", 10, 1),
            ("b", "g1", 30, 2),
            ("c", "g1", 30, 3),
            ("d", "g2", 5, 4),
            ("e", "g2", 7, 5),
        ],
        "name string, grp string, score int, id int",
    )


def test_paginate_tiles_ordered_sequence(spark):
    """Property (B6 fix): pages partition the ordered result exactly."""
    df = spark.range(0, 97).withColumnRenamed("id", "k")
    pages = [
        [r.k for r in paginate(df, ["k"], page=p, page_size=10).collect()]
        for p in range(1, 11)
    ]
    flat = [k for page in pages for k in page]
    assert flat == list(range(97))
    assert all(len(p) == 10 for p in pages[:9]) and len(pages[9]) == 7


def test_topk_per_group_matches_sorted_head(spark):
    df = _people(spark)
    top = topk_per_group(df, ["grp"], [F.desc("score"), F.col("id")], k=2)
    got = {(r.grp, r.name, r.rnk) for r in top.collect()}
    assert got == {("g1", "b", 1), ("g1", "c", 2), ("g2", "e", 1), ("g2", "d", 2)}


def test_global_rank(spark):
    df = _people(spark)
    ranked = global_rank(df, [F.desc("score"), F.col("id")])
    got = {r.name: r.rank for r in ranked.collect()}
    assert got == {"b": 1, "c": 2, "a": 3, "e": 4, "d": 5}


def test_argmax_per_group_equals_window_argmax(spark):
    """Property (A5): max-of-struct == row_number-over-window winner."""
    df = _people(spark)
    got = argmax_per_group(
        df,
        ["grp"],
        [F.col("score"), F.col("id")],
        {"winner": F.col("name"), "best_score": F.col("score")},
    )
    assert {(r.grp, r.winner, r.best_score) for r in got.collect()} == {
        ("g1", "c", 30),  # tie on score=30 broken by max id (c)
        ("g2", "e", 7),
    }


def test_lag_delta(spark):
    df = _people(spark)
    out = lag_delta(df, ["grp"], ["id"], F.col("score"), "d")
    got = {r.name: r.d for r in out.collect()}
    assert got == {"a": None, "b": 20, "c": 0, "d": None, "e": 2}


def test_money_sum_is_exact(spark):
    df = spark.createDataFrame([(0.1,)] * 10, "x double")
    (v,) = df.agg(money_sum(F.col("x")).alias("s")).collect()[0]
    assert v == 1.0  # double-summed 0.1*10 would be 0.9999999999999999


def test_count_distinct_exact(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (3,), (3,)], "k int")
    assert count_distinct_exact(df, "k", "n").collect()[0].n == 3


def test_semi_anti_broadcast_joins(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    right = spark.createDataFrame([(1,), (3,)], "k int")
    assert {r.k for r in semi_join(left, right, "k").collect()} == {1, 3}
    assert {r.k for r in anti_join(left, right, "k").collect()} == {2}
    joined = broadcast_join(left, right.withColumn("w", F.lit(9)), "k")
    assert {(r.k, r.w) for r in joined.collect()} == {(1, 9), (3, 9)}


def test_search_filters(spark):
    df = spark.createDataFrame(
        [(1, "Deep BLUE sea", ["x", "y"], "2020-01-05"),
         (2, "green hill", ["y", "z"], "2020-02-05"),
         (3, "red rock", ["q"], "2020-03-05")],
        "id int, title string, tags array<string>, d string",
    ).withColumn("d", F.to_date("d"))
    assert [r.id for r in df.filter(keyword_filter([F.col("title")], "BLUE")).collect()] == [1]
    pred = date_range_filter(F.col("d"), "2020-01-15", None)
    assert {r.id for r in df.filter(pred).collect()} == {2, 3}
    assert date_range_filter(F.col("d"), None, None) is None
    # B10 semantics: row matches once even when multiple tags match
    got = df.filter(array_membership_filter(F.col("tags"), ["y", "z"])).collect()
    assert sorted(r.id for r in got) == [1, 2]


def test_union_distinct_by_key(spark):
    a = spark.createDataFrame([(1, "p"), (2, "q")], "id int, v string")
    b = spark.createDataFrame([(2, "q"), (3, "r")], "id int, v string")
    out = union_distinct_by_key([a, b], "id")
    assert {(r.id, r.v) for r in out.collect()} == {(1, "p"), (2, "q"), (3, "r")}


class TestDistributedNtile:
    """distributed_rank / ntile_from_rank / distributed_ntile must be
    row-identical to the partition-less window forms they replace
    (judge r09 finding #1: entity-cardinality frames through one window
    task) while never planning a window over the data rows."""

    def _df(self, spark, t, seed=7):
        import random

        rng = random.Random(seed)
        rows = [(i, rng.randrange(0, max(1, t // 3))) for i in range(t)]
        return spark.createDataFrame(rows, "id long, v long")

    def test_rank_matches_row_number(self, spark):
        from pyspark.sql import Window

        from backend_big_data_spark.operators.windows import distributed_rank

        df = self._df(spark, 257)
        order = [F.desc("v"), F.col("id")]
        got = {
            (r.id, r.rank)
            for r in distributed_rank(df, order, "rank").collect()
        }
        want = {
            (r.id, r.rank)
            for r in df.withColumn(
                "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
            ).collect()
        }
        assert got == want

    @pytest.mark.parametrize("t,n", [(0, 5), (1, 5), (3, 5), (100, 5),
                                     (101, 10), (105, 10), (257, 3)])
    def test_ntile_matches_sql_ntile(self, spark, t, n):
        from pyspark.sql import Window

        from backend_big_data_spark.operators.windows import distributed_ntile

        df = self._df(spark, t, seed=t + n)
        order = [F.col("v"), F.col("id")]
        got = {
            (r.id, r.tile)
            for r in distributed_ntile(df, n, order, "tile").collect()
        }
        want = {
            (r.id, r.tile)
            for r in df.withColumn(
                "tile", F.ntile(n).over(Window.orderBy(*order))
            ).collect()
        }
        assert got == want

    def test_no_window_over_data_rows(self, spark):
        """The only ordered window in the plan runs over the bounded
        per-partition counts frame (keyed on __dr_pid), never the data."""
        import contextlib
        import io

        from backend_big_data_spark.operators.windows import distributed_ntile

        df = self._df(spark, 64)
        out = distributed_ntile(df, 5, [F.col("v"), F.col("id")], "tile")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert "ntile(" not in plan
        for line in plan.splitlines():
            if "windowspecdefinition(" in line:
                assert "__dr_pid" in line


def test_grouped_distributed_rank_equals_window(spark):
    """Property: grouped_distributed_rank == row_number() OVER
    (PARTITION BY g ORDER BY ...) on uneven multi-partition groups."""
    from pyspark.sql import Window

    from backend_big_data_spark.operators.windows import (
        grouped_distributed_rank,
    )

    rows = [(g, i, float((i * 17 + g * 7) % 101)) for g in range(5) for i in range(g * 37 + 3)]
    df = spark.createDataFrame(rows, "g int, id int, v double").repartition(7)
    got = {
        (r.g, r.id): r.rnk
        for r in grouped_distributed_rank(
            df, ["g"], [F.desc("v"), F.col("id")], rank_col="rnk"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.col("id"))
    want = {
        (r.g, r.id): r.rnk
        for r in df.withColumn("rnk", F.row_number().over(w)).collect()
    }
    assert got == want


def test_grouped_distributed_ntile_equals_window(spark):
    from pyspark.sql import Window

    from backend_big_data_spark.operators.windows import (
        grouped_distributed_ntile,
    )

    rows = [(g % 3, i, float((i * 29 + g) % 97)) for g in range(3) for i in range(g * 23 + 4)]
    df = spark.createDataFrame(rows, "g int, id int, v double").repartition(5)
    got = {
        (r.g, r.id): r.tile
        for r in grouped_distributed_ntile(
            df, 4, ["g"], [F.col("v"), F.col("id")], "tile"
        ).collect()
    }
    w = Window.partitionBy("g").orderBy(F.col("v"), F.col("id"))
    want = {
        (r.g, r.id): r.tile
        for r in df.withColumn("tile", F.ntile(4).over(w)).collect()
    }
    assert got == want


def test_grouped_distributed_rank_totals(spark):
    from backend_big_data_spark.operators.windows import (
        grouped_distributed_rank,
    )

    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 4)]
    df = spark.createDataFrame(rows, "g string, id int")
    out = grouped_distributed_rank(
        df, ["g"], [F.col("id")], rank_col="r", total_col="n"
    ).collect()
    by_g = {(r.g, r.id): (r.r, r.n) for r in out}
    assert by_g == {
        ("a", 1): (1, 3),
        ("a", 2): (2, 3),
        ("a", 3): (3, 3),
        ("b", 4): (1, 1),
    }


def test_distributed_rank_deterministic_over_cached_input(spark):
    """Regression (r11): over a PERSISTED input, AQE re-planned the
    range exchange separately for the counts and data branches and the
    two (partition, index) spaces diverged — duplicate/dropped ranks,
    nondeterministically. The localCheckpoint pin must keep ranks a
    total 1..n however the input is materialized."""
    from backend_big_data_spark.operators.windows import distributed_rank

    rows = [(i, float((i * 2654435761) % 1000003)) for i in range(50_000)]
    df = spark.createDataFrame(rows, "id long, v double").persist()
    df.count()
    try:
        for _ in range(2):
            r = distributed_rank(df, [F.col("v"), "id"], rank_col="rk")
            stats = r.agg(
                F.count("*").alias("n"),
                F.countDistinct("rk").alias("d"),
                F.min("rk").alias("mn"),
                F.max("rk").alias("mx"),
            ).first()
            assert (
                stats["n"] == stats["d"] == stats["mx"] == 50_000
                and stats["mn"] == 1
            ), stats
    finally:
        df.unpersist()


def test_grouped_distributed_rank_deterministic_over_cached_input(spark):
    from backend_big_data_spark.operators.windows import (
        grouped_distributed_rank,
    )

    rows = [
        ("hot" if i % 20 else f"g{i % 7}", i, float((i * 48271) % 99991))
        for i in range(50_000)
    ]
    df = spark.createDataFrame(rows, "grp string, id long, v double").persist()
    df.count()
    try:
        for _ in range(2):
            r = grouped_distributed_rank(
                df, ["grp"], [F.col("v"), "id"], rank_col="rk"
            )
            bad = (
                r.groupBy("grp")
                .agg(
                    F.count("*").alias("n"),
                    F.countDistinct("rk").alias("d"),
                    F.max("rk").alias("mx"),
                )
                .filter("n != d OR n != mx")
                .count()
            )
            assert bad == 0
    finally:
        df.unpersist()


def test_distributed_rank_reliable_pin(spark, tmp_path):
    """pin='reliable' (DFS checkpoint — the cluster-safe mode that
    survives executor loss) must produce the same total ranking as the
    default localCheckpoint pin, including over a persisted input."""
    from backend_big_data_spark.operators.windows import distributed_rank

    old_dir = spark.sparkContext.getCheckpointDir()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    rows = [(i, float((i * 2654435761) % 1000003)) for i in range(20_000)]
    df = spark.createDataFrame(rows, "id long, v double").persist()
    df.count()
    try:
        r = distributed_rank(
            df, [F.col("v"), "id"], rank_col="rk", pin="reliable"
        )
        stats = r.agg(
            F.count("*").alias("n"),
            F.countDistinct("rk").alias("d"),
            F.min("rk").alias("mn"),
            F.max("rk").alias("mx"),
        ).first()
        assert (
            stats["n"] == stats["d"] == stats["mx"] == 20_000
            and stats["mn"] == 1
        ), stats
    finally:
        df.unpersist()
        if old_dir is not None:
            spark.sparkContext.setCheckpointDir(old_dir)


def test_grouped_distributed_rank_reliable_pin(spark, tmp_path):
    from backend_big_data_spark.operators.windows import (
        grouped_distributed_rank,
    )
    from pyspark.sql import Window

    old_dir = spark.sparkContext.getCheckpointDir()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    rows = [(f"g{i % 5}", i, float((i * 48271) % 9991)) for i in range(2_000)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    try:
        got = {
            (r.grp, r.id): r.rk
            for r in grouped_distributed_rank(
                df, ["grp"], [F.col("v"), "id"], rank_col="rk",
                pin="reliable",
            ).collect()
        }
        w = Window.partitionBy("grp").orderBy(F.col("v"), "id")
        want = {
            (r.grp, r.id): r.rk
            for r in df.withColumn("rk", F.row_number().over(w)).collect()
        }
        assert got == want
    finally:
        if old_dir is not None:
            spark.sparkContext.setCheckpointDir(old_dir)


def test_distributed_rank_pin_validation(spark):
    import pytest as _pytest

    from backend_big_data_spark.operators.windows import distributed_rank

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with _pytest.raises(ValueError, match="pin"):
        distributed_rank(df, ["v", "id"], pin="bogus")


def test_grouped_distributed_rank_null_group_keys(spark):
    """NULL is a valid PARTITION BY partition: rows whose group key is
    NULL must rank within their own group, not vanish (the offsets join
    is null-safe — plain `=` would drop them silently)."""
    from backend_big_data_spark.operators.windows import (
        grouped_distributed_rank,
    )
    from pyspark.sql import Window

    rows = [
        (None, 1, 5.0), (None, 2, 3.0), (None, 3, 4.0),
        ("a", 4, 2.0), ("a", 5, 1.0), (None, 6, 1.0),
    ]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    out = grouped_distributed_rank(
        df, ["grp"], [F.col("v"), "id"], rank_col="rk", total_col="n"
    ).collect()
    assert len(out) == len(rows)  # nothing dropped
    got = {(r.grp, r.id): (r.rk, r.n) for r in out}
    w = Window.partitionBy("grp").orderBy(F.col("v"), "id")
    wn = Window.partitionBy("grp")
    want = {
        (r.grp, r.id): (r.rk, r.n)
        for r in df.withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .collect()
    }
    assert got == want
