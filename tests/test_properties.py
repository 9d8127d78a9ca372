"""Property-based tests (SURVEY.md §5.2): pagination partitions the ordered
result exactly, union+dedup idempotence, argmax-of-struct equals
sort-desc-first, minhash estimate bounds. Hypothesis drives the inputs;
example counts are capped because each example is a Spark job."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from backend_big_data_spark.operators.aggregates import argmax_per_group
from backend_big_data_spark.operators.windows import paginate

_settings = settings(max_examples=8, deadline=None)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),          # id (may repeat)
        st.integers(min_value=-5, max_value=5),          # group key
        st.integers(min_value=-1000, max_value=1000),    # value
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy, page_size=st.integers(min_value=1, max_value=7))
@_settings
def test_pagination_partitions_ordered_result(spark, rows, page_size):
    df = spark.createDataFrame(rows, "id long, grp long, val long").dropDuplicates(["id"])
    expected = [r.id for r in df.orderBy("id").collect()]
    got: list[int] = []
    page = 1
    while True:
        chunk = [r.id for r in paginate(df, ["id"], page, page_size).collect()]
        if not chunk:
            break
        got.extend(chunk)
        page += 1
    assert got == expected  # concatenated pages == total order, no gaps/dups


@given(rows=rows_strategy)
@_settings
def test_union_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "id long, grp long, val long")
    once = df.unionByName(df).dropDuplicates(["id"])
    twice = once.unionByName(once).dropDuplicates(["id"])
    assert sorted(r.id for r in once.collect()) == sorted(
        r.id for r in twice.collect()
    )
    assert once.count() == df.select("id").distinct().count()


@given(rows=rows_strategy)
@_settings
def test_argmax_struct_equals_sort_desc_first(spark, rows):
    df = spark.createDataFrame(rows, "id long, grp long, val long")
    got = {
        r.grp: (r.win_val, r.win_id)
        for r in argmax_per_group(
            df,
            group_by=["grp"],
            order_cols=[F.col("val"), F.col("id")],
            payload={"win_val": F.col("val"), "win_id": F.col("id")},
        ).collect()
    }
    want = {}
    for rid, grp, val in rows:
        cur = want.get(grp)
        if cur is None or (val, rid) > cur:
            want[grp] = (val, rid)
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"), min_size=12, max_size=60
        ),
        min_size=2,
        max_size=6,
    )
)
@_settings
def test_minhash_estimates_bounded_and_canonical(spark, texts):
    from backend_big_data_spark.text.dedup import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sh = doc_shingles(df)
    pairs = lsh_candidate_pairs(minhash_signatures(sh, 8), 8, 2).collect()
    for r in pairs:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.doc_a < r.doc_b          # canonical orientation, no dupes
    keys = [(r.doc_a, r.doc_b) for r in pairs]
    assert len(keys) == len(set(keys))
