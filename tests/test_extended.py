"""Tests: IVF ANN invariants, winnowing properties, cube levels, sketch
accuracy, SQL frontend."""

from __future__ import annotations

from pyspark.sql import functions as F

from backend_big_data_spark.similarity.ann import (
    brute_force_cosine_topk,
    ivf_cosine_topk,
)
from backend_big_data_spark.sources.catalog import load_table
from backend_big_data_spark.text.dedup import winnowing_fingerprints
from tests.conftest import SF_SMALL


def test_ivf_with_full_probe_equals_brute_force(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in brute_force_cosine_topk(emb, q, k=3).collect()
    }
    ivf_all = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in ivf_cosine_topk(emb, q, k=3, nlist=4, nprobe=4).collect()
    }
    assert ivf_all == exact  # probing every list degrades to exact search


def test_ivf_partial_probe_shape(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    rows = ivf_cosine_topk(emb, q, k=3, nlist=8, nprobe=2).collect()
    per_query = {}
    for r in rows:
        per_query.setdefault(r.query_id, []).append(r.rnk)
    assert set(per_query) == {0, 1, 2, 3, 4}
    assert all(sorted(v) == [1, 2, 3] for v in per_query.values())


def test_winnowing_shared_substring_guarantee(spark):
    base = "the quick brown fox jumps over the lazy dog by the river"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),                                  # identical
            (3, "PREFIX " + base + " SUFFIX"),          # contains base
            (4, "zzz completely unrelated words qqq"),
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in winnowing_fingerprints(df, k=5, window=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert fps[1] == fps[2]                      # deterministic
    # winnowing guarantee: shared substring ≥ k+window-1 chars ⇒ shared
    # fingerprint; the containing doc shares most of the base's prints
    assert len(fps[1] & fps[3]) / len(fps[1]) > 0.6
    assert not (fps[1] & fps[4])


def test_cube_has_all_grouping_sets(spark):
    from backend_big_data_spark.plans.all_plans import QUERIES

    rows = QUERIES["orders_cube"](spark, SF_SMALL).collect()
    levels = {(r.g_status, r.g_priority) for r in rows}
    assert levels == {(0, 0), (0, 1), (1, 0), (1, 1)}
    grand = [r for r in rows if (r.g_status, r.g_priority) == (1, 1)]
    leaves = [r for r in rows if (r.g_status, r.g_priority) == (0, 0)]
    assert grand[0].order_count == sum(r.order_count for r in leaves)


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF_SMALL, "events")
    both = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
        )
        .collect()
    )
    assert len(both) > 0
    for r in both:
        assert abs(r.approx - r.exact) <= max(3, 0.15 * r.exact)


def test_sql_frontend_runs_same_string_in_duckdb(spark, duck):
    from backend_big_data_spark.plans.all_plans import ORACLES, QUERIES

    got = {
        r.n_name: (r.customer_count, r.avg_acctbal)
        for r in QUERIES["sql_frontend_customers_by_nation"](spark, SF_SMALL).collect()
    }
    want = {
        n: (c, a)
        for n, c, a in duck.execute(
            ORACLES["sql_frontend_customers_by_nation"]
        ).fetchall()
    }
    assert got == want


def test_hll_rollup_union_is_lossless_and_bounded(spark):
    """Day-sketch → union-merge must equal a direct one-pass sketch
    (register-wise max is associative at fixed lgConfigK), and both must
    sit within the sketch's relative error of exact countDistinct. The
    registered query (since r07: the banded, oracle-gated form in
    plans/round7.py) must report every merged estimate in-band with the
    true exact counts alongside."""
    from backend_big_data_spark.plans.all_plans import QUERIES

    ev = load_table(spark, SF_SMALL, "events")
    # the rollup's merge stages, run standalone for the losslessness check
    rolled = {
        r.event_type: r.approx_users
        for r in ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", 14).alias("sketch"))
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch", False)).alias(
                "approx_users"
            )
        )
        .collect()
    }
    direct = {
        r.event_type: r.approx_users
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias(
                "approx_users"
            )
        )
        .collect()
    }
    exact = {
        r.event_type: r.exact_users
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert rolled == direct  # merge loses nothing vs one-pass
    for t, est in rolled.items():
        assert abs(est - exact[t]) / exact[t] < 0.05  # lgK=14 rsd ≈ 0.8%

    # the registered banded form: exact counts true, every verdict in-band
    gated = QUERIES["events_hll_user_rollup"](spark, SF_SMALL).collect()
    assert {r.event_type: r.exact_users for r in gated} == exact
    assert all(r.merged_within_band for r in gated)


def test_priority_status_arrays_matches_scalar_twin(spark):
    """The API-facing array form and the oracle-facing pipe-joined twin
    must agree row-for-row (same aggregation, different projection)."""
    from backend_big_data_spark.plans.extended import (
        priority_status_arrays,
        priority_status_sets,
    )

    arr = {
        r.o_orderpriority: (list(r.statuses), r.status_count)
        for r in priority_status_arrays(spark, SF_SMALL).collect()
    }
    flat = {
        r.o_orderpriority: (r.statuses.split("|"), r.status_count)
        for r in priority_status_sets(spark, SF_SMALL).collect()
    }
    assert arr == flat
    assert all(v[0] == sorted(v[0]) for v in arr.values())


def test_release_dedup_caches_unpersists(spark):
    from backend_big_data_spark.text import dedup

    shingled = dedup.doc_shingles(
        load_table(spark, SF_SMALL, "documents").limit(20)
    )
    shingled.count()
    assert shingled.storageLevel.useMemory
    released = dedup.release_dedup_caches()
    assert released >= 1
    assert not shingled.storageLevel.useMemory
