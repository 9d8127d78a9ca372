"""ML + similarity tests (SURVEY.md §5.2): seeded KMeans recovers planted
blobs; FPGrowth matches hand-computed support/confidence; brute-force ANN is
exact on crafted vectors; LSH ANN achieves high recall vs brute force."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from backend_big_data_spark.ml.clustering import (
    centroid_landmark_distances,
    cluster_sizes,
    kmeans_fit_predict,
)
from backend_big_data_spark.ml.fpm import association_rules, frequent_itemsets
from backend_big_data_spark.similarity.ann import (
    brute_force_cosine_topk,
    lsh_cosine_topk,
)


def test_kmeans_recovers_blobs(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    centers = [(0.0, 0.0), (10.0, 10.0), (-10.0, 5.0)]
    pts = [
        (float(cx + rng.normal(0, 0.3)), float(cy + rng.normal(0, 0.3)))
        for cx, cy in centers
        for _ in range(50)
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    model, labeled = kmeans_fit_predict(df, k=3, feature_cols=["lat", "lon"], seed=42)
    sizes = [r.point_count for r in cluster_sizes(labeled).collect()]
    assert sorted(sizes) == [50, 50, 50]
    found = sorted((round(c[0]), round(c[1])) for c in model.clusterCenters())
    assert found == sorted((int(x), int(y)) for x, y in centers)


def test_centroid_landmark_distances(spark):
    import numpy as np  # noqa: F401

    df = spark.createDataFrame(
        [(48.8566 + i * 0.001, 2.3522) for i in range(10)], "lat double, lon double"
    )
    model, _ = kmeans_fit_predict(df, k=2, feature_cols=["lat", "lon"], seed=1)
    landmarks = spark.createDataFrame(
        [("london", 51.5074, -0.1278)], "name string, lat double, lon double"
    )
    rows = centroid_landmark_distances(model, landmarks, "name", "lat", "lon").collect()
    # both centroids sit in the Paris point cloud → both ~343 km from London
    assert len(rows) == 2 and all(abs(r.distance_km - 343.5) < 3 for r in rows)


def test_fpgrowth_hand_computed(spark):
    # 4 transactions; {a}: 4/4, {b}: 3/4, {a,b}: 3/4; rule b→a conf 1.0
    tx = spark.createDataFrame(
        [(["a", "b"],), (["a", "b", "c"],), (["a"],), (["b", "a"],)],
        "items array<string>",
    )
    fi = {r.itemset: r.freq for r in frequent_itemsets(tx, "items", 0.5, 0.5).collect()}
    assert fi["a"] == 4 and fi["b"] == 3 and fi["a,b"] == 3
    rules = {
        (r.antecedent, r.consequent): (r.confidence, r.support)
        for r in association_rules(tx, "items", 0.5, 0.5).collect()
    }
    assert rules[("b", "a")] == (1.0, 0.75)
    assert rules[("a", "b")][0] == 0.75
    filtered = association_rules(tx, "items", 0.5, 0.5, antecedent_contains="b")
    assert {r.antecedent for r in filtered.collect()} == {"b"}


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_ann_exact(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),   # closest to 0
        (2, [0.0, 1.0]),   # orthogonal
        (3, [-1.0, 0.0]),  # opposite
    ]
    df = _vec_df(spark, rows)
    out = brute_force_cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3)
    got = [(r.neighbor_id, r.rnk) for r in out.collect()]
    assert got == [(1, 1), (2, 2), (3, 3)]
    sims = {r.neighbor_id: r.cosine_sim for r in out.collect()}
    assert abs(sims[1] - 0.9 / math.hypot(0.9, 0.1)) < 1e-6
    assert sims[2] == 0.0 and sims[3] == -1.0


def test_lsh_ann_recall_vs_brute_force(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16))
    rows = []
    vid = 0
    for b in base:
        for _ in range(5):  # 5 tight neighbors per seed point
            rows.append((vid, [float(x) for x in (b + rng.normal(0, 0.05, 16))]))
            vid += 1
    df = _vec_df(spark, rows)
    queries = df.filter(F.col("vec_id") % 5 == 0).limit(8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_cosine_topk(df, queries, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_cosine_topk(
            df, queries, k=3, num_bits=4, num_tables=8, dim=16
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_sq8_recall_vs_brute_force(spark):
    """SQ8 quantization error is span/255 per dim — on well-spread vectors
    the approximate top-3 should almost always equal the exact top-3."""
    import numpy as np

    from backend_big_data_spark.similarity.ann import sq8_cosine_topk

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.standard_normal(16)]) for i in range(80)
    ]
    df = _vec_df(spark, rows)
    queries = df.filter(F.col("vec_id") < 6)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_cosine_topk(df, queries, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sq8_cosine_topk(df, queries, k=3, dim=16).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"SQ8 recall too low: {recall}"


def test_lsh_compose_triggers_no_spark_jobs(spark):
    """Composing the LSH plan must be lazy: ``dim`` is an explicit parameter
    now, so no eager ``first()`` sniff (a driver-side stall at plan-build
    time) ever runs. Asserted via the job-group status tracker."""
    sc = spark.sparkContext
    df = _vec_df(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.5, 0.5])])
    sc.setJobGroup("lsh-compose", "plan composition only")
    try:
        plan = lsh_cosine_topk(df, df, k=1, num_bits=2, num_tables=2, dim=2)
        jobs = sc.statusTracker().getJobIdsForGroup("lsh-compose")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(jobs) == [], f"plan composition ran Spark jobs: {jobs}"
    assert plan.columns  # still a real, composable DataFrame


def test_lsh_md5_planes_match_sql_formula():
    """The md5-derived plane family must equal the SQL derivation value by
    value (this is what makes ann_lsh_topk's oracle replay candidate
    generation exactly)."""
    import duckdb

    from backend_big_data_spark.similarity.ann import _md5_planes

    planes = _md5_planes(dim=4, num_bits=2, num_tables=2)
    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT t, b, i,
               ((CAST(concat('0x', substr(md5(concat(t,':',b,':',i)),1,15)) AS BIGINT)
                 % 2000001) - 1000000) / 1000000.0 AS v
        FROM generate_series(0,1) g1(t), generate_series(0,1) g2(b),
             generate_series(0,3) g3(i)
        """
    ).fetchall()
    for t, b, i, v in rows:
        assert planes[t, b, i] == v, (t, b, i, planes[t, b, i], v)


def test_fpgrowth_small_itemsets_match_sql_counts(spark):
    """Cross-validate FPGrowth against first principles: its frequent 1- and
    2-itemsets must equal plain co-occurrence counting (the SQL-expressible
    fragment of itemset mining)."""
    from pyspark.ml.fpm import FPGrowth
    from pyspark.sql import functions as F

    tx = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            [["a", "b"], ["a", "b", "c"], ["a", "c"], ["b", "c"], ["a"], ["b"]]
        )],
        "id long, items array<string>",
    )
    n = tx.count()
    min_support = 0.3  # floor(0.3*6)=2 transactions
    model = FPGrowth(itemsCol="items", minSupport=min_support, minConfidence=0.1).fit(tx)
    got = {
        tuple(sorted(r["items"])): r["freq"]
        for r in model.freqItemsets.collect()
        if len(r["items"]) <= 2
    }
    single = tx.select(F.explode("items").alias("i")).groupBy("i").count()
    want = {(r.i,): r["count"] for r in single.collect() if r["count"] >= min_support * n}
    e = tx.select("id", F.explode("items").alias("i"))
    pairs = (
        e.alias("a").join(e.alias("b"), (F.col("a.id") == F.col("b.id")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("x"), F.col("b.i").alias("y"))
        .count()
    )
    want.update({(r.x, r.y): r["count"] for r in pairs.collect() if r["count"] >= min_support * n})
    assert got == want and len(want) >= 5


def test_md5_planes_build_fast_and_memoized():
    """Plan-build cost contract: deriving the md5 plane family at
    production-ish dims must not stall the driver (vectorized digest→double
    mapping), and a recompose with the same (dim, bits, tables) must be a
    cache hit returning the identical (read-only) array."""
    import time

    from backend_big_data_spark.similarity.ann import _md5_planes

    t0 = time.monotonic()
    p1 = _md5_planes(dim=1024, num_bits=8, num_tables=4)
    first = time.monotonic() - t0
    assert first < 2.0, f"plane build took {first:.2f}s"
    t0 = time.monotonic()
    p2 = _md5_planes(dim=1024, num_bits=8, num_tables=4)
    cached = time.monotonic() - t0
    assert p2 is p1, "same-shape rebuild must be memoized"
    assert cached < 0.01, f"memoized lookup took {cached:.3f}s"
    assert not p1.flags.writeable  # callers cannot corrupt the cache


def test_ivf_sq8_degrades_to_brute_force(spark):
    """nprobe == nlist and rerank ≥ corpus size ⇒ the composed IVF×SQ8
    pipeline must return EXACTLY the brute-force result: probing every
    list makes candidate generation exhaustive, and a full-width shortlist
    makes the SQ8 stage only an ordering prefilter that the full-precision
    re-rank then corrects."""
    import numpy as np

    from backend_big_data_spark.similarity.ann import ivf_sq8_cosine_topk

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(60)]
    df = _vec_df(spark, rows)
    queries = df.filter(F.col("vec_id") < 5)
    cvec = F.col("embedding").cast("array<double>")
    cents = df.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").cast("int").alias("list_id"), cvec.alias("centroid")
    )
    composed = ivf_sq8_cosine_topk(
        df, queries, k=4, nprobe=6, rerank=60, centroids=cents, dim=16
    ).collect()
    exact = brute_force_cosine_topk(df, queries, k=4).collect()
    assert composed == exact


def test_ivf_sq8_partial_probe_recall(spark):
    """At nprobe < nlist the composed path is approximate but should keep
    high recall on well-separated data (the re-rank repairs SQ8 ordering
    error within the probed lists)."""
    import numpy as np

    from backend_big_data_spark.similarity.ann import ivf_sq8_cosine_topk

    rng = np.random.default_rng(13)
    base = rng.standard_normal((10, 16)) * 4
    rows = []
    vid = 0
    for b in base:
        for _ in range(8):
            rows.append((vid, [float(x) for x in b + rng.normal(0, 0.1, 16)]))
            vid += 1
    df = _vec_df(spark, rows)
    queries = df.filter(F.col("vec_id") % 8 == 0).limit(6)
    cvec = F.col("embedding").cast("array<double>")
    cents = df.filter(F.col("vec_id") % 8 == 4).limit(10).select(
        (F.col("vec_id") / 8).cast("int").alias("list_id"), cvec.alias("centroid")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_cosine_topk(df, queries, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_sq8_cosine_topk(
            df, queries, k=3, nprobe=3, rerank=20, centroids=cents, dim=16
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF×SQ8 recall too low: {recall}"


# ---------------------------------------------------------------------------
# maintained-index IVF serving (similarity/ivf_serve.py)
# ---------------------------------------------------------------------------


def test_ivf_maintained_equals_scratch(spark):
    """Result-invariance of the maintained-index re-blocking: probing
    stored list assignments returns exactly what the scratch path
    (assign at query time) returns, for every nprobe."""
    import random

    from backend_big_data_spark.similarity.ann import ivf_cosine_topk
    from backend_big_data_spark.similarity.ivf_serve import (
        assign_lists,
        ivf_maintained_topk,
    )

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(6)], "list_id int, centroid array<double>"
    )
    queries = corpus.filter("vec_id < 7")
    assigned = assign_lists(corpus, cents)
    for nprobe in (1, 3, 6):
        scratch = ivf_cosine_topk(
            corpus, queries, k=4, nlist=6, nprobe=nprobe, centroids=cents
        ).collect()
        maintained = ivf_maintained_topk(
            assigned, queries, cents, k=4, nprobe=nprobe
        ).collect()
        assert [tuple(r) for r in scratch] == [tuple(r) for r in maintained]


def test_ivf_maintained_corpus_branch_has_no_window(spark):
    """The serving win, asserted on the plan: the maintained path scores
    centroids only on the query side — exactly 2 Window ops (query probe
    top-k + final re-rank) vs the scratch path's 3 (those plus the
    corpus-wide per-vector assignment window)."""
    import random

    from backend_big_data_spark.similarity.ann import ivf_cosine_topk
    from backend_big_data_spark.similarity.ivf_serve import (
        assign_lists,
        ivf_maintained_topk,
    )

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(4)], "list_id int, centroid array<double>"
    )
    queries = corpus.filter("vec_id < 5")
    assigned = assign_lists(corpus, cents).localCheckpoint(eager=True)

    import re

    def window_nodes(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return sum(
            1 for ln in plan.splitlines() if re.search(r"\bWindow \[", ln)
        )

    assert window_nodes(ivf_maintained_topk(assigned, queries, cents, k=3, nprobe=2)) == 2
    assert window_nodes(
        ivf_cosine_topk(corpus, queries, k=3, nlist=4, nprobe=2, centroids=cents)
    ) == 3


def test_multiprobe_recall_at_least_single_probe(spark):
    """Radius-1 probing only ADDS candidate buckets, so at identical
    (bits, tables) the multi-probe result's recall vs brute-force truth
    is >= the single-probe result's — and on this seeded corpus it is
    strictly better (the planted near-ties straddle low-margin bits)."""
    import numpy as np

    from backend_big_data_spark.similarity.ann import (
        brute_force_cosine_topk,
        lsh_cosine_topk,
        lsh_multiprobe_topk,
    )

    rng = np.random.default_rng(21)
    M = rng.standard_normal((400, 16))
    rows = [(i, [float(x) for x in M[i]], 0) for i in range(400)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    q = emb.filter("vec_id < 12")
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_cosine_topk(emb, q, k=5).collect()
    }

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return len(got & truth) / len(truth)

    kw = dict(k=5, num_bits=6, num_tables=2, dim=16, plane_source="md5")
    r_single = recall(lsh_cosine_topk(emb, q, **kw))
    r_multi = recall(lsh_multiprobe_topk(emb, q, probes=3, **kw))
    assert r_multi >= r_single
    assert r_multi > r_single, (r_single, r_multi)


def test_multiprobe_candidates_superset_of_base(spark):
    """Every base-bucket pair survives probing: the multi-probe top-k
    similarity per (query, rank) is >= the single-probe one."""
    import numpy as np

    from backend_big_data_spark.similarity.ann import (
        lsh_cosine_topk,
        lsh_multiprobe_topk,
    )

    rng = np.random.default_rng(5)
    M = rng.standard_normal((150, 16))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in M[i]], 0) for i in range(150)],
        "vec_id bigint, embedding array<float>, label int",
    )
    q = emb.filter("vec_id < 8")
    kw = dict(k=3, num_bits=5, num_tables=2, dim=16, plane_source="md5")
    single = {
        (r.query_id, r.rnk): r.cosine_sim
        for r in lsh_cosine_topk(emb, q, **kw).collect()
    }
    multi = {
        (r.query_id, r.rnk): r.cosine_sim
        for r in lsh_multiprobe_topk(emb, q, probes=2, **kw).collect()
    }
    for key, sim in single.items():
        assert key in multi and multi[key] >= sim, key


def test_multiprobe_validates_probe_count(spark):
    import pytest as _pytest

    from backend_big_data_spark.similarity.ann import lsh_multiprobe_topk

    emb = spark.createDataFrame(
        [(0, [1.0] * 4, 0)], "vec_id bigint, embedding array<float>, label int"
    )
    with _pytest.raises(ValueError, match="probes"):
        lsh_multiprobe_topk(emb, emb, num_bits=4, probes=4, dim=4)
