"""Round-9b additions: margin-based pair mining and truncation recall.

- ``similarity/mining.py`` — margin-based kNN pair mining (the
  Artetxe-Schwenk / CCMatrix parallel-pair recipe): ratio-margin scores,
  mutual best matches, exact all-pairs baseline with an armed sizing cap,
  and a sign-LSH candidate path whose bucketing replays bit-for-bit in SQL
  via the md5-derived plane family (same contract as ann_lsh_topk).
- truncated-dimension recall@k — the Matryoshka-style eval run before
  shipping prefix-truncated embeddings to a cheaper ANN tier.

Reference scope note: the reference engine (CiccioRomeo/backend-big-data)
has none of these; they extend the additive ANN/curation capability set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.similarity.mining import (
    margin_knn_pairs,
    margin_knn_pairs_lsh,
    truncated_recall_eval,
)
from backend_big_data_spark.sources.catalog import load_table

# Shared oracle fragments -----------------------------------------------------

_SIDES = """
a AS (
  SELECT vec_id AS a_id, CAST(embedding AS DOUBLE[]) AS av
  FROM embeddings WHERE label < 5
), b AS (
  SELECT vec_id AS b_id, CAST(embedding AS DOUBLE[]) AS bv
  FROM embeddings WHERE label >= 5
)"""

# Margin core over a candidate-pair CTE named `p(a_id, b_id, sim)`; k = 4,
# mutual best matches, threshold on round(margin, 9).
_MARGIN_TAIL = """
r AS (
  SELECT a_id, b_id, sim,
         row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rn_a,
         row_number() OVER (PARTITION BY b_id ORDER BY sim DESC, a_id) AS rn_b
  FROM p
), d AS (
  SELECT a_id, b_id, sim,
         AVG(CASE WHEN rn_a <= 4 THEN sim END) OVER (PARTITION BY a_id) AS da,
         AVG(CASE WHEN rn_b <= 4 THEN sim END) OVER (PARTITION BY b_id) AS db
  FROM r
), m AS (
  -- zero-denominator guard: Spark emits NULL margin when the two
  -- neighborhoods cancel; DuckDB with ieee_floating_point_ops (the
  -- modern default) would give 0/0 = NaN, which sorts GREATEST — so the
  -- oracle must NULL it explicitly rather than rely on x/0 behavior
  SELECT a_id, b_id, sim,
         CASE WHEN (da + db) = 0 THEN NULL
              ELSE sim / ((da + db) / 2) END AS margin,
         ROUND(CASE WHEN (da + db) = 0 THEN NULL
                    ELSE sim / ((da + db) / 2) END, 9) AS mkey
  FROM d
), best AS (
  SELECT a_id, b_id, sim, margin, mkey,
         row_number() OVER (PARTITION BY a_id ORDER BY mkey DESC, b_id) AS ba,
         row_number() OVER (PARTITION BY b_id ORDER BY mkey DESC, a_id) AS bb
  FROM m
)
SELECT a_id, b_id, ROUND(sim, 6) AS cosine_sim, ROUND(margin, 6) AS margin
FROM best
WHERE ba = 1 AND bb = 1 AND mkey >= {threshold}
ORDER BY a_id
"""


@register(
    "embedding_margin_pairs",
    oracle="WITH "
    + _SIDES
    + """,
p AS (
  SELECT a_id, b_id, list_cosine_similarity(av, bv) AS sim FROM a, b
), """
    + _MARGIN_TAIL.format(threshold="1.0"),
)
def embedding_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact margin-based pair mining between the label<5 and label>=5
    halves of the embedding corpus (two 'languages'): ratio margin over
    top-4 neighborhoods, mutual best matches with margin >= 1. The armed
    ``pair_cap`` (4e6, ~4x the sf0.1 pair count) demonstrates the sizing
    rule: at corpus scale the call REFUSES the quadratic regime instead of
    launching it — `embedding_margin_pairs_lsh` is the scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return margin_knn_pairs(
        emb.filter(F.col("label") < 5),
        emb.filter(F.col("label") >= 5),
        k=4,
        threshold=1.0,
        mutual=True,
        pair_cap=4_000_000,
    )


@register(
    "embedding_margin_pairs_lsh",
    oracle="WITH "
    + _SIDES
    + """,
planes AS (
  SELECT t, b,
         list_transform(generate_series(1, 64), i ->
           ((CAST(concat('0x', substr(md5(concat(t, ':', b, ':', i - 1)), 1, 15)) AS BIGINT)
             % 2000001) - 1000000) / 1000000.0) AS pv
  FROM generate_series(0, 5) g1(t), generate_series(0, 5) g2(b)
), ka AS (
  SELECT a_id,
         concat(t, ':', string_agg(
           CASE WHEN list_inner_product(av, pv) > 0 THEN '1' ELSE '0' END,
           '' ORDER BY b)) AS bucket
  FROM a, planes GROUP BY a_id, t
), kb AS (
  SELECT b_id,
         concat(t, ':', string_agg(
           CASE WHEN list_inner_product(bv, pv) > 0 THEN '1' ELSE '0' END,
           '' ORDER BY b)) AS bucket
  FROM b, planes GROUP BY b_id, t
), cand AS (
  SELECT DISTINCT ka.a_id, kb.b_id FROM ka JOIN kb USING (bucket)
), p AS (
  SELECT cand.a_id, cand.b_id, list_cosine_similarity(a.av, b.bv) AS sim
  FROM cand JOIN a USING (a_id) JOIN b USING (b_id)
), """
    + _MARGIN_TAIL.format(threshold="1.0"),
)
def embedding_margin_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin pair mining over sign-LSH candidates — the 100 TB shape
    (neither side broadcast; pair frame is candidate-sized; margins over
    each vector's candidate shortlist, the CCMatrix approximation). The
    md5-derived plane family makes bucketing — hence the full mine —
    SQL-replayable, so this scale path is itself oracle-gated."""
    emb = load_table(spark, sf_dir, "embeddings")
    return margin_knn_pairs_lsh(
        emb.filter(F.col("label") < 5),
        emb.filter(F.col("label") >= 5),
        k=4,
        threshold=1.0,
        mutual=True,
        num_bits=6,
        num_tables=6,
        dim=64,
        plane_source="md5",
    )


@register(
    "embedding_trunc_recall",
    oracle="""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < 20
), truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, c.v) DESC, c.vec_id) AS rnk
    FROM q, vecs c WHERE c.vec_id != q.query_id
  ) WHERE rnk <= 10
), arms AS (SELECT UNNEST([16, 32]) AS dim), trunc AS (
  SELECT dim, query_id, neighbor_id FROM (
    SELECT arms.dim, q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY arms.dim, q.query_id
             ORDER BY list_cosine_similarity(q.qv[1:arms.dim], c.v[1:arms.dim]) DESC,
                      c.vec_id) AS rnk
    FROM arms, q, vecs c WHERE c.vec_id != q.query_id
  ) WHERE rnk <= 10
)
SELECT t.query_id, CAST(arms.dim AS INTEGER) AS dim,
       CAST(COUNT(tr.neighbor_id) AS INTEGER) AS hits,
       ROUND(COUNT(tr.neighbor_id) / 10.0, 6) AS recall
FROM truth t
CROSS JOIN arms
LEFT JOIN trunc tr
  ON tr.dim = arms.dim AND tr.query_id = t.query_id
 AND tr.neighbor_id = t.neighbor_id
GROUP BY t.query_id, arms.dim
ORDER BY t.query_id, arms.dim
""",
)
def embedding_trunc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation eval: recall@10 of prefix-16 and prefix-32
    cosine retrieval against the full 64-dim ground truth, per query
    (20 bounded eval queries, broadcast; corpus streams map-side)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return truncated_recall_eval(
        emb, emb.filter(F.col("vec_id") < 20), k=10, dims=(16, 32)
    )


# Shared round budget: the SQL oracle replays the peel as a static
# _KCORE_ROUNDS-step CTE chain (no-ops past the fixed point), and the Spark
# loop gets max_iter = _KCORE_ROUNDS + 1 because it spends one extra no-op
# round DETECTING convergence — deriving both from one constant means a
# peel that exhausts the oracle's budget raises loudly on the Spark side
# instead of silently hash-mismatching (sf0.1 converges in 24 rounds).
_KCORE_ROUNDS = 32


def _kcore_oracle(k: int = 3, rounds: int = _KCORE_ROUNDS) -> str:
    """Static CTE-chain replay of the batch peel (the PageRank/LPA oracle
    pattern): ``rounds`` is a generous budget — peeling is monotone, so
    every round past the fixed point is a no-op and the chain's tail
    equals the converged core the Spark loop stops at."""
    parts = [
        """WITH purchases AS MATERIALIZED (
  SELECT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
         concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
), und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM purchases
), e0 AS MATERIALIZED (
  SELECT a, b FROM und UNION ALL SELECT b, a FROM und
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""", n{i} AS MATERIALIZED (
  SELECT a FROM e{i - 1} GROUP BY a HAVING COUNT(*) >= {k}
), e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{i - 1} e
  JOIN n{i} x ON x.a = e.a JOIN n{i} y ON y.a = e.b
)"""
        )
    parts.append(
        f"""
SELECT a AS node, CAST(COUNT(*) AS INTEGER) AS core_deg
FROM e{rounds} GROUP BY a ORDER BY node"""
    )
    return "".join(parts)


@register("supply_graph_kcore", oracle=_kcore_oracle())
def supply_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the repeat-purchase graph (customer—supplier edges with
    >= 2 purchases): the dense trading kernel after cascading removal of
    peripheral nodes. Distributed batch peeling with an edge-count
    convergence certificate; the oracle replays the peel as a 32-round
    CTE chain (no-op past the fixed point). Stays off the bench headline
    for the LPA/PageRank reason: wall time is driver-synced peel rounds
    (24 at sf0.1), not data throughput."""
    from backend_big_data_spark.operators.graph import k_core

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    purchases = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    return k_core(purchases, k=3, max_iter=_KCORE_ROUNDS + 1).orderBy("node")


@register(
    "embedding_covariance",
    oracle="""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), e AS (
  SELECT vec_id, g.i, v[g.i + 1] AS x
  FROM vecs, generate_series(0, 63) g(i)
), p AS (
  SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS sxy, COUNT(*) AS n
  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
), s AS (
  SELECT i, SUM(x) AS sx FROM e GROUP BY i
)
SELECT CAST(p.i AS INTEGER) AS i, CAST(p.j AS INTEGER) AS j,
       FLOOR((p.sxy / p.n - (sa.sx / p.n) * (sb.sx / p.n)) * 1000000 + 0.5)
         / 1000000 AS cov
FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
ORDER BY p.i, p.j
""",
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 64x64 covariance of the embedding corpus, long format (upper
    triangle): the PCA/whitening training pass. Map-side expansion to
    pairwise products through JVM higher-order functions (a row never
    meets another row — the oracle's self-join is the SEMANTIC twin, not
    the plan) + one partial-aggregated keyed shuffle whose volume is
    O(dim^2 x partitions), independent of corpus size."""
    from backend_big_data_spark.similarity.pca import (
        embedding_covariance as cov_op,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return cov_op(emb, dim=64)


_MARGIN_STREAM_ORACLE = """
WITH m0 AS (
  SELECT min(vec_id) AS id, embedding
  FROM embeddings WHERE vec_id % 2 = 0 GROUP BY embedding
), m AS (
  SELECT id AS b_id, CAST(embedding AS DOUBLE[]) AS bv FROM m0
), q AS (
  SELECT vec_id AS a_id, CAST(embedding AS DOUBLE[]) AS av
  FROM embeddings WHERE vec_id % 2 = 1
), planes AS (
  SELECT t, b,
         list_transform(generate_series(1, 64), i ->
           ((CAST(concat('0x', substr(md5(concat(t, ':', b, ':', i - 1)), 1, 15)) AS BIGINT)
             % 2000001) - 1000000) / 1000000.0) AS pv
  FROM generate_series(0, 5) g1(t), generate_series(0, 5) g2(b)
), km AS (
  SELECT b_id,
         concat(t, ':', string_agg(
           CASE WHEN list_inner_product(bv, pv) > 0 THEN '1' ELSE '0' END,
           '' ORDER BY b)) AS bucket
  FROM m, planes GROUP BY b_id, t
), kq AS (
  SELECT a_id,
         concat(t, ':', string_agg(
           CASE WHEN list_inner_product(av, pv) > 0 THEN '1' ELSE '0' END,
           '' ORDER BY b)) AS bucket
  FROM q, planes GROUP BY a_id, t
), cand AS (
  SELECT DISTINCT kq.a_id, km.b_id FROM kq JOIN km USING (bucket)
), p AS (
  SELECT cand.a_id, cand.b_id, list_cosine_similarity(q.av, m.bv) AS sim
  FROM cand JOIN q USING (a_id) JOIN m USING (b_id)
), r AS (
  SELECT a_id, b_id, sim,
         row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rn_a,
         row_number() OVER (PARTITION BY b_id ORDER BY sim DESC, a_id) AS rn_b
  FROM p
), d AS (
  SELECT a_id, b_id, sim,
         AVG(CASE WHEN rn_a <= 4 THEN sim END) OVER (PARTITION BY a_id) AS da,
         AVG(CASE WHEN rn_b <= 4 THEN sim END) OVER (PARTITION BY b_id) AS db
  FROM r
), sc AS (
  -- zero-denominator guard — see _MARGIN_TAIL: NULL, not NaN, on (da+db)=0
  SELECT a_id, b_id, sim,
         CASE WHEN (da + db) = 0 THEN NULL
              ELSE sim / ((da + db) / 2) END AS margin,
         ROUND(CASE WHEN (da + db) = 0 THEN NULL
                    ELSE sim / ((da + db) / 2) END, 9) AS mkey
  FROM d
), ranked AS (
  SELECT a_id, b_id, sim, margin, mkey,
         CAST(row_number() OVER (PARTITION BY a_id
                                 ORDER BY mkey DESC, b_id) AS INTEGER) AS rank
  FROM sc
)
SELECT a_id AS dirty_id, b_id AS master_id, rank,
       ROUND(sim, 6) AS cosine_sim, ROUND(margin, 6) AS margin
FROM ranked WHERE rank <= 1 AND mkey >= 1.0
ORDER BY dirty_id, master_id
"""


@register("embedding_margin_link_stream", oracle=_MARGIN_STREAM_ORACLE)
def embedding_margin_link_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming embedding entity resolution, end to end through the SINK
    (`streaming/margin_ingest.margin_ingest_sink`): batch 0 admits the
    even-vec_id embeddings as master entities (exact-duplicate vectors
    resolve to the min id — the sink's admission rule) and stores their
    LSH bucket keys; batch 1 margin-links every odd-vec_id record against
    the maintained bucket sidecar, emitting each record's best master by
    ratio margin (9-dp key, master-id tie-break) at margin >= 1. The
    oracle is a pure-SQL twin of the whole admit->link pipeline (md5
    plane family), so the gate certifies the SINK semantics.

    The sink runs against a throwaway master dir (per-invocation temp
    path; content — and therefore the result hash — is path-independent).
    """
    from backend_big_data_spark.streaming.margin_ingest import (
        margin_ingest_sink,
    )

    import os as _os
    import tempfile as _tempfile

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mdir = _tempfile.mkdtemp(prefix="margin_link_stream_")
    sink = margin_ingest_sink(mdir, dim=64, knn_k=4, threshold=1.0, link_k=1)
    sink(
        emb.where(F.col("vec_id") % 2 == 0).select(
            F.col("vec_id").alias("id"), "embedding"
        ),
        0,
    )
    sink(
        emb.where(F.col("vec_id") % 2 == 1).select(
            F.col("vec_id").alias("id"), "embedding"
        ),
        1,
    )
    return spark.read.parquet(_os.path.join(mdir, "links", "batch=1")).orderBy(
        "dirty_id", "master_id"
    )


@register(
    "ann_multiprobe_topk",
    oracle="""
WITH planes AS (
  SELECT t, b,
         list_transform(generate_series(1, 64), i ->
           ((CAST(concat('0x', substr(md5(concat(t, ':', b, ':', i - 1)), 1, 15)) AS BIGINT)
             % 2000001) - 1000000) / 1000000.0) AS pv
  FROM generate_series(0, 2) g1(t), generate_series(0, 5) g2(b)
), vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), ips AS (
  SELECT vec_id, t, b, list_inner_product(v, pv) AS ip FROM vecs, planes
), base AS (
  SELECT vec_id, t,
         string_agg(CASE WHEN ip > 0 THEN '1' ELSE '0' END,
                    '' ORDER BY b) AS bits
  FROM ips GROUP BY vec_id, t
), ckeys AS (
  SELECT vec_id, concat(t, ':', bits) AS bucket FROM base
), franks AS (
  SELECT vec_id, t, b, ip,
         row_number() OVER (PARTITION BY vec_id, t
                            ORDER BY abs(ip), b) AS fr
  FROM ips WHERE vec_id < 10
), flipped AS (
  SELECT f.vec_id, f.t, p.p,
         string_agg(CASE WHEN f.fr = p.p
                         THEN (CASE WHEN f.ip > 0 THEN '0' ELSE '1' END)
                         ELSE (CASE WHEN f.ip > 0 THEN '1' ELSE '0' END) END,
                    '' ORDER BY f.b) AS bits
  FROM franks f, generate_series(1, 2) p(p)
  GROUP BY f.vec_id, f.t, p.p
), qkeys AS (
  SELECT vec_id, concat(t, ':', bits) AS bucket FROM base WHERE vec_id < 10
  UNION ALL
  SELECT vec_id, concat(t, ':', bits) AS bucket FROM flipped
), cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM qkeys q JOIN ckeys c USING (bucket)
  WHERE c.vec_id != q.vec_id
), s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv.v, nv.v) AS sim
  FROM cand
  JOIN vecs qv ON qv.vec_id = cand.query_id
  JOIN vecs nv ON nv.vec_id = cand.neighbor_id
), r AS (
  SELECT query_id, neighbor_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim, rnk
FROM r WHERE rnk <= 5 ORDER BY query_id, rnk
""",
)
def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH ANN at HALF ann_lsh_topk's table count (3 vs
    6): each query also probes the 2 radius-1 buckets of its
    lowest-|margin| hash bits, recovering the recall an extra table would
    buy without storing or shuffling another corpus index copy — the
    recall-per-byte lever at 100 TB. Candidate generation (bit flips
    included) replays exactly in SQL via the md5 plane family."""
    from backend_big_data_spark.similarity.ann import lsh_multiprobe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_multiprobe_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        num_bits=6,
        num_tables=3,
        probes=2,
        dim=64,
        plane_source="md5",
    )


def _cov_oracle() -> str:
    from backend_big_data_spark.plans.registry import ORACLES

    return ORACLES["embedding_covariance"]


@register("embedding_cov_incremental", oracle=_cov_oracle())
def embedding_cov_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental covariance from the margin sink's MAINTAINED moment
    sidecars: the corpus is ingested as two micro-batches (even then odd
    vec_ids; ``threshold=inf`` disarms linking UNCONDITIONALLY — ``mkey
    >= inf`` is never true, with no finite sentinel a degenerate-denominator
    margin could exceed — and ``dedup_exact=False`` disables the ER
    admission dedup so every corpus row, including exact-duplicate
    embeddings, reaches the master and its moments), and the covariance is
    finished from `read_master_moments` + `pca.covariance_from_moments` —
    no vector is rescanned. The oracle is the full-retrain twin
    (embedding_covariance's SQL verbatim): the hash equality IS the claim,
    the lm_ingest incremental-model discipline applied to the PCA training
    pass. If the moment sidecar fails its coverage guard the query falls
    back to the full-scan covariance (result-invariant, just slower).

    Throwaway per-invocation master dir; content is path-independent."""
    import tempfile as _tempfile

    from backend_big_data_spark.similarity.pca import (
        covariance_from_moments,
        embedding_covariance,
    )
    from backend_big_data_spark.streaming.margin_ingest import (
        margin_ingest_sink,
        read_master_moments,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mdir = _tempfile.mkdtemp(prefix="cov_incremental_")
    sink = margin_ingest_sink(
        mdir, dim=64, threshold=float("inf"), dedup_exact=False
    )
    sink(
        emb.where(F.col("vec_id") % 2 == 0).select(
            F.col("vec_id").alias("id"), "embedding"
        ),
        0,
    )
    sink(
        emb.where(F.col("vec_id") % 2 == 1).select(
            F.col("vec_id").alias("id"), "embedding"
        ),
        1,
    )
    moments = read_master_moments(spark, mdir)
    if moments is None:  # coverage guard tripped — documented fallback
        return embedding_covariance(emb, dim=64)
    return covariance_from_moments(moments)


@register(
    "embedding_drift_report",
    oracle="""
WITH e AS (
  SELECT vec_id % 2 AS half, g.i, CAST(embedding AS DOUBLE[])[g.i + 1] AS x
  FROM embeddings, generate_series(0, 63) g(i)
), s AS (
  SELECT half, i, SUM(x) AS sx, SUM(x * x) AS sxx, COUNT(*) AS n
  FROM e GROUP BY half, i
), m AS (
  SELECT i,
         r.sx / r.n AS mu_ref, c.sx / c.n AS mu_cur,
         r.sxx / r.n - (r.sx / r.n) * (r.sx / r.n) AS var_ref,
         c.sxx / c.n - (c.sx / c.n) * (c.sx / c.n) AS var_cur
  FROM s r JOIN s c USING (i) WHERE r.half = 0 AND c.half = 1
)
SELECT CAST(i AS INTEGER) AS i,
       FLOOR(mu_ref * 1000000 + 0.5) / 1000000 AS mean_ref,
       FLOOR(mu_cur * 1000000 + 0.5) / 1000000 AS mean_cur,
       FLOOR((mu_cur - mu_ref) * 1000000 + 0.5) / 1000000 AS mean_shift,
       FLOOR(CASE WHEN var_ref > 0 THEN var_cur / var_ref END * 1000000 + 0.5)
         / 1000000 AS var_ratio
FROM m ORDER BY i
""",
)
def embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding distribution drift between two corpus
    snapshots (here: even vs odd vec_ids as reference vs current — the
    retraining-set monitoring readout): mean shift and variance ratio
    per dimension, floor-quantized (the covariance family's fixed-point
    parity discipline; a NULL var_ratio marks a degenerate reference
    dimension, matching SQL x/0). One pass per half — two hash
    aggregates of dim-keyed partials, no window, no collect; the readout
    formula is shared with the sidecar twin
    (`pca.drift_readout`) — at 100 TB the same readout reads the
    maintained moment sidecars instead of the corpus, and
    `embedding_drift_from_moments` certifies that equivalence."""
    from backend_big_data_spark.similarity.pca import drift_readout

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
    )
    s = e.groupBy("half", "i").agg(
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.count(F.lit(1)).alias("n"),
    )
    return drift_readout(
        s.filter(F.col("half") == 0).select("i", "sx", "sxx", "n"),
        s.filter(F.col("half") == 1).select("i", "sx", "sxx", "n"),
    )
