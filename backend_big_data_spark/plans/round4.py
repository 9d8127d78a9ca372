"""Round-4 additions: composed ANN (IVF lists over SQ8 codes with
full-precision re-rank) and ingest-dedup composition queries.

Kept in their own module so the plan files whose queries hold standing
driver certifications stay byte-stable (the registry window rotates per
round; un-drifted files keep their prior-round rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.similarity.ann import ivf_sq8_cosine_topk
from backend_big_data_spark.sources.catalog import load_table

#: Shared SQ8 dequantization CTEs (embeddings → per-dim stats → dequantized
#: vectors) — identical arithmetic to similarity/ann._sq8_dequant_expr.
_SQ8_CTES = """
vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), e AS (
  SELECT vec_id, i, v[i] AS x FROM vecs, generate_series(1, 64) g(i)
), stats AS (
  SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY i
), d AS (
  SELECT e.vec_id, e.i,
         CASE WHEN s.mx > s.mn
              THEN s.mn + FLOOR((e.x - s.mn) / (s.mx - s.mn) * 255 + 0.5)
                   * (s.mx - s.mn) / 255
              ELSE s.mn END AS dx
  FROM e JOIN stats s USING (i)
), dv AS (
  SELECT vec_id, list(dx ORDER BY i) AS v FROM d GROUP BY vec_id
)"""


@register(
    "ann_ivf_sq8_topk",
    oracle=f"""
WITH {_SQ8_CTES},
cents AS (
  SELECT vec_id AS list_id, v AS cv FROM vecs WHERE vec_id < 8
), assign AS (
  SELECT vec_id, list_id FROM (
    SELECT vv.vec_id, c.list_id,
           row_number() OVER (PARTITION BY vv.vec_id
                              ORDER BY list_cosine_similarity(vv.v, c.cv) DESC,
                                       c.list_id) AS arn
    FROM vecs vv, cents c
  ) WHERE arn = 1
), probes AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vv.vec_id, c.list_id,
           row_number() OVER (PARTITION BY vv.vec_id
                              ORDER BY list_cosine_similarity(vv.v, c.cv) DESC,
                                       c.list_id) AS prn
    FROM vecs vv, cents c WHERE vv.vec_id < 10
  ) WHERE prn <= 3
), cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a USING (list_id)
  WHERE a.vec_id != p.query_id
), approx AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv.v, nq.v) AS asim
  FROM cand
  JOIN vecs qv ON qv.vec_id = cand.query_id
  JOIN dv nq ON nq.vec_id = cand.neighbor_id
), short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY asim DESC, neighbor_id) AS srn
    FROM approx
  ) WHERE srn <= 15
), s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv.v, nv.v) AS sim
  FROM short
  JOIN vecs qv ON qv.vec_id = short.query_id
  JOIN vecs nv ON nv.vec_id = short.neighbor_id
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
def ann_ivf_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×SQ8 composed ANN (similarity/ann.py ``ivf_sq8_cosine_topk``):
    coarse quantizer prunes lists (nprobe=3 of nlist=8), SQ8 codes make
    the in-list scan 4× smaller, top-15 shortlist re-ranks against
    full-precision vectors. Fixed centroids (first 8 corpus vectors) +
    deterministic quantizer ⇒ every stage replays in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    cvec = F.col("embedding").cast("array<double>")
    fixed = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("list_id"), cvec.alias("centroid")
    )
    return ivf_sq8_cosine_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        k=5,
        nprobe=3,
        rerank=15,
        centroids=fixed,
        dim=64,
    )
