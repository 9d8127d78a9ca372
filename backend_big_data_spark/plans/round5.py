"""Round-5 additions: the incremental (recurring-ingest) composition of
SemDeDup — the embedding-space twin of the text ingest dedup path — plus
further curation/analytics queries registered this round.

Reference scope note: the reference's own dedup surface is exact
`dropDuplicates` (`/root/reference/scripts/data_cleaner.py:84`); everything
here is additive LLM-training-pipeline scope (SURVEY.md §2 additive
operators), oracle-gated like the rest of the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table

# Deterministic split/centroids, matching the conventions already proven
# green: centroids = first 10 corpus vectors (fixed-quantizer trick);
# batch = vec_id % 4 == 0 (deterministic ingest slice), corpus = the rest.
_INCR_SEMDEDUP_ORACLE = """
WITH RECURSIVE vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cents AS (
  SELECT CAST(vec_id AS INTEGER) AS cluster, v AS cv FROM vecs WHERE vec_id < 10
), assign AS (
  SELECT vec_id, cluster FROM (
    SELECT vv.vec_id, c.cluster,
           row_number() OVER (PARTITION BY vv.vec_id
                              ORDER BY list_distance(vv.v, c.cv), c.cluster) AS rn
    FROM vecs vv, cents c
  ) WHERE rn = 1
), lab AS (
  SELECT a.vec_id, a.cluster, v.v, (a.vec_id % 4 = 0) AS is_new
  FROM assign a JOIN vecs v USING (vec_id)
), cross_dropped AS (
  SELECT DISTINCT b.vec_id
  FROM lab a JOIN lab b ON a.cluster = b.cluster
  WHERE NOT a.is_new AND b.is_new
    AND list_cosine_similarity(a.v, b.v) > 0.3
), bedges AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM lab a JOIN lab b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE a.is_new AND b.is_new AND list_cosine_similarity(a.v, b.v) > 0.3
), edges2 AS (
  SELECT a, b FROM bedges UNION SELECT b AS a, a AS b FROM bedges
), walk(node, label) AS (
  SELECT DISTINCT a, a FROM edges2
  UNION
  SELECT e.b, w.label FROM walk w JOIN edges2 e ON e.a = w.node
), batch_near_dropped AS (
  SELECT node AS vec_id
  FROM (SELECT node, MIN(label) AS root FROM walk GROUP BY node)
  WHERE node != root
)
SELECT l.vec_id, l.cluster,
       (l.vec_id NOT IN (SELECT vec_id FROM cross_dropped
                         UNION SELECT vec_id FROM batch_near_dropped)) AS kept
FROM lab l WHERE l.is_new
ORDER BY l.vec_id
"""


@register("doc_incremental_semdedup", oracle=_INCR_SEMDEDUP_ORACLE)
def doc_incremental_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup (`similarity/semdedup.py
    ``incremental_semdedup``): the arriving embedding batch (vec_id % 4
    == 0) is assigned to the fixed anchor centroids and compared
    batch-vs-corpus and batch-vs-batch WITHIN clusters only — the at-rest
    corpus is never rescored. Within-batch near pairs resolve
    transitively (min-label CC, keep min id), mirroring
    `doc_incremental_dedup_full`'s composition rule in embedding space.
    Completes the recurring-ingest curation loop for the embedding
    modality (see `streaming/semdedup_ingest.py` for the stream wiring)."""
    from backend_big_data_spark.similarity.semdedup import incremental_semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.col("embedding").cast("array<double>").alias("centroid"),
    )
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    corpus = emb.filter(F.col("vec_id") % 4 != 0)
    return incremental_semdedup(
        batch, corpus, centroids, threshold=0.3
    ).orderBy("vec_id")
