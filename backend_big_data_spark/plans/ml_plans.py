"""ML query plans (SURVEY.md §2.10) — iterative algorithms, rows-only checks
(KMeans/FPGrowth are not SQL-expressible; the driver records the weaker
rows/schema check and unit tests assert semantics on fixtures)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.functions.textfns import tokens
from backend_big_data_spark.ml.clustering import assign_to_centroids
from backend_big_data_spark.ml.fpm import frequent_itemsets
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table


@register(
    "kmeans_embedding_clusters",
    oracle="""
WITH vecs AS (
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
)
SELECT cluster, COUNT(*) AS point_count
FROM assign GROUP BY 1 ORDER BY 1
""",
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 (mlqueries.py:14-61) over the embeddings table, oracle-gated via
    the fixed-quantizer trick (same as IVF): cluster assignment against a
    DETERMINISTIC centroid frame (the first 10 corpus vectors) is a pure
    argmin — broadcast crossJoin + keyed window — so the whole query
    replays in SQL. Only centroid TRAINING (iterative seeded Lloyd) is
    inherently rows-only; `ml/clustering.kmeans_fit_predict` keeps that
    path with its blob-recovery pytest. Ordering by squared L2 vs the
    oracle's `list_distance` (sqrt) agrees — sqrt is monotone and both
    sides sum the dims in list order."""
    emb = load_table(spark, sf_dir, "embeddings")
    cvec = F.col("embedding").cast("array<double>")
    fixed = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").cast("int").alias("cluster"), cvec.alias("centroid")
    )
    labeled = assign_to_centroids(emb, fixed, array_col="embedding")
    return (
        labeled.groupBy("cluster")
        .agg(F.count("*").alias("point_count"))
        .orderBy("cluster")
    )


@register("doc_token_itemsets")  # rows-only: FPGrowth
def doc_token_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 (mlqueries.py:148-170) with documents-as-transactions: frequent
    token itemsets at high support (word-soup corpus → keep support high so
    the lattice stays small)."""
    docs = load_table(spark, sf_dir, "documents")
    tx = docs.select(tokens(F.col("text")).alias("toks"))
    return frequent_itemsets(tx, "toks", min_support=0.7, min_confidence=0.9)
