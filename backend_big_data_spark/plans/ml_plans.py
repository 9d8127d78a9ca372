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


@register(
    "doc_token_itemsets",
    oracle=r"""
WITH tx AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS t
  FROM documents
), n AS (
  -- ceil(minSupport * numRows), computed in IEEE DOUBLE exactly like
  -- Spark's FPGrowth (DuckDB would otherwise parse 0.7 as DECIMAL and
  -- round the product exactly where Scala's double does not)
  SELECT CAST(CEIL(CAST(0.7 AS DOUBLE) * COUNT(*)) AS BIGINT) AS minc FROM tx
), items AS (
  SELECT doc_id, unnest(t) AS item FROM tx
), f1 AS (
  SELECT item, COUNT(*) AS freq FROM items GROUP BY 1
  HAVING COUNT(*) >= (SELECT minc FROM n)
), fitems AS (
  SELECT i.doc_id, i.item FROM items i JOIN f1 ON i.item = f1.item
), f2 AS (
  SELECT a.item AS i1, b.item AS i2, COUNT(*) AS freq
  FROM fitems a JOIN fitems b ON a.doc_id = b.doc_id AND a.item < b.item
  GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT minc FROM n)
), f3 AS (
  SELECT a.item AS i1, b.item AS i2, c.item AS i3, COUNT(*) AS freq
  FROM fitems a JOIN fitems b ON a.doc_id = b.doc_id AND a.item < b.item
       JOIN fitems c ON b.doc_id = c.doc_id AND b.item < c.item
  GROUP BY 1, 2, 3 HAVING COUNT(*) >= (SELECT minc FROM n)
)
SELECT itemset, freq FROM (
  SELECT item AS itemset, freq FROM f1
  UNION ALL SELECT i1 || ',' || i2 AS itemset, freq FROM f2
  UNION ALL SELECT i1 || ',' || i2 || ',' || i3 AS itemset, freq FROM f3
) ORDER BY itemset
""",
)
def doc_token_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 (mlqueries.py:148-170) with documents-as-transactions: frequent
    token itemsets at high support (word-soup corpus → keep support high so
    the lattice stays small), SIZE-CAPPED at 3.

    The cap is what upgrades this from rows-only to oracle-gated: for the
    fixed minSupport, itemsets of size ≤ 3 are exactly the k-way self-join
    on per-doc distinct tokens with a HAVING support threshold — the
    fixed-parameter trick that also rescued KMeans (fixed centroids) and
    LSH (fixed planes). The engine still runs real FPGrowth (parallel
    FP-trees, arXiv:0905.2203 lineage) and filters the lattice; only rule
    MINING beyond small k stays rows-only (`association_rules`)."""
    docs = load_table(spark, sf_dir, "documents")
    tx = docs.select(tokens(F.col("text")).alias("toks"))
    return frequent_itemsets(
        tx, "toks", min_support=0.7, min_confidence=0.9, max_len=3
    )
