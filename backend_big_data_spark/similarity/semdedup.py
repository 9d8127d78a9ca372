"""SemDeDup — semantic deduplication in embedding space (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540).

The scale idea: never compare all pairs. K-means clustering partitions the
corpus so that semantic duplicates land in the same cluster with high
probability; exact pairwise cosine runs only WITHIN a cluster, bounding the
quadratic term to sum(|c_i|^2) instead of n^2. With k chosen so clusters
stay bounded, cost is linear-ish in n — the paper dedups LAION-440M this
way.

Spark shape (all declarative, zero Python on the data path):
- assignment: broadcast crossJoin against the k-row centroid frame + keyed
  window argmin (`ml/clustering.assign_to_centroids`) — the corpus never
  shuffles for scoring;
- within-cluster pairs: `similarity/neardup.blocked_cosine_pairs` with the
  cluster id as the blocking key — one self-join shuffling on the cluster
  key only (AQE splits skewed clusters), exact cosine as higher-order
  array expressions (JVM codegen, no UDF);
- keep rule: a vector is dropped iff a LOWER-ID member of its cluster is
  within the cosine threshold (the min-id star rule; the paper keeps one
  exemplar per duplicate group — any deterministic choice works, and
  min-id makes the whole operator SQL-replayable). Transitive-closure
  retention (one survivor per connected component) composes with
  `operators/graph.py` exactly as `doc_corpus_deduped_cc` does for
  MinHash pairs.

Reference scope: the reference's dedup surface is exact duplicates only
(`/root/reference/scripts/data_cleaner.py:84` dropDuplicates); this module
is additive LLM-training-pipeline scope alongside `text/dedup.py`
(MinHash/SimHash) and `similarity/neardup.py` (blocked cosine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.ml.clustering import assign_to_centroids
from backend_big_data_spark.similarity.neardup import blocked_cosine_pairs


def semdedup(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    array_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Cluster-bucketed semantic dedup: ``(id, cluster, kept)`` for every
    input vector, ``kept`` false iff some lower-id vector in the same
    cluster has cosine similarity above ``threshold``.

    ``centroids`` is a FIXED ``(cluster int, centroid array<double>)``
    frame (train once with `ml/clustering.kmeans_fit_predict`, or pin
    anchor vectors) — pinning it makes the operator deterministic and
    oracle-checkable, the same trick as IVF / fixed-centroid KMeans.

    ``block_col``: coarse partition key on BOTH frames for hierarchical
    assignment when k scales with the corpus — see
    `ml/clustering.assign_to_centroids`.
    """
    labeled = df.join(
        assign_to_centroids(
            df, centroids, array_col=array_col, id_col=id_col,
            block_col=block_col,
        ),
        on=id_col,
    )
    dropped = (
        blocked_cosine_pairs(
            labeled, "cluster", threshold, id_col=id_col, vec_col=array_col
        )
        .select(F.col("vec_id_b").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return labeled.join(dropped, on=id_col, how="left").select(
        F.col(id_col),
        F.col("cluster"),
        F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
    )
