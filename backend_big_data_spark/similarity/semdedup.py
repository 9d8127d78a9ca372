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

#: batch near-graphs larger than this switch the within-batch CC from
#: min-label propagation (O(diameter) rounds) to large/small-star
#: contraction (O(log n) rounds) — the mega-batch guard.
_STAR_CC_EDGE_THRESHOLD = 100_000


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
    # NOT pinned (r12 measured): the labeled frame's three consumers
    # share an identical assignment subtree that runtime exchange reuse
    # already computes once — an eager pin measured 3.4s → 3.9s.
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


def incremental_semdedup(
    batch: DataFrame,
    corpus: DataFrame | None,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    array_col: str = "embedding",
    block_col: str | None = None,
    within_batch: bool = True,
) -> DataFrame:
    """Which ARRIVING-batch vectors survive semantic dedup against the
    at-rest kept corpus — the embedding-space twin of
    `text/dedup.incremental_dedup_kept` and the missing piece of a
    recurring-ingest curation loop: the corpus is already semantically
    deduped and at rest; only the batch is scored.

    Returns ``(id, cluster, kept)`` for every batch vector. A batch vector
    is dropped iff:

    - cross: some CORPUS vector in the same cluster is within ``threshold``
      cosine (the corpus member always wins — it was admitted first);
    - within batch (``within_batch=True``): batch-internal near pairs are
      resolved transitively — connected components over the both-new pair
      graph, keep only each component's min-id member (the same
      composition rule, and the same min-label CC operator, as the text
      ingest path).

    Never rescores the at-rest corpus: if ``corpus`` already carries a
    ``cluster`` column (the production shape — assignment is stored at
    admission time), it is used as-is; otherwise the corpus is assigned
    once here. Comparisons happen WITHIN a cluster only, so the per-batch
    cost is (batch assignment: broadcast k-row crossJoin) + (two joins
    keyed on cluster, batch side broadcastable) — the corpus never
    re-shuffles for scoring at 100 TB beyond its cluster-keyed layout.
    """
    labeled = batch.join(
        assign_to_centroids(
            batch, centroids, array_col=array_col, id_col=id_col,
            block_col=block_col,
        ),
        on=id_col,
    )
    # NOT pinned (r12 measured): the labeled batch's consumers share an
    # identical assignment subtree that runtime exchange reuse already
    # computes once — an eager pin measured 5.8s → 6.3s.
    if corpus is None:
        corpus_lab = None
    elif "cluster" in corpus.columns:
        corpus_lab = corpus
    else:
        corpus_lab = corpus.join(
            assign_to_centroids(
                corpus, centroids, array_col=array_col, id_col=id_col,
                block_col=block_col,
            ),
            on=id_col,
        )

    from backend_big_data_spark.similarity.ann import cosine_sim

    dropped = None
    if corpus_lab is not None:
        b = labeled.select(
            F.col("cluster"),
            F.col(id_col).alias("__bid"),
            F.col(array_col).cast("array<double>").alias("__bv"),
        )
        c = corpus_lab.select(
            F.col("cluster"),
            F.col(array_col).cast("array<double>").alias("__cv"),
        )
        cross = (
            c.join(F.broadcast(b), on="cluster")
            .filter(cosine_sim(F.col("__cv"), F.col("__bv")) > threshold)
            .select(F.col("__bid").alias(id_col))
            .distinct()
        )
        dropped = cross
    if within_batch:
        from backend_big_data_spark.operators.graph import (
            connected_components,
            connected_components_star,
        )

        pairs = blocked_cosine_pairs(
            labeled, "cluster", threshold, id_col=id_col, vec_col=array_col
        ).persist()
        # adaptive CC: min-label propagation is O(diameter) rounds — fine
        # for the typical small batch near-graph — but a pathological
        # mega-batch (or one long chain of near-dups) wants the
        # O(log n)-round large/small-star contraction. A bounded probe
        # (limit+count stops scanning at the threshold) picks the variant
        # without ever counting the full edge set.
        big = (
            pairs.limit(_STAR_CC_EDGE_THRESHOLD + 1).count()
            > _STAR_CC_EDGE_THRESHOLD
        )
        cc = connected_components_star if big else connected_components
        losers = (
            cc(pairs, src="vec_id_a", dst="vec_id_b")
            .filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias(id_col))
        )
        pairs.unpersist()
        dropped = losers if dropped is None else dropped.unionByName(losers)

    if dropped is None:
        return labeled.select(
            F.col(id_col), F.col("cluster"), F.lit(True).alias("kept")
        )
    flagged = dropped.distinct().withColumn("__dropped", F.lit(True))
    return labeled.join(flagged, on=id_col, how="left").select(
        F.col(id_col),
        F.col("cluster"),
        F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
    )
