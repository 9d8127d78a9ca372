"""Maintained-index IVF serving — the ANN member of the maintained-index
family (text fp/band sidecars, image dHash column, linkage gram index,
semdedup cluster column — and now the ANN probe itself).

`similarity/ann.py::ivf_cosine_topk` re-derives the inverted lists from
the raw corpus on every call: a corpus × centroids broadcast scoring pass
plus a per-vector top-1 window. Correct, but at serving time it re-scores
the at-rest corpus for every query batch. The incremental contract this
module completes: assignment happens ONCE at admission
(:func:`assign_lists` — exactly the column the streaming embedding sink
`streaming/semdedup_ingest.py` already stores as ``cluster``), and the
query path (:func:`ivf_maintained_topk`) probes the STORED list ids — one
broadcast join on ``list_id`` prunes the corpus scan to the probed lists
(partition-pruned at rest when the corpus is laid out by list, which the
sink's ``partitionBy("cluster")`` write already does), then the exact
cosine re-rank is candidate-bounded.

Result-invariance: with the same fixed coarse quantizer,
``ivf_maintained_topk(assign_lists(corpus, C), Q, C) ==
ivf_cosine_topk(corpus, Q, centroids=C)`` — the blocking is the same, only
WHEN the corpus side is scored differs (admission vs query time). Tested,
and the registered gate reuses the scratch path's oracle verbatim.

Kept separate from `similarity/ann.py` so the serving path can evolve
without drifting the certified batch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.operators.windows import topk_per_group
from backend_big_data_spark.similarity.ann import cosine_sim


def assign_lists(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Admission-time inverted-list assignment: (id, vec double[],
    list_id) with each vector on its nearest centroid (cosine, ties to
    the smaller ``list_id`` — the same deterministic order as the scratch
    path). This is the one corpus × centroids pass; it runs once per
    admitted batch in the streaming sink, never on the query path."""
    cvec = F.col(vec_col).cast("array<double>")
    scored = (
        corpus.select(F.col(id_col), cvec.alias("vec"))
        .crossJoin(F.broadcast(centroids))
        .select(
            id_col,
            "vec",
            "list_id",
            cosine_sim(F.col("vec"), F.col("centroid")).alias("csim"),
        )
    )
    return topk_per_group(
        scored,
        partition_by=[id_col],
        order_by=[F.desc("csim"), F.col("list_id")],
        k=1,
        rank_col="_arnk",
    ).select(id_col, "vec", "list_id")


def ivf_maintained_topk(
    assigned: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over a corpus whose inverted lists are ALREADY stored
    (``assigned``: (id, vec, list_id) from :func:`assign_lists` or the
    embedding sink's ``cluster`` column). The corpus branch of the plan
    is a plain scan + one broadcast hash join on ``list_id`` — no
    centroid scoring, no per-vector window (plan-tested); only the tiny
    query side scores centroids to pick its ``nprobe`` lists."""
    cvec = F.col(vec_col).cast("array<double>")
    qscored = (
        queries.select(F.col(id_col).alias("query_id"), cvec.alias("query_vec"))
        .crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "query_vec",
            "list_id",
            cosine_sim(F.col("query_vec"), F.col("centroid")).alias("csim"),
        )
    )
    probes = topk_per_group(
        qscored,
        partition_by=["query_id"],
        order_by=[F.desc("csim"), F.col("list_id")],
        k=nprobe,
        rank_col="_prnk",
    ).select("query_id", "query_vec", "list_id")
    # no pair dedup: ``assigned`` is an inverted-list table — one list
    # per id (assign_lists is a top-1 argmin; the embedding sink stores
    # one cluster per vector) — so (query, neighbor) pairs are already
    # distinct and a distinct here would shuffle the whole candidate
    # stream on (query_id, neighbor_id) for nothing (guide §2.4)
    cand = (
        assigned.select(
            F.col(id_col).alias("neighbor_id"),
            F.col("vec").alias("neighbor_vec"),
            "list_id",
        )
        .join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    sim = cosine_sim(F.col("query_vec"), F.col("neighbor_vec"))
    top = topk_per_group(
        cand.select("query_id", "neighbor_id", sim.alias("sim")),
        partition_by=["query_id"],
        order_by=[F.desc("sim"), F.col("neighbor_id")],
        k=k,
        rank_col="rnk",
    )
    return top.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("sim"), 6).alias("cosine_sim"),
        "rnk",
    ).orderBy("query_id", "rnk")


__all__ = ["assign_lists", "ivf_maintained_topk"]
