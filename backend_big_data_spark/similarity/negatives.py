"""Hard-negative mining for contrastive/retrieval training (the DPR
in-batch-negatives refinement, Karpukhin et al. 2020, arXiv:2004.04906
§3.2; see also ANCE, arXiv:2007.00808): for each anchor, the most similar
corpus items that do NOT share its label — the near-misses a bi-encoder
must learn to push away, which train far better than random negatives.

Plan shape = the brute-force ANN scorer with a label-mismatch predicate:
anchors broadcast, corpus streams map-side (no corpus shuffle), per-anchor
top-k via one keyed window. For corpus-scale anchor sets, swap the
brute-force scorer for any of the sub-linear ANN paths (IVF / LSH / PQ in
`similarity/ann.py` + `similarity/pq.py`) and keep the label filter — the
predicate composes with every candidate generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.operators.windows import topk_per_group
from backend_big_data_spark.similarity.ann import cosine_sim


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Top-k highest-cosine DIFFERENT-label corpus items per anchor.
    Output: (query_id, neighbor_id, cosine_sim, rnk), deterministic id
    tie-break."""
    q = anchors.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
        F.col(label_col).alias("__ql"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("__nv"),
        F.col(label_col).alias("__nl"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("__nl") != F.col("__ql"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("__qv"), F.col("__nv")).alias("sim"),
        )
    )
    top = topk_per_group(
        scored,
        partition_by=["query_id"],
        order_by=[F.desc("sim"), F.col("neighbor_id")],
        k=k,
    )
    return top.select(
        "query_id",
        "neighbor_id",
        F.round("sim", 6).alias("cosine_sim"),
        F.col("rnk"),
    )
