"""Hybrid retrieval fusion — Reciprocal Rank Fusion (Cormack, Clarke &
Büttcher 2009, SIGIR, "Reciprocal rank fusion outperforms Condorcet and
individual rank learning methods"): combine any number of rankings
(lexical BM25, embedding ANN, ...) by summing 1/(k + rank) per candidate.
RRF is the standard production fusion for hybrid search because it needs
no score calibration between systems — only ranks cross the boundary.

Determinism note: the engine works in EXACT integer arithmetic —
``SCALE DIV (k + rank)`` summed as integers — so fusion is reproducible
bit-for-bit on any engine with no float association concerns at all.

Scale shape: each input ranking is already a top-N (bounded); fusion is
a full-outer union of bounded frames + one bounded sort. Nothing here
touches the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_K = 60
RRF_SCALE = 1_000_000_000


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k: int = RRF_K,
    top: int | None = None,
) -> DataFrame:
    """Fuse rankings (each ``(id, rnk)``, rnk 1-based) into
    ``(id, rrf_fp long, rnk int)`` ordered by descending fused score,
    ties on id. ``rrf_fp`` = Σ SCALE DIV (k + rnk) over the lists the
    candidate appears in (missing contributes 0)."""
    if not rankings:
        raise ValueError("need at least one ranking")
    contribs = [
        r.select(
            F.col(id_col),
            F.expr(f"{RRF_SCALE} DIV ({k} + {rank_col})").alias("__c"),
        )
        for r in rankings
    ]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    fused = unioned.groupBy(id_col).agg(F.sum("__c").alias("rrf_fp"))
    ordered = fused.orderBy(F.desc("rrf_fp"), id_col)
    if top is not None:
        ordered = ordered.limit(top)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("rrf_fp"), id_col)  # bounded: top-N rows
    return ordered.withColumn("rnk", F.row_number().over(w).cast("int"))
