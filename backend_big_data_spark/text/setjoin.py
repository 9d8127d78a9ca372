"""Exact set-similarity join with prefix filtering (PPJoin-style).

The EXACT scale path for threshold-Jaccard joins, complementing the two
approximations already in text/dedup.py:

- ``ngram_jaccard_pairs(max_df=k)`` drops hot shingles — slightly lossy;
- ``lsh_verified_pairs`` has banding recall < 1 below the S-curve knee;
- THIS join is exact at any scale: order every document's shingles by a
  GLOBAL rarest-first total order and index only each document's PREFIX
  (``|d| − ⌈t·|d|⌉ + 1`` shingles). The classic prefix-filter guarantee
  (Chaudhuri et al. SSJoin / Xiao et al. PPJoin, public literature):
  under a shared total order, two sets with Jaccard ≥ t MUST share at
  least one prefix token — so joining only prefixes misses nothing.

Why this scales where the naive inverted index explodes: pair expansion
happens per shingle and is quadratic in that shingle's document
frequency, but prefixes are chosen rarest-FIRST, so exactly the
low-frequency end of the index does the joining; the hot shingles that
make the naive join quadratic are never join keys (for reasonable t they
sit outside every prefix). No recall loss, no dropped tokens.

Shapes: one DF aggregate (shuffle on shingle), one per-doc local sort
(inside a keyed agg), one prefix self-join (shuffle on the rare-end
shingles), one verify join on doc ids against the full shingle arrays.
The verify stage's ``array_intersect`` is per-candidate-pair and bounded
by document size — candidates, not corpus, pay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefix_filtered_jaccard_pairs(
    shingled: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    positional: bool = True,
) -> DataFrame:
    """All pairs with exact Jaccard ≥ ``threshold`` over distinct-shingle
    sets. Output: (doc_a, doc_b, intersection_size int, jaccard double
    [6dp]) — the same contract as ``ngram_jaccard_pairs`` (tested equal
    uncapped).

    ``positional=True`` adds PPJoin's positional filter: a prefix match at
    positions (i, j) bounds the achievable overlap by
    ``1 + min(|A|−i, |B|−j)`` (everything before the match in EITHER set is
    definitionally disjoint from the other's tail under the shared order),
    and J ≥ t needs overlap ≥ ⌈t/(1+t)·(|A|+|B|)⌉ — candidates whose bound
    falls short are dropped BEFORE the distinct/verify stages. Pure
    candidate pruning: the verified output is identical (tested).
    """
    ex = shingled.select(F.col(id_col), F.explode("shingles").alias("shingle"))
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = ex.join(dfreq, "shingle")
    docs = ranked.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("df", "shingle"))),
            lambda s: s["shingle"],
        ).alias("ord_toks")
    )
    # NOT pinned (r12 measured): the ordered doc table feeds both sides
    # of the prefix self-join, but the two sides' upstream exchanges are
    # IDENTICAL, so runtime exchange reuse already computes the chain
    # once — an eager pin here measured 3.2s → 10.0s (serialized
    # materialization + lost pipelining beats the reuse it duplicates).
    sz = F.size("ord_toks")
    prefix_len = (sz - F.ceil(F.lit(threshold) * sz) + 1).cast("int")
    pref = docs.select(
        F.col(id_col),
        sz.alias("sz"),
        F.posexplode(F.slice(F.col("ord_toks"), 1, prefix_len)).alias(
            "pos", "shingle"
        ),
    )
    a = pref.select(
        F.col(id_col).alias("doc_a"),
        F.col("sz").alias("sz_a"),
        F.col("pos").alias("pos_a"),
        "shingle",
    )
    b = pref.select(
        F.col(id_col).alias("doc_b"),
        F.col("sz").alias("sz_b"),
        F.col("pos").alias("pos_b"),
        "shingle",
    )
    # length pruning is engine-side-only pruning (J >= t forces
    # t·|A| <= |B| whenever |B| <= |A|): it shrinks the candidate set but
    # cannot change the verified OUTPUT, so the SQL oracle may omit it
    cond = (
        (F.col("doc_a") < F.col("doc_b"))
        & (F.col("sz_b") >= threshold * F.col("sz_a"))
        & (F.col("sz_a") >= threshold * F.col("sz_b"))
    )
    if positional:
        ubound = 1 + F.least(
            F.col("sz_a") - F.col("pos_a"), F.col("sz_b") - F.col("pos_b")
        )
        alpha = F.ceil(
            F.lit(threshold / (1.0 + threshold)) * (F.col("sz_a") + F.col("sz_b"))
        )
        cond = cond & (ubound >= alpha)
    cand = (
        a.join(b, "shingle")
        .filter(cond)
        .select("doc_a", "doc_b")
        .distinct()
    )
    fa = shingled.select(
        F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    fb = shingled.select(
        F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    ver = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("intersection_size"),
            F.size("sh_a").alias("la"),
            F.size("sh_b").alias("lb"),
        )
    )
    jac = F.col("intersection_size") / (
        F.col("la") + F.col("lb") - F.col("intersection_size")
    )
    return ver.filter(jac >= threshold).select(
        "doc_a",
        "doc_b",
        "intersection_size",
        F.round(jac, 6).alias("jaccard"),
    )


__all__ = ["prefix_filtered_jaccard_pairs"]
