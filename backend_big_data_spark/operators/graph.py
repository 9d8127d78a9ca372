"""Iterative graph operators — connected components for dedup clustering.

A near-dup pair list is not a dedup policy: duplicates are TRANSITIVE
(A~B, B~C ⇒ {A,B,C} is one cluster even when A,C were never compared), so
a corpus dedup that drops "the larger id of each pair" under-removes. The
correct unit is the connected component of the similarity graph, with one
canonical document kept per component.

The implementation is iterative min-label propagation expressed entirely
in DataFrame ops: each round every node adopts the minimum label in its
closed neighborhood (one keyed shuffle per round), so a component's min id
floods outward one hop per round and the loop converges in
O(graph diameter) rounds — dup clusters are shallow (near-clique), so this
is 2-4 rounds in practice. Convergence is detected by the label-sum
invariant: labels only ever decrease, so an unchanged sum means a fixed
point. Lineage is truncated every round (``localCheckpoint``; on a real
cluster use a checkpoint dir on durable storage) — without it the plan
doubles per iteration and Catalyst analysis time explodes.

For graphs with large diameters at 100 TB scale (web graphs, not dup
clusters), the round count itself becomes the bottleneck; the published
fix is alternating large-star/small-star contraction, which converges in
O(log^2 n) rounds (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014). The per-round machinery below (keyed shuffle +
min-aggregate + checkpoint) is the same; only the neighbor rule changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the minimum
    node id of its connected component.

    Returns ``(node, component)`` for every node that appears in at least
    one edge; isolated nodes are absent (callers left-join and coalesce to
    the node's own id). Raises if ``max_iter`` rounds do not reach the
    fixed point — for dedup-cluster graphs that means the input is not the
    near-clique it should be.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    # Labels are non-negative and strictly decrease when they change, so
    # the sum (decimal — no overflow at any graph size) is a convergence
    # certificate: equal sum <=> no label moved.
    prev_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.a == labels.node)
            .groupBy(F.col("b").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
            .localCheckpoint()
        )
        new_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        if new_sum == prev_sum:
            return labels.select("node", F.col("label").alias("component"))
        prev_sum = new_sum
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
