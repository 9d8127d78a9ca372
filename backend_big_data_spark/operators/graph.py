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
point. Lineage is truncated every round via the shared pin switch
(``operators/pinning`` — executor-local by default; a configured
checkpoint dir upgrades every round's pin to a durable checkpoint with
no code change) — without it the plan doubles per iteration and
Catalyst analysis time explodes.

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

from backend_big_data_spark.operators.pinning import pin_single_evaluation


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
    sym = pin_single_evaluation(sym)

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
        labels = pin_single_evaluation(
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
            )
        )
        new_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        if new_sum == prev_sum:
            return labels.select("node", F.col("label").alias("component"))
        prev_sum = new_sum
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    return_rounds: bool = False,
) -> DataFrame | tuple[DataFrame, int]:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — O(log² n) rounds regardless of graph diameter,
    vs O(diameter) for :func:`connected_components`. Use this for deep
    graphs (long dup-chains, link graphs); min-label propagation stays the
    default for the shallow near-clique clusters dedup produces.

    Per round, with Γ⁺(u) = neighbors of u plus u and m = min(Γ⁺(u)):

    - **large-star**: for every node u, connect every strictly-larger
      neighbor v > u to m — one symmetric groupBy(u) + join, halving tall
      trees;
    - **small-star**: orient every edge toward its smaller endpoint
      (key = larger node), connect all smaller neighbors and u itself to m
      — flattening each local tree into a star.

    Both steps are a keyed shuffle + min-aggregate + join (the same
    machinery as label propagation; only the neighbor rule differs), with
    lineage truncated per round. Convergence = the oriented edge set is a
    fixed point, certified by (count, sum of xxhash64(u, v)) — one tiny
    collect per round, as in the label-propagation loop.

    Returns ``(node, component)`` for every node appearing in ≥1 edge
    (same contract as :func:`connected_components`); with
    ``return_rounds=True`` returns ``(labels, rounds_used)``.
    """
    e = pin_single_evaluation(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
    )

    def _cert(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def _large_star(df: DataFrame) -> DataFrame:
        sym = df.union(
            df.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(df: DataFrame) -> DataFrame:
        # edges already oriented (u > v); group the smaller neighbors by u
        mins = df.groupBy("u").agg(F.min("v").alias("m"))
        withm = df.join(mins, "u")
        to_min = withm.filter(F.col("v") != F.col("m")).select(
            F.greatest("v", "m").alias("u"), F.least("v", "m").alias("v")
        )
        self_edge = mins.select(
            F.col("u"), F.col("m").alias("v")
        )
        return to_min.union(self_edge).distinct()

    prev = _cert(e)
    rounds = 0
    for _ in range(max_iter):
        e = pin_single_evaluation(_small_star(_large_star(e)))
        rounds += 1
        cur = _cert(e)
        if cur == prev:
            labels = (
                e.select(F.col("u").alias("node"), F.col("v").alias("component"))
                .union(
                    e.select(F.col("v").alias("node"), F.col("v").alias("component"))
                )
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
            return (labels, rounds) if return_rounds else labels
        prev = cur
    raise RuntimeError(
        f"connected_components_star: no fixpoint in {max_iter} rounds"
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 4,
) -> DataFrame:
    """Community detection via synchronous weighted label propagation
    (Raghavan et al. 2007, "Near linear time algorithm to detect community
    structures in large-scale networks") — the graph-family complement of
    the component operators: CC answers "which nodes are CONNECTED",
    LPA answers "which nodes are DENSELY connected" (communities), the
    standard corpus-curation prior for link-graph domains.

    Semantics, fully deterministic so a SQL oracle can replay it:

    - edges are undirected; self-loops dropped; parallel edges collapse
      into an integer weight (``count(*)``, or ``sum(weight)`` when a
      weight column is named);
    - every node starts labeled with its own id;
    - each round, SYNCHRONOUSLY, every node adopts the label with the
      highest incident weight among its neighbors' labels, ties broken by
      MINIMUM label — no node keeps a stale vote for itself, and no
      random tie-break (the published algorithm's randomness is exactly
      what an engine-portable contract must remove);
    - a FIXED ``iterations`` count, not a convergence loop: synchronous
      LPA can 2-cycle on bipartite structure, so "run to fixpoint" is not
      well-defined; a fixed round count is, and both engines replay it.

    One keyed shuffle per round (groupBy (node, label) vote sum, then a
    ``min_by`` argmax per node — the same deterministic-argmax device as
    ``text/bpe.py``), lineage truncated per round. Scale shape is
    identical to :func:`connected_components`: rounds × one shuffle over
    the edge list, no all-pairs anywhere.

    Returns ``(node, community)`` for every node on a non-self-loop edge.
    """
    und = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"),
        F.greatest(F.col(src), F.col(dst)).alias("b"),
        *( [F.col(weight).cast("long").alias("w")] if weight else [] ),
    ).filter(F.col("a") != F.col("b"))
    agg = F.sum("w") if weight else F.count(F.lit(1))
    und = und.groupBy("a", "b").agg(agg.cast("long").alias("w"))
    sym = pin_single_evaluation(
        und.unionByName(
            und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
        )
    )

    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(iterations):
        votes = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a", "label")
            .agg(F.sum("w").alias("v"))
        )
        labels = pin_single_evaluation(
            votes.groupBy(F.col("a").alias("node"))
            .agg(
                F.min_by(
                    F.col("label"), F.struct((-F.col("v")).alias("nv"), "label")
                ).alias("label")
            )
        )
    return labels.select("node", F.col("label").alias("community"))


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-vertex triangle counts over an undirected edge list — the
    clustering-structure probe for the near-dup graph (a dup CLUSTER is
    near-clique: high triangle density confirms transitive dedup is safe;
    a chain of borderline pairs has none and needs the verify pass).

    Canonical-ordering formulation: with every edge stored (lo, hi) once,
    each triangle a<b<c is found EXACTLY once by joining e(a,b) x e(b,c)
    x e(a,c) — two keyed equi-joins, no permutation blowup. Wedge count
    is bounded by sum(deg^2) of the canonical orientation, the standard
    bound; all shuffles key on a vertex."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") != F.col("hi"))
        .distinct()
    )
    ab = e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = e.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = e.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = ab.join(bc, on="b").join(ac, on=["a", "c"])
    per_vertex = (
        tri.select(F.col("a").alias("vertex"))
        .unionAll(tri.select(F.col("b").alias("vertex")))
        .unionAll(tri.select(F.col("c").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count("*").alias("n_triangles"))
    )
    return per_vertex


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 64,
) -> DataFrame:
    """The k-core of the undirected graph: the maximal subgraph in which
    every node has degree >= k (Seidman 1983) — the standard "dense
    kernel" extraction before community/influence analysis, and the graph
    family's counterpart of the dedup cluster spectrum.

    Distributed batch peeling (the textbook parallel algorithm): each
    round drops every node whose CURRENT degree is below k and the edges
    it carries; deletions cascade, and the fixed point IS the k-core —
    order-independent, so no tie-breaks are needed anywhere. Per round:
    one keyed degree aggregate plus two semi-joins (all shuffles keyed on
    a vertex), lineage truncated per round. The edge count is the
    convergence certificate (strictly decreasing until the fixed point);
    a fixed round budget with a raise on non-convergence keeps the
    result exact rather than silently partial — a SQL engine replays the
    peel as a k-step CTE chain (extra rounds past the fixed point are
    no-ops, so a generous static budget replays a converged peel). The
    loop spends one extra no-op round DETECTING the fixed point, so
    ``max_iter`` must exceed the real peel depth by 1 — call sites that
    pair with an n-round SQL replay should pass ``max_iter = n + 1``.

    Returns ``(node, core_deg)`` — every node of the k-core with its
    degree INSIDE the core. Empty when the core is empty.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    sym = sym.union(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    sym = pin_single_evaluation(sym)
    n_edges = sym.count()

    for _ in range(max_iter):
        keep = (
            sym.groupBy("a")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("a")
        )
        pruned = sym.join(keep, "a", "left_semi").join(
            keep.select(F.col("a").alias("b")), "b", "left_semi"
        )
        pruned = pin_single_evaluation(pruned)
        n_new = pruned.count()
        if n_new == n_edges:
            break
        sym, n_edges = pruned, n_new
    else:
        raise RuntimeError(
            f"k_core did not reach a fixed point in {max_iter} rounds "
            f"({n_edges} edges remain) — raise max_iter"
        )
    return sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("int").alias("core_deg")
    )
