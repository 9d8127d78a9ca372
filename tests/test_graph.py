"""Connected components: min-label propagation vs large-star/small-star.

The star algorithm (Kiveris et al., SoCC 2014) must produce EXACTLY the
same (node, component-min) labeling as propagation on any graph, and must
converge in O(log² n) rounds on deep graphs where propagation needs
O(diameter) rounds — that round count is the whole point of the variant.
"""

from __future__ import annotations

import random

import pytest

from backend_big_data_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _labels(df):
    return {(r.node, r.component) for r in df.collect()}


def test_components_simple_two_clusters(spark):
    e = _edges_df(spark, [(1, 2), (2, 3), (10, 11), (3, 1)])
    expected = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert _labels(connected_components(e)) == expected
    assert _labels(connected_components_star(e)) == expected


def test_components_self_loops_and_duplicate_edges(spark):
    e = _edges_df(spark, [(5, 5), (1, 2), (2, 1), (1, 2), (7, 8)])
    got = _labels(connected_components_star(e))
    # self-loop-only node 5 contributes no component edge (same contract as
    # propagation: nodes with at least one real neighbor)
    assert got == {(1, 1), (2, 1), (7, 7), (8, 7)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_star_equals_propagation_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 60
    pairs = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(70)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges_df(spark, pairs)
    assert _labels(connected_components_star(e)) == _labels(
        connected_components(e)
    )


def test_star_round_count_on_deep_path(spark):
    """A 64-node path has diameter 63: propagation needs ~63 rounds (and
    would exceed its default max_iter); star contraction must finish in
    O(log² n) — far fewer — with every node labeled 0."""
    n = 64
    e = _edges_df(spark, [(i, i + 1) for i in range(n - 1)])
    labels, rounds = connected_components_star(e, return_rounds=True)
    assert _labels(labels) == {(i, 0) for i in range(n)}
    assert rounds <= 12, f"star contraction took {rounds} rounds on a path"


def test_triangle_counts_known_graph(spark):
    """K4 has 4 triangles (3 per vertex); attaching a pendant edge adds
    none; duplicate/reversed edges don't double-count."""
    from backend_big_data_spark.operators.graph import triangle_counts

    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5),                                          # pendant
        (2, 1), (3, 1),                                  # reversed dups
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.vertex: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert 5 not in got  # pendant vertex closes no triangle


# ---------------------------------------------------------------------------
# label propagation (community detection)
# ---------------------------------------------------------------------------

from backend_big_data_spark.operators.graph import label_propagation  # noqa: E402


def _lpa_ref(pairs, iterations=4, weights=None):
    """Plain-Python reference for the deterministic synchronous LPA
    contract: undirected, self-loops dropped, parallel edges summed,
    argmax by (weight desc, label asc), fixed iteration count."""
    from collections import defaultdict

    w = defaultdict(int)
    for i, (a, b) in enumerate(pairs):
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        w[(lo, hi)] += 1 if weights is None else weights[i]
    adj = defaultdict(dict)
    for (a, b), ww in w.items():
        adj[a][b] = adj[a].get(b, 0) + ww
        adj[b][a] = adj[b].get(a, 0) + ww
    labels = {n: n for n in adj}
    for _ in range(iterations):
        nxt = {}
        for n, nbrs in adj.items():
            votes = defaultdict(int)
            for m, ww in nbrs.items():
                votes[labels[m]] += ww
            nxt[n] = min(votes, key=lambda lb: (-votes[lb], lb))
        labels = nxt
    return set(labels.items())


def _communities(df):
    return {(r.node, r.community) for r in df.collect()}


def test_lpa_two_cliques_weak_bridge(spark):
    """Two 4-cliques joined by one edge settle into two communities, each
    labeled by its minimum member — the canonical LPA sanity case."""
    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs = k1 + k2 + [(3, 10)]
    got = _communities(label_propagation(_edges_df(spark, pairs)))
    assert got == _lpa_ref(pairs)
    comm = dict(got)
    assert {comm[n] for n in range(4)} == {0}
    assert {comm[n] for n in range(10, 14)} == {10}


def test_lpa_weight_flips_a_vote(spark):
    """Edge weight changes the argmax: on triangle 1-2-3, unweighted votes
    send every node to its minimum neighbor, but a heavy 2-3 edge makes 2
    and 3 vote for each other instead — one synchronous round shows the
    difference, and both sides must match the reference."""
    pairs = [(1, 2), (1, 3), (2, 3)]
    weights = [1, 1, 5]
    df = spark.createDataFrame(
        [(a, b, w) for (a, b), w in zip(pairs, weights)],
        "src long, dst long, w long",
    )
    got_w = _communities(label_propagation(df, weight="w", iterations=1))
    got_u = _communities(label_propagation(df.select("src", "dst"), iterations=1))
    assert got_w == _lpa_ref(pairs, iterations=1, weights=weights)
    assert got_u == _lpa_ref(pairs, iterations=1)
    assert got_w == {(1, 2), (2, 3), (3, 2)}
    assert got_u == {(1, 2), (2, 1), (3, 1)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lpa_matches_reference_on_random_graphs(spark, seed):
    rng = random.Random(100 + seed)
    n = 40
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges_df(spark, pairs)
    assert _communities(label_propagation(e, iterations=4)) == _lpa_ref(
        pairs, iterations=4
    )


def test_lpa_parallel_edges_collapse_to_weight(spark):
    """Duplicate (and reversed-duplicate) edges vote with multiplicity:
    triple edge 1-2 outvotes two single edges 1-3, 1-4."""
    pairs = [(1, 2), (2, 1), (1, 2), (1, 3), (1, 4), (3, 4)]
    got = _communities(label_propagation(_edges_df(spark, pairs), iterations=2))
    assert got == _lpa_ref(pairs, iterations=2)


# ---------------------------------------------------------------------------
# k-core (batch peeling)
# ---------------------------------------------------------------------------


def _kcore_ref(pairs, k):
    """Plain-Python peel: the independent reference."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items()}


def _kcore_got(spark, pairs, k, **kw):
    from backend_big_data_spark.operators.graph import k_core

    df = k_core(_edges_df(spark, pairs), k=k, **kw)
    return {r.node: r.core_deg for r in df.collect()}


def test_kcore_planted_clique_survives_cascade(spark):
    """A 5-clique plus a pendant chain: the chain (and the clique node it
    hangs off, transiently at degree 5) peels away under k=4; exactly the
    clique remains, every member at in-core degree 4."""
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(0, 10), (10, 11), (11, 12)]
    got = _kcore_got(spark, clique + chain, k=4)
    assert got == {i: 4 for i in range(5)}
    assert got == _kcore_ref(clique + chain, 4)


def test_kcore_tree_peels_to_empty(spark):
    tree = [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)]
    assert _kcore_got(spark, tree, k=2) == {}


@pytest.mark.parametrize("seed", [0, 1])
def test_kcore_matches_reference_on_random_graphs(spark, seed):
    rng = random.Random(seed)
    pairs = [
        (rng.randrange(30), rng.randrange(30)) for _ in range(120)
    ]
    for k in (2, 3, 4):
        assert _kcore_got(spark, pairs, k) == _kcore_ref(pairs, k)


def test_kcore_insufficient_budget_raises(spark):
    """A 6-node path under k=2 cascades one node per round from each end;
    one round cannot reach the (empty) fixed point."""
    path = [(i, i + 1) for i in range(5)]
    with pytest.raises(RuntimeError, match="fixed point"):
        _kcore_got(spark, path, k=2, max_iter=1)
