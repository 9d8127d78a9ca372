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
