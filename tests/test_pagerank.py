"""Fixed-point PageRank (`operators/pagerank.py`).

The determinism contract (BIGINT micro-units, floor division) makes the
operator exactly replayable in plain Python — every test diffs the
distributed result against that reference on graphs chosen for their
structure: cycles (symmetry), stars (hub concentration), dangling sinks
(mass redistribution), and a multi-component graph.
"""

from __future__ import annotations

from backend_big_data_spark.operators.pagerank import pagerank


def _ref(edges, iters=5, scale=1_000_000_000):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    out: dict[str, int] = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    tele = (15 * scale) // (100 * n)
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in out)
        ins = {v: 0 for v in nodes}
        for s, d in edges:
            ins[d] += r[s] // out[s]
        r = {v: tele + (85 * (ins[v] + dang // n)) // 100 for v in nodes}
    return r


def _run(spark, edges, iters=5):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank_fp for r in pagerank(df, iterations=iters).collect()}


CYCLE = [("a", "b"), ("b", "c"), ("c", "a")]
STAR = [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "out")]
DANGLING = [("a", "b"), ("a", "c"), ("b", "c")]  # c is a sink
TWO_COMP = CYCLE + [("x", "y"), ("y", "x")]


class TestPagerank:
    def test_cycle_symmetric(self, spark):
        got = _run(spark, CYCLE)
        assert got == _ref(CYCLE)
        assert len(set(got.values())) == 1  # full symmetry

    def test_star_hub_dominates(self, spark):
        got = _run(spark, STAR)
        assert got == _ref(STAR)
        assert got["hub"] > got["s1"] == got["s2"] == got["s3"]
        # 'out' receives the hub's concentrated mass
        assert got["out"] > got["s1"]

    def test_dangling_mass_redistributed(self, spark):
        got = _run(spark, DANGLING)
        assert got == _ref(DANGLING)
        # the sink holds the most mass; the source holds the least
        assert got["c"] > got["b"] > got["a"]

    def test_two_components(self, spark):
        assert _run(spark, TWO_COMP) == _ref(TWO_COMP)

    def test_iteration_count_matters(self, spark):
        assert _run(spark, DANGLING, iters=1) == _ref(DANGLING, iters=1)
        assert _run(spark, DANGLING, iters=1) != _ref(DANGLING, iters=5)
