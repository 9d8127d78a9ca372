"""Fixed-point PageRank over an edge list (public algorithm: Brin &
Page 1998; dangling-mass redistribution per Langville & Meyer).

Determinism contract: ranks live in BIGINT micro-units (``scale``) and
every division is integer floor division (`DIV`), so two engines — or
two cluster runs with different partitioning — produce bit-identical
ranks. Floating-point PageRank is not reproducible across reduction
orders; fixed-point floor arithmetic is. (Total mass decays slightly
each step from floor losses; ordering, not mass conservation, is the
product.)

Iteration (damping d = 85/100):

    r'(u) = (15·scale) DIV (100·N)
          + (85 · (Σ_{v→u} r(v) DIV outdeg(v)  +  dangling DIV N)) DIV 100

Spark shape per step: one shuffle keyed on dst for the contribution
sum; the dangling total is a 1-row aggregate broadcast back (same sync
shape as a KMeans round). Static tables (nodes, out-degrees, dangling
set) are computed once; ``localCheckpoint`` truncates rank lineage so
the plan is constant-size in the iteration count. At cluster scale the
edge list would be bucketed by ``src`` so the rank-join never reshuffles
the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.operators.pinning import pin_single_evaluation

DEFAULT_SCALE = 1_000_000_000


def pagerank(
    edges: DataFrame, iterations: int = 5, scale: int = DEFAULT_SCALE
) -> DataFrame:
    """PageRank over ``edges`` (src string, dst string) → (node,
    rank_fp BIGINT). Nodes are the distinct edge endpoints; nodes with
    no out-edge contribute their mass as uniformly-redistributed
    dangling mass."""
    nodes = pin_single_evaluation(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    teleport = (15 * scale) // (100 * n)
    outd = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    dangling = pin_single_evaluation(nodes.join(outd, "node", "left_anti"))
    ranks = pin_single_evaluation(
        nodes.select("node", F.lit(scale // n).cast("long").alias("r"))
    )
    for _ in range(iterations):
        contrib = (
            ranks.join(outd, "node")
            .join(edges, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("r DIV deg")).alias("in_sum"))
        )
        dang = (
            ranks.join(dangling, "node")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        )
        nxt = pin_single_evaluation(
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.expr(
                        f"(85 * (coalesce(in_sum, 0L)"
                        f" + (dang DIV {n}L))) DIV 100"
                    )
                ).alias("r"),
            )
        )
        ranks.unpersist()
        ranks = nxt
    return ranks.select("node", F.col("r").alias("rank_fp"))


__all__ = ["DEFAULT_SCALE", "pagerank"]
