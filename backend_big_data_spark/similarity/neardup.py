"""Embedding-cosine near-duplicate detection (north-star additive scope).

Block-then-verify: candidate pairs only form within a blocking key (here any
discrete column — a coarse cluster id, an LSH band, a shard), then exact
cosine verifies each candidate. The all-pairs O(n²) comparison never happens
globally — only within blocks, which is what keeps this shape alive at
100 TB (block sizes are bounded; the join shuffles on the block key only).
For blocking keys the engine already provides random-hyperplane LSH buckets
(similarity/ann.py) when no natural key exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.similarity.ann import cosine_sim


def blocked_cosine_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs within a block with cosine similarity above ``threshold``.

    Output: (vec_id_a, vec_id_b, cosine_sim) with ``vec_id_a < vec_id_b``
    (each unordered pair once). Cosine is pure Catalyst higher-order array
    functions — no Python in the hot path.
    """
    a = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("vec_id_a"),
        F.col(vec_col).cast("array<double>").alias("__va"),
    )
    b = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("vec_id_b"),
        F.col(vec_col).cast("array<double>").alias("__vb"),
    )
    sim = cosine_sim(F.col("__va"), F.col("__vb"))
    return (
        a.join(b, on="__blk")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn("__sim", sim)
        .filter(F.col("__sim") > threshold)
        .select(
            "vec_id_a", "vec_id_b", F.round("__sim", 6).alias("cosine_sim")
        )
    )
