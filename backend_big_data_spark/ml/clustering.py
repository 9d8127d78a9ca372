"""KMeans clustering (SURVEY.md §2.10 M1-M3).

The reference clusters photo (lat, lon) points and optionally reports
haversine distances from centroids to a 19-row monuments table
(``mlqueries.py:14-146``). The engine generalizes: cluster ANY numeric
column set or an embedding array column, and the centroid-to-landmark
distances are a broadcast crossJoin with the haversine column expression —
not a driver-side Python loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.functions.scalars import haversine_km


def kmeans_fit_predict(
    df: DataFrame,
    k: int,
    feature_cols: list[str] | None = None,
    array_col: str | None = None,
    seed: int = 42,
):
    """Fit seeded KMeans; returns (model, labeled DataFrame with
    ``cluster`` column). Features come from numeric columns (assembled, the
    reference's M1 path, ``mlqueries.py:36-40``) or from an
    ``array<float/double>`` embedding column (``array_to_vector``)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import array_to_vector

    if (feature_cols is None) == (array_col is None):
        raise ValueError("pass exactly one of feature_cols / array_col")
    if feature_cols is not None:
        feats = VectorAssembler(
            inputCols=feature_cols, outputCol="features"
        ).transform(df)
    else:
        feats = df.withColumn("features", array_to_vector(F.col(array_col)))
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(feats)
    labeled = model.transform(feats).withColumnRenamed("prediction", "cluster")
    return model, labeled


def assign_to_centroids(
    df: DataFrame,
    centroids: DataFrame,
    array_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment against a FIXED ``(cluster int,
    centroid array<double>)`` frame — the KMeans E-step as a pure
    declarative plan: broadcast crossJoin with the tiny centroid table,
    per-point argmin of squared L2 (monotone with L2; ties break on
    cluster id). Only centroid TRAINING (iterative Lloyd) is inherently
    rows-only; with centroids pinned, assignment is deterministic and
    SQL-replayable — the same fixed-quantizer trick as IVF
    (similarity/ann.py ``ivf_cosine_topk(centroids=...)``).

    Scale: the corpus never shuffles — one map-side broadcast join plus a
    keyed window over (point × k) rows; at 100 TB this is the scoring
    shape, with the model a k-row broadcast.

    Brute-force assignment is O(n·k): when k must GROW with the corpus
    (SemDeDup sizes k so per-cluster membership stays bounded), pass
    ``block_col`` — a coarse partition key present on BOTH frames (an IVF
    coarse cell, an LSH bucket, a shard) — and each point compares only
    against its block's centroids, restoring linear scaling (measured:
    50× corpus with k ∝ n went 23.5× superlinear unblocked, flat
    blocked; PERF.md). The centroid side keeps the broadcast hint — drop
    to a keyed join upstream if the model outgrows broadcast range."""
    from pyspark.sql.window import Window

    v = F.col(array_col).cast("array<double>")
    sqdist = F.aggregate(
        F.zip_with(v, F.col("centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    base_cols = [F.col(id_col), v.alias(array_col)]
    if block_col is not None:
        base = df.select(*base_cols, F.col(block_col))
        joined = base.join(F.broadcast(centroids), on=block_col)
    else:
        base = df.select(*base_cols)
        joined = base.crossJoin(F.broadcast(centroids))
    scored = joined.select(F.col(id_col), F.col("cluster"), sqdist.alias("__d2"))
    w = Window.partitionBy(id_col).orderBy("__d2", "cluster")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "cluster")
    )


def cluster_sizes(labeled: DataFrame) -> DataFrame:
    """Per-cluster row counts — the bounded summary a serving layer returns
    instead of the reference's full labeled-point collect
    (``mlqueries.py:111-113``)."""
    return (
        labeled.groupBy("cluster")
        .agg(F.count("*").alias("point_count"))
        .orderBy("cluster")
    )


def centroid_landmark_distances(
    model, landmarks: DataFrame, name_col: str, lat_col: str, lon_col: str
) -> DataFrame:
    """M3 (``mlqueries.py:120-137``) distributed: centroids (tiny DF) ×
    landmarks (tiny DF) crossJoin with haversine as a column expression."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    centers = spark.createDataFrame(
        [(i, float(c[0]), float(c[1])) for i, c in enumerate(model.clusterCenters())],
        "cluster int, c_lat double, c_lon double",
    )
    return (
        centers.crossJoin(F.broadcast(landmarks))
        .select(
            "cluster",
            F.col(name_col).alias("landmark"),
            F.round(
                haversine_km(
                    F.col("c_lat"), F.col("c_lon"), F.col(lat_col), F.col(lon_col)
                ),
                3,
            ).alias("distance_km"),
        )
        .orderBy("cluster", "landmark")
    )
