"""Photo-domain ML operators — reference ``mlqueries.py`` (SURVEY.md §2.10),
Spark-first: the driver-side Python double loop over centroids×monuments
(``mlqueries.py:120-137``) becomes a crossJoin of two tiny DataFrames with
haversine as a column expression, and the monuments table is a broadcastable
DataFrame instead of a ``json.load`` list (``mlqueries.py:71-74``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.functions.scalars import haversine_km


def _geo_points(df: DataFrame) -> DataFrame:
    """Flatten + validate coordinates — reference ``mlqueries.py:23-33``:
    non-null and within [-90,90]/[-180,180]... the reference checks BOTH
    against [-90,90] (``mlqueries.py:31-32``); longitude's true domain is
    [-180,180], kept here (documented deviation: the reference would drop
    valid eastern/western photos)."""
    return df.select(
        F.col("id"),
        F.col("geoData.latitude").alias("latitude"),
        F.col("geoData.longitude").alias("longitude"),
    ).filter(
        F.col("latitude").isNotNull()
        & F.col("longitude").isNotNull()
        & F.col("latitude").between(-90.0, 90.0)
        & F.col("longitude").between(-180.0, 180.0)
    )


def run_kmeans_clustering(df: DataFrame, k: int, seed: int = 42):
    """KMeans over photo coordinates — reference ``mlqueries.py:14-61``.
    Returns (labeled_points DataFrame, centroids DataFrame).

    The reference ``.distinct().collect()``s every labeled point to the
    driver (``mlqueries.py:111-113``) — kept as a DataFrame here; the
    serving layer bounds what it collects.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    pts = _geo_points(df)
    assembled = VectorAssembler(
        inputCols=["latitude", "longitude"], outputCol="features"
    ).transform(pts)
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(assembled)
    labeled = (
        model.transform(assembled)
        .select("latitude", "longitude", F.col("prediction").alias("cluster"))
        .distinct()
    )
    spark = df.sparkSession
    centroids = spark.createDataFrame(
        [
            (i, float(c[0]), float(c[1]))
            for i, c in enumerate(model.clusterCenters())
        ],
        "cluster int, latitude double, longitude double",
    )
    return labeled, centroids


def centroid_monument_distances(
    centroids: DataFrame, monuments: DataFrame
) -> DataFrame:
    """Distance from every centroid to every monument — reference
    ``mlqueries.py:120-137`` does this in a Python double loop on the
    driver; as a crossJoin of two tiny DataFrames with a haversine column
    expression it stays distributed and codegen-able (both sides are <100
    rows; the crossJoin is broadcast)."""
    c = centroids.select(
        "cluster",
        F.col("latitude").alias("c_lat"),
        F.col("longitude").alias("c_lon"),
    )
    m = monuments.select(
        F.col("name").alias("monument"),
        F.col("latitude").alias("m_lat"),
        F.col("longitude").alias("m_lon"),
    )
    return (
        c.crossJoin(F.broadcast(m))
        .select(
            "cluster",
            "monument",
            F.round(
                haversine_km(
                    F.col("c_lat"), F.col("c_lon"), F.col("m_lat"), F.col("m_lon")
                ),
                3,
            ).alias("distance_km"),
        )
        .orderBy("cluster", "monument")
    )


def tag_association_rules(
    df: DataFrame,
    min_support: float,
    min_confidence: float,
    target_tags: list[str] | None = None,
) -> DataFrame:
    """FPGrowth association rules over tag transactions — reference
    ``mlqueries.py:148-170``: tags → values → distinct per photo,
    FPGrowth(minSupport, minConfidence), optional filter to rules whose
    antecedent contains the first target tag. Higher-order functions
    (``transform``/``array_distinct``) stay JVM-side."""
    from pyspark.ml.fpm import FPGrowth

    tx = (
        df.filter(F.col("tags").isNotNull() & (F.size("tags") > 0))
        .select(
            F.array_distinct(
                F.transform(F.col("tags"), lambda t: t["value"])
            ).alias("items")
        )
    )
    model = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=min_confidence
    ).fit(tx)
    rules = model.associationRules
    if target_tags:
        rules = rules.filter(F.array_contains("antecedent", target_tags[0]))
    return rules.select(
        "antecedent", "consequent", "confidence", "lift", "support"
    )
