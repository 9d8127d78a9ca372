"""ML query plans (SURVEY.md §2.10) — iterative algorithms, rows-only checks
(KMeans/FPGrowth are not SQL-expressible; the driver records the weaker
rows/schema check and unit tests assert semantics on fixtures)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.functions.textfns import tokens
from backend_big_data_spark.ml.clustering import cluster_sizes, kmeans_fit_predict
from backend_big_data_spark.ml.fpm import frequent_itemsets
from backend_big_data_spark.plans.registry import register
from backend_big_data_spark.sources.catalog import load_table


@register("kmeans_embedding_clusters")  # rows-only: iterative, seeded
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 (mlqueries.py:14-61) over the embeddings table: seeded KMeans
    k=10 on the 64-dim vectors; bounded per-cluster summary out (the
    reference collected every labeled point to the driver)."""
    emb = load_table(spark, sf_dir, "embeddings")
    _, labeled = kmeans_fit_predict(emb, k=10, array_col="embedding", seed=42)
    return cluster_sizes(labeled)


@register("doc_token_itemsets")  # rows-only: FPGrowth
def doc_token_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 (mlqueries.py:148-170) with documents-as-transactions: frequent
    token itemsets at high support (word-soup corpus → keep support high so
    the lattice stays small)."""
    docs = load_table(spark, sf_dir, "documents")
    tx = docs.select(tokens(F.col("text")).alias("toks"))
    return frequent_itemsets(tx, "toks", min_support=0.7, min_confidence=0.9)
