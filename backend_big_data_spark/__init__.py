"""backend_big_data_spark — a PySpark-native analytics engine.

A Spark-first re-expression of the query and data-processing capabilities of
the reference system (CiccioRomeo/backend-big-data, surveyed in SURVEY.md),
extended with the operators a large-scale (100 TB) training-data pipeline
needs: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search over embeddings, text analysis, multimodal binary-column
plumbing, and Structured Streaming over event tables.

Design stance (SURVEY.md §7): declare logical plans with the DataFrame API and
let Catalyst/Tungsten choose physical strategy; no custom execution machinery.
"""

__version__ = "0.1.0"
