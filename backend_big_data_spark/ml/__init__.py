from backend_big_data_spark.ml.clustering import (  # noqa: F401
    cluster_sizes,
    kmeans_fit_predict,
)
from backend_big_data_spark.ml.fpm import association_rules, frequent_itemsets  # noqa: F401
