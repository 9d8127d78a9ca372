from backend_big_data_spark.similarity.ann import (  # noqa: F401
    brute_force_cosine_topk,
    cosine_sim,
    lsh_cosine_topk,
)
