from backend_big_data_spark.operators.aggregates import argmax_per_group  # noqa: F401
from backend_big_data_spark.operators.windows import (  # noqa: F401
    global_rank,
    paginate,
    topk_per_group,
)
