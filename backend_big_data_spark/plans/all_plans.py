"""Import every plan module so the registry is fully populated."""

from backend_big_data_spark.plans import (  # noqa: F401
    advanced,
    documents,
    embeddings_events,
    extended,
    ml_plans,
    photo_plans,
    relational,
    subqueries,
    tpch_extra,
)
from backend_big_data_spark.plans.registry import ORACLES, QUERIES  # noqa: F401
