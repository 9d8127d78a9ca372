from backend_big_data_spark.functions.scalars import (  # noqa: F401
    haversine_km,
    photo_url,
)
from backend_big_data_spark.functions.textfns import (  # noqa: F401
    char_shingles,
    tokens,
    word_shingles,
)
