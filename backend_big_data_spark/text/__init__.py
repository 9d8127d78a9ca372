from backend_big_data_spark.text.dedup import (  # noqa: F401
    exact_dedup_fingerprints,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from backend_big_data_spark.text.langid import predict_lang  # noqa: F401
from backend_big_data_spark.text.quality import quality_profile  # noqa: F401
