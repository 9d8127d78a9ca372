"""End-to-end batch jobs composing the ETL stages — the reference's script
sequence (data_cleaner → update_dataset → adjust_*) as one idempotent
pipeline: read (explicit schema) → clean → enrich → partitioned parquet."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from backend_big_data_spark.etl.cleaner import clean_photos, write_parquet
from backend_big_data_spark.etl.enrich import Fetcher, enrich_photos
from backend_big_data_spark.photo.schema import PHOTO_SCHEMA_RAW


def clean_and_enrich_job(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    fetcher_factory: Callable[[], Fetcher],
    in_format: str = "json",
) -> DataFrame:
    """Full pipeline over raw photo records. Returns the enriched frame
    (already written to ``out_path`` as parquet). Each stage is the tested
    library function; this composes them in the reference's order."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    reader = spark.read.schema(PHOTO_SCHEMA_RAW)
    raw = reader.json(in_path) if in_format == "json" else reader.parquet(in_path)
    cleaned = clean_photos(raw)
    enriched = enrich_photos(cleaned, fetcher_factory)
    # Row count is observed ON the write pass itself: a second enriched.count()
    # would re-execute the whole pipeline (including the mapInPandas REST
    # enrichment — doubling external fetch volume), and a source change
    # between write and verify would raise a false failure.
    obs = Observation("post_write")
    write_parquet(enriched.observe(obs, F.count(F.lit(1)).alias("n")), out_path)
    n_src = obs.get["n"]
    # Post-write verification read-back (the reference re-reads and counts
    # after every dataset update, update_dataset.py:165-168): the written
    # files must re-read with the enriched schema and a matching row count —
    # a truncated/partial write fails the job, not the next reader.
    written = spark.read.parquet(out_path)
    n_written = written.count()
    if n_written != n_src:
        raise RuntimeError(
            f"post-write verification failed: wrote {out_path} with "
            f"{n_written} rows, expected {n_src}"
        )
    missing = set(f.name for f in enriched.schema.fields) - set(
        f.name for f in written.schema.fields
    )
    if missing:
        raise RuntimeError(
            f"post-write verification failed: {out_path} lost columns {missing}"
        )
    return enriched
