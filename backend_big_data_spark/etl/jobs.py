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
    reader = spark.read.schema(PHOTO_SCHEMA_RAW)
    raw = reader.json(in_path) if in_format == "json" else reader.parquet(in_path)
    cleaned = clean_photos(raw)
    enriched = enrich_photos(cleaned, fetcher_factory)
    write_parquet(enriched, out_path)
    return enriched
