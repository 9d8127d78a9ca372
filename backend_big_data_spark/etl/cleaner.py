"""Batch cleaning — the reference's three ETL scripts as one composable
pipeline (SURVEY.md §2.1/2.2):

- ``data_cleaner.py:84-96``  — dedup, sentinel-date nulling, regex filter
- ``adjust_comments.py:16-19`` — null comments → 0
- ``adjust_camera_info.py:16-25`` — null/partial camera_info → sentinels

Each step is a pure DataFrame→DataFrame function so jobs pick what they
need; ``clean_photos`` chains all of them. Sinks mirror S5/S6: single-file
for exports, partitioned (the default) for anything at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: ``data_cleaner.py:90`` — sentinel strings Flickr emits for unknown dates.
BAD_DATE_SENTINELS = ("Jan 1, 0001 12:00:00 AM", "Jan 1, 1000 12:00:00 AM")

#: Keep photos posted 2000+ (US-style date prefix). The reference's regex
#: (``data_cleaner.py:96``: ``^\w+ \d+, (20\d{2}|\d{3})``) is itself buggy —
#: the unanchored ``\d{3}`` alternative matches the first three digits of
#: ANY year, so e.g. 1999 slips through; the docstring's intent ("dal 2000
#: in poi") is implemented here.
POSTED_2000S_RE = r"^\w+ \d+, 20\d{2} "

def _camera_sentinel():
    # built lazily: Column construction needs an active SparkContext
    return F.struct(
        F.lit("Marca fotocamera non disponibile").alias("make"),
        F.lit("Modello fotocamera non disponibile").alias("model"),
    )


def drop_exact_duplicates(df: DataFrame) -> DataFrame:
    """``data_cleaner.py:84`` — all-column dedup (A10). At 100 TB prefer a
    key-based ``dropDuplicates(["id"])``: it shuffles on a single narrow
    column instead of hashing whole rows."""
    return df.dropDuplicates()


def null_sentinel_dates(df: DataFrame, column: str = "dateTaken") -> DataFrame:
    """``data_cleaner.py:86-93`` — P9+P12: sentinel date strings → null."""
    return df.withColumn(
        column,
        F.when(F.col(column).isin(*BAD_DATE_SENTINELS), F.lit(None)).otherwise(
            F.col(column)
        ),
    )


def keep_posted_since_2000(df: DataFrame, column: str = "datePosted") -> DataFrame:
    """``data_cleaner.py:96`` — P11 regex predicate on the string prefix."""
    return df.filter(F.col(column).rlike(POSTED_2000S_RE))


def fill_null_comments(df: DataFrame) -> DataFrame:
    """``adjust_comments.py:16-19`` — flat null-fill; ``fillna`` is the
    idiomatic form of the reference's when/otherwise."""
    return df.fillna({"comments": 0})


def fill_missing_camera_info(df: DataFrame) -> DataFrame:
    """``adjust_camera_info.py:16-25`` — struct-valued conditional fill:
    null or PARTIALLY-null camera_info becomes the sentinel struct."""
    return df.withColumn(
        "camera_info",
        F.when(
            F.col("camera_info").isNull()
            | F.col("camera_info.make").isNull()
            | F.col("camera_info.model").isNull(),
            _camera_sentinel(),
        ).otherwise(F.col("camera_info")),
    )


def clean_photos(df: DataFrame) -> DataFrame:
    """The full reference cleaning chain in declared order."""
    df = drop_exact_duplicates(df)
    df = null_sentinel_dates(df)
    df = keep_posted_since_2000(df)
    df = fill_null_comments(df)
    return fill_missing_camera_info(df)


def write_json_single_file(df: DataFrame, path: str) -> None:
    """S5 (``data_cleaner.py:100``): ``coalesce(1)`` single-file JSON —
    export-only; one task writes everything, so never on the scale path."""
    df.coalesce(1).write.mode("overwrite").json(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """The engine's default sink: partitioned parquet (S6 upgraded from
    JSON). ``partition_by`` should be the dominant filter column so reads
    get partition pruning."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
