"""Photo table schema — the reference's data model, corrected.

Mirrors the 45-leaf-field schema the reference declares at
``main.py:82-140`` with one deliberate change (SURVEY.md §1.3 / B7): the
reference types ``tags`` as ``array<string>`` (``main.py:135``) yet every
query dereferences ``tags.value`` (``queries.py:70,284,378,404``), which
only type-checks against the ETL schemas' ``array<struct<count:int,
value:string>>`` (``data_cleaner.py:66-71``, ``update_dataset.py:71-76``).
The struct form is the actual data model; we adopt it.

Second deliberate change (SURVEY.md §7 hard-part b): the reference carries
dates as STRINGS and re-parses them in every query
(``queries.py:208,223,502``). ``ingest`` parses once to ``TimestampType``
with a pinned UTC session zone; every downstream query then uses plain
``year()/month()/hour()`` on timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: ISO-8601 pattern the reference parses per-query at ``queries.py:221-224``.
DATE_PATTERN = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"

TAGS_TYPE = ArrayType(
    StructType(
        [
            StructField("count", IntegerType(), True),
            StructField("value", StringType(), True),
        ]
    )
)

OWNER_TYPE = StructType(
    [
        StructField("admin", BooleanType(), True),
        StructField("bandwidthMax", IntegerType(), True),
        StructField("bandwidthUsed", IntegerType(), True),
        StructField("filesizeMax", IntegerType(), True),
        StructField("iconFarm", IntegerType(), True),
        StructField("iconServer", IntegerType(), True),
        StructField("id", StringType(), True),
        StructField("photosCount", IntegerType(), True),
        StructField("pro", BooleanType(), True),
        StructField("revContact", BooleanType(), True),
        StructField("revFamily", BooleanType(), True),
        StructField("revFriend", BooleanType(), True),
        StructField("username", StringType(), True),
    ]
)

#: Raw (at-rest) schema — dates still strings, exactly as the source JSON.
PHOTO_SCHEMA_RAW = StructType(
    [
        StructField(
            "camera_info",
            StructType(
                [
                    StructField("make", StringType(), True),
                    StructField("model", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("comments", IntegerType(), True),
        StructField("datePosted", StringType(), True),
        StructField("dateTaken", StringType(), True),
        StructField("familyFlag", BooleanType(), True),
        StructField("farm", StringType(), True),
        StructField("favorite", BooleanType(), True),
        StructField("friendFlag", BooleanType(), True),
        StructField(
            "geoData",
            StructType(
                [
                    StructField("accuracy", IntegerType(), True),
                    StructField("latitude", DoubleType(), True),
                    StructField("longitude", DoubleType(), True),
                ]
            ),
            True,
        ),
        StructField("hasPeople", BooleanType(), True),
        StructField("iconFarm", StringType(), True),
        StructField("iconServer", StringType(), True),
        StructField("id", StringType(), True),
        StructField("lastUpdate", StringType(), True),
        StructField("license", StringType(), True),
        StructField("media", StringType(), True),
        StructField("mediaStatus", StringType(), True),
        StructField("notes", ArrayType(StringType()), True),
        StructField("originalFormat", StringType(), True),
        StructField("originalHeight", IntegerType(), True),
        StructField("originalSecret", StringType(), True),
        StructField("originalWidth", IntegerType(), True),
        StructField("owner", OWNER_TYPE, True),
        StructField("pathAlias", StringType(), True),
        StructField("photo_url", StringType(), True),
        StructField("placeId", StringType(), True),
        StructField("primary", BooleanType(), True),
        StructField("publicFlag", BooleanType(), True),
        StructField("rotation", IntegerType(), True),
        StructField("secret", StringType(), True),
        StructField("server", StringType(), True),
        StructField("tags", TAGS_TYPE, True),  # §1.3 correction (B7)
        StructField("title", StringType(), True),
        StructField("url", StringType(), True),
        StructField("urls", ArrayType(StringType()), True),
        StructField("views", IntegerType(), True),
    ]
)

MONUMENTS_SCHEMA = StructType(
    [
        StructField("name", StringType(), True),
        StructField("latitude", DoubleType(), True),
        StructField("longitude", DoubleType(), True),
    ]
)


def ingest(df: DataFrame) -> DataFrame:
    """Normalize a raw photos DataFrame: parse both date strings to
    timestamps ONCE (the reference re-parses per query). Non-conforming
    date strings become null, which downstream ``isNotNull`` guards handle
    exactly as the reference's behavior on unparseable dates."""
    return df.withColumn(
        "datePosted", F.to_timestamp("datePosted")
    ).withColumn("dateTaken", F.to_timestamp("dateTaken"))


def read_photos_json(spark: SparkSession, path: str) -> DataFrame:
    """Explicit-schema JSON scan (reference S1, ``main.py:142-144``) +
    ingest normalization. No schema inference on the hot path (S2 note)."""
    return ingest(spark.read.schema(PHOTO_SCHEMA_RAW).json(path))


def read_photos_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar variant — the engine's preferred at-rest format (SURVEY
    §1.4): scan prunes to referenced columns, filters push down. At 100 TB
    the table would be written partitioned by ``year(datePosted)``."""
    return ingest(spark.read.parquet(path))


def read_monuments(spark: SparkSession, path: str) -> DataFrame:
    """The 19-row monuments side table. The reference loads it driver-side
    with ``json.load`` (S3, ``mlqueries.py:71-74``); here it is a proper
    (broadcastable) DataFrame."""
    return spark.read.schema(MONUMENTS_SCHEMA).json(path)
