"""Photo-domain queries registered against the driver's correctness gate.

The reference's whole serving surface (SURVEY.md §2.12) runs over one photos
table; the driver's synthetic catalog lacks one, so these queries run over
the committed deterministic fixture ``tests/data/photos.parquet`` (generated
by ``tools/gen_photo_fixture.py``, seed=42) and their oracles read the SAME
file via DuckDB ``read_parquet`` — full value-hash parity, same gate as the
TPC-H-shaped queries. The ``sf_dir`` argument is accepted (driver calling
convention) and ignored: the photo table does not scale with sf.

Date handling: the Spark side parses ISO strings to timestamps once at
ingest (``photo/schema.py::ingest``, UTC session zone); the oracles extract
year/month/hour from the raw ISO string (fixed ``+00:00`` offset in the
fixture) with ``substr`` so DuckDB timezone casting rules can't skew parity.
ISO-8601 strings with one fixed offset sort chronologically, so string
``MIN``/comparisons are order-equivalent to timestamp ones.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_big_data_spark.functions.scalars import avatar_url, photo_url, round_half_up
from backend_big_data_spark.operators.aggregates import argmax_per_group
from backend_big_data_spark.photo import queries as pq
from backend_big_data_spark.photo.schema import read_photos_parquet
from backend_big_data_spark.plans.registry import register

FIXTURE = str(Path(__file__).resolve().parents[2] / "tests" / "data" / "photos.parquet")

#: DuckDB relation over the same file the Spark side reads.
_RP = f"read_parquet('{FIXTURE}')"

#: DuckDB timestamp from the fixture's fixed-offset ISO string.
_TS = "CAST(replace(substr({c},1,23),'T',' ') AS TIMESTAMP)"


def _photos(spark: SparkSession) -> DataFrame:
    return read_photos_parquet(spark, FIXTURE)


# -- histograms (reference queries.py:73-163, endpoints §2.12) --------------


@register(
    "photo_count_by_year",
    oracle=f"""
SELECT CAST(substr(datePosted,1,4) AS INT) AS year, COUNT(id) AS count
FROM {_RP} WHERE datePosted IS NOT NULL
GROUP BY 1 ORDER BY year
""",
)
def photo_count_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/photoCountPosted semantics (reference ``queries.py:84-93``): A1
    count-per-group over a derived year column."""
    return pq.photo_count_by_year_posted(_photos(spark)).withColumn(
        "year", F.col("year").cast("int")
    )


@register(
    "photo_count_by_hour_taken",
    oracle=f"""
SELECT CAST(substr(dateTaken,12,2) AS INT) AS hourTaken,
       COUNT(*) AS photosTakenCount
FROM {_RP} WHERE dateTaken IS NOT NULL
GROUP BY 1 ORDER BY hourTaken
""",
)
def photo_count_by_hour_taken(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/photoCountHour taken-variant (reference ``queries.py:153-163``)."""
    return pq.count_photos_taken_per_hour(_photos(spark)).withColumn(
        "hourTaken", F.col("hourTaken").cast("int")
    )


@register(
    "photo_accuracy_distribution",
    oracle=f"""
SELECT struct_extract(geoData,'accuracy') AS accuracy, COUNT(*) AS count
FROM {_RP}
GROUP BY 1 ORDER BY accuracy
""",
)
def photo_accuracy_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/accuracyDistribution (reference ``queries.py:268-276``); null
    accuracies form a group (A12 semantics kept)."""
    return pq.calculate_accuracy_distribution(_photos(spark))


@register(
    "photo_pro_distribution",
    oracle=f"""
SELECT struct_extract(owner,'pro') AS pro, COUNT(*) AS count
FROM {_RP} WHERE struct_extract(owner,'pro') IS NOT NULL
GROUP BY 1
""",
)
def photo_pro_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/proUsersDistribution — B8: counts PHOTOS per pro flag (observable
    reference behavior, ``queries.py:187-195``)."""
    return pq.calculate_pro_user_distribution(_photos(spark))


@register(
    "photo_pro_distribution_users",
    oracle=f"""
SELECT struct_extract(owner,'pro') AS pro,
       COUNT(DISTINCT struct_extract(owner,'id')) AS count
FROM {_RP} WHERE struct_extract(owner,'pro') IS NOT NULL
GROUP BY 1
""",
)
def photo_pro_distribution_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 docstring-intent variant: DISTINCT USERS per pro flag (A9)."""
    return pq.pro_user_distribution_distinct(_photos(spark))


# -- tags -------------------------------------------------------------------


@register(
    "photo_top_tags",
    oracle=f"""
SELECT tag AS tagValue, COUNT(*) AS count
FROM (SELECT struct_extract(UNNEST(tags),'value') AS tag FROM {_RP})
GROUP BY 1 ORDER BY count DESC, tagValue LIMIT 20
""",
)
def photo_top_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/topTags (reference ``queries.py:278-287``): explode → count →
    ranking; skewed tag keys lean on partial agg + AQE skew handling."""
    return pq.get_top_tags(_photos(spark), limit=20)


# -- stats ------------------------------------------------------------------


@register(
    "photo_engagement_by_year",
    oracle=f"""
SELECT CAST(substr(datePosted,1,4) AS INT) AS yearPosted,
       FLOOR(AVG(views)*10000 + 0.5)/10000 AS averageViews,
       FLOOR(AVG(comments)*10000 + 0.5)/10000 AS averageComments
FROM {_RP}
GROUP BY 1 ORDER BY yearPosted NULLS FIRST
""",
)
def photo_engagement_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/avgViewsPerYear + /avgCommentsPerYear fused (reference
    ``queries.py:165-184``) — one scan, one hash agg instead of two; null
    posting years form a group (A12)."""
    df = _photos(spark)
    return (
        df.groupBy(F.year("datePosted").cast("int").alias("yearPosted"))
        .agg(
            round_half_up(F.avg("views"), 4).alias("averageViews"),
            round_half_up(F.avg("comments"), 4).alias("averageComments"),
        )
        .orderBy(F.asc_nulls_first("yearPosted"))
    )


@register(
    "photo_time_to_post",
    oracle=f"""
SELECT FLOOR(AVG(d)*10000 + 0.5)/10000 AS averageTimeToPostMinutes
FROM (
  SELECT date_diff('second', {_TS.format(c="dateTaken")},
                   {_TS.format(c="datePosted")})/60.0 AS d
  FROM {_RP}
  WHERE datePosted IS NOT NULL AND dateTaken IS NOT NULL
)
""",
)
def photo_time_to_post(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/averageTimeToPost (reference ``queries.py:198-211``): global A6
    aggregate over an epoch-diff derived column."""
    out = pq.calculate_average_time_to_post(_photos(spark))
    return out.select(
        round_half_up(F.col("averageTimeToPostMinutes"), 4).alias(
            "averageTimeToPostMinutes"
        )
    )


@register(
    "photo_views_quartiles",
    oracle=f"""
SELECT FLOOR(quantile_cont(views, 0.25)*10000 + 0.5)/10000 AS views_p25,
       FLOOR(quantile_cont(views, 0.50)*10000 + 0.5)/10000 AS views_p50,
       FLOOR(quantile_cont(views, 0.75)*10000 + 0.5)/10000 AS views_p75,
       COUNT(views) AS n
FROM {_RP}
""",
)
def photo_views_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/viewStats generalized (reference A7, ``queries.py:246-255``) with
    EXACT interpolated percentiles — cross-engine checkable, unlike
    ``percentile_approx`` (which ``calculate_views_stats`` keeps as the
    100 TB single-pass path)."""
    df = _photos(spark)
    return df.agg(
        round_half_up(F.expr("percentile(views, 0.25)"), 4).alias("views_p25"),
        round_half_up(F.expr("percentile(views, 0.50)"), 4).alias("views_p50"),
        round_half_up(F.expr("percentile(views, 0.75)"), 4).alias("views_p75"),
        F.count("views").alias("n"),
    )


@register(
    "photo_first_post_cohorts",
    oracle=f"""
WITH first_posts AS (
  SELECT struct_extract(owner,'id') AS owner_id,
         MIN(datePosted) AS first_post
  FROM {_RP} WHERE datePosted IS NOT NULL
  GROUP BY 1
)
SELECT CAST(substr(first_post,1,4) AS INT) AS year,
       CAST(substr(first_post,6,2) AS INT) AS month,
       COUNT(*) AS count
FROM first_posts GROUP BY 1, 2 ORDER BY year, month
""",
)
def photo_first_post_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/firstPostPerYear (reference ``queries.py:214-244``): A4 min-per-user
    then re-aggregated into (year, month) cohorts — two hash aggs, no window.
    String MIN in the oracle ≡ timestamp MIN (fixed-offset ISO sorts
    chronologically)."""
    out = pq.first_post_per_year_month(_photos(spark))
    return out.select(
        F.col("year").cast("int").alias("year"),
        F.col("month").cast("int").alias("month"),
        "count",
    )


# -- owners -----------------------------------------------------------------


@register(
    "photo_top_owners",
    oracle=f"""
SELECT struct_extract(owner,'username') AS username,
       CAST(SUM(views) AS BIGINT) AS total_views
FROM {_RP}
GROUP BY 1 ORDER BY total_views DESC NULLS LAST, username LIMIT 50
""",
)
def photo_top_owners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/top50Owners (reference ``queries.py:354-364``): TakeOrderedAndProject
    top-k, no global sort."""
    return pq.top_50_owners(_photos(spark))


@register(
    "photo_owner_profiles",
    oracle=f"""
WITH per_photo AS (
  SELECT struct_extract(owner,'id') AS owner_id,
         struct_extract(owner,'username') AS username,
         COALESCE(views, 0) AS v, COALESCE(comments, 0) AS c,
         id, farm, server, secret,
         struct_extract(owner,'iconFarm') AS icon_farm,
         struct_extract(owner,'iconServer') AS icon_server
  FROM {_RP}
), winners AS (
  SELECT owner_id, username, v, c,
         'https://farm' || farm || '.staticflickr.com/' || server || '/' ||
           id || '_' || secret || '.jpg' AS best_photo_url,
         CASE WHEN icon_farm IS NOT NULL AND icon_server IS NOT NULL
                   AND icon_farm <> 0 AND icon_server <> 0
              THEN 'https://farm' || icon_farm || '.staticflickr.com/' ||
                   icon_server || '/buddyicons/' || owner_id || '.jpg'
              ELSE 'https://www.flickr.com/images/buddyicon.gif'
         END AS avatar_url,
         CAST(SUM(v) OVER (PARTITION BY owner_id) AS BIGINT) AS total_views,
         COUNT(*) OVER (PARTITION BY owner_id) AS total_photos,
         ROW_NUMBER() OVER (PARTITION BY owner_id
                            ORDER BY v DESC, c DESC, id DESC) AS rn
  FROM per_photo
)
SELECT owner_id, username, total_photos, total_views,
       v AS most_viewed_photo_views, c AS most_viewed_photo_comments,
       best_photo_url, avatar_url
FROM winners WHERE rn = 1
""",
)
def photo_owner_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/searchOwner core (reference ``queries.py:298-351``): per-owner totals
    + argmax photo by (views, comments, id) via max-of-struct — ONE hash
    aggregate; the oracle needs a window + self-partition pass to say the
    same thing. URL UDF F1 → ``format_string``; avatar HTTP UDF F2
    (``flickrapi_utils.py:7-25``) → precomputed-icon column expression
    carried through the same aggregate (no network, no extra shuffle)."""
    df = _photos(spark)
    return argmax_per_group(
        df.withColumn("owner_id", F.col("owner.id")).withColumn(
            "username", F.col("owner.username")
        ),
        group_by=["owner_id", "username"],
        order_cols=[
            F.coalesce(F.col("views"), F.lit(0)),
            F.coalesce(F.col("comments"), F.lit(0)),
            F.col("id"),
        ],
        payload={
            "most_viewed_photo_views": F.coalesce(F.col("views"), F.lit(0)).cast("int"),
            "most_viewed_photo_comments": F.coalesce(F.col("comments"), F.lit(0)).cast("int"),
            "best_photo_url": photo_url(
                F.col("farm"), F.col("server"), F.col("id"), F.col("secret")
            ),
            # winner-row icon semantics (matches the oracle, which reads the
            # rn=1 row): icons ride the argmax struct, not a separate max()
            "_icon_farm": F.col("owner.iconFarm"),
            "_icon_server": F.col("owner.iconServer"),
        },
        extra_aggs={
            "total_views": F.sum(F.coalesce(F.col("views"), F.lit(0))),
            "total_photos": F.count("id"),
        },
    ).select(
        "owner_id", "username", "total_photos", "total_views",
        "most_viewed_photo_views", "most_viewed_photo_comments",
        "best_photo_url",
        avatar_url(
            F.col("owner_id"), F.col("_icon_farm"), F.col("_icon_server")
        ).alias("avatar_url"),
    )


# -- cameras ----------------------------------------------------------------


@register(
    "photo_brand_top_models",
    oracle=f"""
WITH base AS (
  SELECT struct_extract(camera_info,'make') AS make,
         struct_extract(camera_info,'model') AS model
  FROM {_RP}
  WHERE struct_extract(camera_info,'make') IS NOT NULL
    AND struct_extract(camera_info,'model') IS NOT NULL
    AND struct_extract(camera_info,'make') <> 'Marca fotocamera non disponibile'
    AND struct_extract(camera_info,'model') <> 'Modello fotocamera non disponibile'
), counts AS (
  SELECT make, model, COUNT(*) AS count FROM base GROUP BY 1, 2
), top_brands AS (
  SELECT make FROM counts GROUP BY make
  ORDER BY SUM(count) DESC, make LIMIT 5
)
SELECT c.make, c.model, c.count
FROM counts c JOIN top_brands USING (make)
QUALIFY ROW_NUMBER() OVER (PARTITION BY c.make
                           ORDER BY c.count DESC, c.model) <= 5
ORDER BY c.make, c.count DESC, c.model
""",
)
def photo_brand_top_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/getTopBrandAndCameras (reference ``queries.py:442-476``, B5 FIXED —
    sentinel rows excluded): two-level agg (A11) + broadcast join against the
    5-row brand list (J1) + per-brand top-k window (W3)."""
    return pq.top_brands_with_models(_photos(spark))


# -- search -----------------------------------------------------------------


@register(
    "photo_search",
    oracle=f"""
SELECT 'https://farm' || farm || '.staticflickr.com/' || server || '/' ||
         id || '_' || secret || '.jpg' AS url,
       struct_extract(owner,'username') AS username,
       COALESCE(array_to_string(
         list_transform(tags, x -> struct_extract(x,'value')), '|'), '') AS tags,
       views, title,
       strftime({_TS.format(c="dateTaken")}, '%H:%M - %d/%m/%Y') AS dateTaken,
       strftime({_TS.format(c="datePosted")}, '%H:%M - %d/%m/%Y') AS datePosted
FROM {_RP}
WHERE (
    (contains(lower(title), 'sunset')
       OR COALESCE(len(list_filter(tags,
            x -> contains(lower(struct_extract(x,'value')), 'sunset'))) > 0, FALSE)
       OR contains(lower(struct_extract(owner,'username')), 'sunset'))
    AND datePosted >= '2021-01-01' AND datePosted <= '2022-12-31T23:59:59'
  )
  OR COALESCE(len(list_filter(tags,
       x -> lower(struct_extract(x,'value')) = 'rome')) > 0, FALSE)
""",
)
def photo_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/searchPhotos (reference ``queries.py:367-439``, SURVEY §3.2):
    parameter-shaped plan — keyword branch over title/tags/username AND a
    date range, unioned (U1) with a tag branch over the ORIGINAL table, then
    dedup by id (B10: ``exists`` predicates, no explode-duplication). The
    whole plan is codegen-able — no UDF (F1 → format_string).

    Oracle-facing twin: the array-typed ``tags`` column is pipe-joined to a
    scalar (the ``priority_status_sets`` pattern — external row-hashers
    can't canonicalize array cells); the API keeps the array form
    (``photo/api.py`` search endpoint, tested in test_photo_domain)."""
    out = pq.search_photos(
        _photos(spark),
        keyword="sunset",
        data_inizio="2021-01-01 00:00:00",
        data_fine="2022-12-31 23:59:59",
        tag_list=["rome"],
    )
    # concat_ws never returns NULL (null array -> ''), hence the oracle's
    # COALESCE(..., '')
    return out.withColumn("tags", F.concat_ws("|", "tags"))
