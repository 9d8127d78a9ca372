"""The reference's 22 relational query functions (``queries.py``), each
re-expressed Spark-first over the corrected photo schema with the SURVEY.md
§2.13 bugs fixed. Every function cites its reference implementation.

Inputs are DataFrames produced by ``photo.schema.ingest`` (dates already
timestamps). All functions are lazy plan builders — no collect here; the
serving boundary (``photo.api``) owns collection, exactly the reference's
layering (``endpoints.py`` collects, ``queries.py`` composes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from backend_big_data_spark.functions.scalars import avatar_url, photo_url
from backend_big_data_spark.operators.aggregates import argmax_per_group
from backend_big_data_spark.operators.windows import (
    global_rank,
    paginate,
    topk_per_group,
)

#: Sentinel strings the reference's cleaner writes for missing camera info
#: (``adjust_camera_info.py:16-25``) and should exclude from rankings but
#: doesn't (bug B5, ``queries.py:451-457``).
CAMERA_MAKE_SENTINEL = "Marca fotocamera non disponibile"
CAMERA_MODEL_SENTINEL = "Modello fotocamera non disponibile"


# -- paging / raw rows ------------------------------------------------------


def paginate_photos(df: DataFrame, page: int, page_size: int) -> DataFrame:
    """Stable pagination by photo id — reference ``queries.py:10-28`` with
    bug B6 fixed (it ordered by ``lit(1)``: nondeterministic pages through a
    single-partition window; here: keyed order + offset/limit)."""
    return paginate(df, ["id"], page=page, page_size=page_size)


def get_first_n_rows(df: DataFrame, n: int) -> DataFrame:
    """Reference ``queries.py:42-49``."""
    return df.limit(n)


def get_years(df: DataFrame) -> DataFrame:
    """Distinct posting years, ascending — reference ``queries.py:31-40``."""
    return (
        df.filter(F.col("datePosted").isNotNull())
        .select(F.year("datePosted").alias("year"))
        .distinct()
        .orderBy("year")
    )


# -- histograms -------------------------------------------------------------


def count_photos_by_coordinates(df: DataFrame) -> DataFrame:
    """Per-(lat, lon) photo counts — reference ``queries.py:51-59``. Null
    coordinates form a group, matching reference semantics (A12)."""
    return (
        df.groupBy(
            F.col("geoData.latitude").alias("latitude"),
            F.col("geoData.longitude").alias("longitude"),
        )
        .agg(F.count("id").alias("photoCount"))
        .orderBy(F.desc("photoCount"))
    )


def _count_by_datepart(df: DataFrame, date_col: str, part, alias: str) -> DataFrame:
    return (
        df.filter(F.col(date_col).isNotNull())
        .groupBy(part(F.col(date_col)).alias(alias))
        .agg(F.count("id").alias("count"))
        .orderBy(alias)
    )


def photo_count_by_month_posted(df: DataFrame) -> DataFrame:
    """Reference ``queries.py:73-82``."""
    return _count_by_datepart(df, "datePosted", F.month, "month")


def photo_count_by_year_posted(df: DataFrame) -> DataFrame:
    """Reference ``queries.py:84-93``."""
    return _count_by_datepart(df, "datePosted", F.year, "year")


def photo_count_by_month_taken(df: DataFrame) -> DataFrame:
    """Reference ``queries.py:95-104``."""
    return _count_by_datepart(df, "dateTaken", F.month, "month")


def photo_count_by_year_taken(df: DataFrame) -> DataFrame:
    """Reference ``queries.py:106-115``."""
    return _count_by_datepart(df, "dateTaken", F.year, "year")


def photo_posted_per_month_by_year_posted(df: DataFrame, input_year: int) -> DataFrame:
    """Monthly histogram within one posting year — ``queries.py:117-127``."""
    return (
        df.filter(
            F.col("datePosted").isNotNull()
            & (F.year("datePosted") == input_year)
        )
        .groupBy(F.month("datePosted").alias("month"))
        .agg(F.count("id").alias("count"))
        .orderBy("month")
    )


def photo_posted_per_month_by_year_taken(df: DataFrame, input_year: int) -> DataFrame:
    """Monthly histogram within one TAKEN year — reference
    ``queries.py:129-138`` filters on ``dateTaken`` year but groups by
    ``month(datePosted)`` (bug B1); intent per docstring is the taken month,
    implemented here."""
    return (
        df.filter(
            F.col("dateTaken").isNotNull() & (F.year("dateTaken") == input_year)
        )
        .groupBy(F.month("dateTaken").alias("month"))
        .agg(F.count("id").alias("count"))
        .orderBy("month")
    )


def count_photos_posted_per_hour(df: DataFrame) -> DataFrame:
    """Reference ``queries.py:141-151``."""
    return (
        df.filter(F.col("datePosted").isNotNull())
        .groupBy(F.hour("datePosted").alias("hourPosted"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.asc("hourPosted"))
    )


def count_photos_taken_per_hour(df: DataFrame) -> DataFrame:
    """Reference ``queries.py:153-163``."""
    return (
        df.filter(F.col("dateTaken").isNotNull())
        .groupBy(F.hour("dateTaken").alias("hourTaken"))
        .agg(F.count("*").alias("photosTakenCount"))
        .orderBy(F.asc("hourTaken"))
    )


def calculate_accuracy_distribution(df: DataFrame) -> DataFrame:
    """GPS-accuracy histogram — reference ``queries.py:268-276``."""
    return (
        df.groupBy(F.col("geoData.accuracy").alias("accuracy"))
        .agg(F.count("*").alias("count"))
        .orderBy(F.asc("accuracy"))
    )


def calculate_pro_user_distribution(df: DataFrame) -> DataFrame:
    """Photo counts per owner.pro flag — reference ``queries.py:187-195``.
    B8 note: despite the "utenti" docstring this counts PHOTOS, not distinct
    users; the observable behavior is kept (documented), and
    ``pro_user_distribution_distinct`` provides the docstring's intent."""
    return (
        df.filter(F.col("owner.pro").isNotNull())
        .groupBy(F.col("owner.pro").alias("pro"))
        .agg(F.count("*").alias("count"))
    )


def pro_user_distribution_distinct(df: DataFrame) -> DataFrame:
    """B8 intent variant: DISTINCT USERS per pro flag."""
    return (
        df.filter(F.col("owner.pro").isNotNull())
        .groupBy(F.col("owner.pro").alias("pro"))
        .agg(F.countDistinct("owner.id").alias("count"))
    )


# -- stats ------------------------------------------------------------------


def calculate_views_by_year(df: DataFrame) -> DataFrame:
    """Average views per posting year — reference ``queries.py:165-173``.
    Null posting years form a group (A12), as in the reference."""
    return (
        df.groupBy(F.year("datePosted").alias("yearPosted"))
        .agg(F.avg("views").alias("averageViews"))
        .orderBy("yearPosted")
    )


def calculate_comments_by_year(df: DataFrame) -> DataFrame:
    """Reference ``queries.py:176-184``."""
    return (
        df.groupBy(F.year("datePosted").alias("yearPosted"))
        .agg(F.avg("comments").alias("averageComments"))
        .orderBy("yearPosted")
    )


def calculate_average_time_to_post(df: DataFrame) -> DataFrame:
    """Global mean minutes between taking and posting — reference
    ``queries.py:198-211`` (epoch-diff ÷ 60). Dates are already timestamps
    here, so no per-query ``to_timestamp`` re-parse."""
    minutes = (
        F.unix_timestamp("datePosted") - F.unix_timestamp("dateTaken")
    ) / 60.0
    return (
        df.filter(F.col("datePosted").isNotNull() & F.col("dateTaken").isNotNull())
        .withColumn("timeToPost", minutes)
        .agg(F.avg("timeToPost").alias("averageTimeToPostMinutes"))
    )


def first_post_per_year_month(df: DataFrame) -> DataFrame:
    """(year, month) histogram of each user's FIRST post — reference
    ``queries.py:214-244``: min posted timestamp per owner, then count by
    its year/month."""
    first = (
        df.filter(F.col("datePosted").isNotNull())
        .groupBy(F.col("owner.id").alias("owner_id"))
        .agg(F.min("datePosted").alias("first_post_ts"))
    )
    return (
        first.groupBy(
            F.year("first_post_ts").alias("year"),
            F.month("first_post_ts").alias("month"),
        )
        .agg(F.count("*").alias("count"))
        .orderBy("year", "month")
    )


def calculate_views_stats(df: DataFrame) -> DataFrame:
    """Mean + approximate median of views — reference ``queries.py:246-255``.
    ``percentile_approx`` is the 100 TB-safe choice (sketch, single pass)."""
    return df.select(
        F.avg("views").alias("average_views"),
        F.percentile_approx("views", 0.5).alias("median_views"),
    )


def calculate_comments_stats(df: DataFrame) -> DataFrame:
    """Reference ``queries.py:257-266``."""
    return df.select(
        F.avg("comments").alias("average_comments"),
        F.percentile_approx("comments", 0.5).alias("median_comments"),
    )


def count_user(df: DataFrame) -> DataFrame:
    """Distinct owner count — reference ``queries.py:289-295`` runs
    ``.distinct().count()`` (two jobs, returns an int that route B4 then
    mis-collects); one countDistinct aggregate, returned as a DataFrame."""
    return df.select(F.countDistinct("owner.id").alias("count"))


# -- tags / search ----------------------------------------------------------


def get_photos_by_tag(df: DataFrame, tag: str) -> DataFrame:
    """Photos carrying an exact tag — reference ``queries.py:61-71``
    explodes and returns one DUPLICATE row per matching tag (bug B10); the
    intent is match-then-return-photos: ``array_contains``, no explode, no
    duplication, and the filter stays codegen-able."""
    return df.filter(
        F.col("tags").isNotNull()
        & (F.size("tags") > 0)
        & F.array_contains(F.col("tags.value"), tag)
    )


def get_top_tags(df: DataFrame, limit: int | None = None) -> DataFrame:
    """Tag frequency ranking — reference ``queries.py:278-287``. Explode is
    correct here (one count contribution per occurrence). At 100 TB the
    groupBy on skewed tag values relies on partial aggregation + AQE skew
    splitting, both on by default."""
    out = (
        df.withColumn("tagValue", F.explode(F.col("tags.value")))
        .groupBy("tagValue")
        .agg(F.count("id").alias("count"))
        .orderBy(F.desc("count"), "tagValue")
    )
    return out.limit(limit) if limit else out


def search_photos(
    df: DataFrame,
    keyword: str | None = None,
    data_inizio: str | None = None,
    data_fine: str | None = None,
    tag_list: list[str] | None = None,
) -> DataFrame:
    """Parameterized search — reference ``queries.py:367-439``. The plan
    shape depends on which params are present (SURVEY §3.2), exactly like
    the reference, minus its defects:

    - keyword branch: the reference explodes tags then ORs ``contains`` over
      title/description/tag/username — but ``description`` doesn't exist in
      its schema (latent analysis error) and the explode duplicates rows
      before the later dedup. Here: ``exists`` higher-order predicate over
      tags (no explode), keyword over title/username.
    - date branch: reference compares raw strings (``queries.py:389-397``);
      here timestamps.
    - tag branch: explode+isin → ``exists`` with lowercase match.
    - URL UDF F1 → ``format_string`` (codegen-able).
    - union+distinct then ``dropDuplicates(["id"])`` kept (U1 semantics).
    """
    filtered = df
    if keyword:
        kw = keyword.lower()
        tag_hit = F.exists(
            F.col("tags"), lambda t: F.lower(t["value"]).contains(kw)
        )
        filtered = filtered.filter(
            F.lower(F.col("title")).contains(kw)
            | tag_hit
            | F.lower(F.col("owner.username")).contains(kw)
        )
    if data_inizio:
        filtered = filtered.filter(
            F.col("datePosted") >= F.lit(data_inizio).cast("timestamp")
        )
    if data_fine:
        filtered = filtered.filter(
            F.col("datePosted") <= F.lit(data_fine).cast("timestamp")
        )
    if tag_list:
        tags_lower = [t.lower() for t in tag_list]
        tag_match = F.exists(
            F.col("tags"),
            lambda t: F.lower(t["value"]).isin(tags_lower),
        )
        by_tags = df.filter(tag_match)
        filtered = (
            filtered.unionByName(by_tags).distinct() if keyword else by_tags
        )
    deduped = filtered.dropDuplicates(["id"])
    return deduped.select(
        photo_url(F.col("farm"), F.col("server"), F.col("id"), F.col("secret")).alias("url"),
        F.col("owner.username").alias("username"),
        F.col("tags.value").alias("tags"),
        F.col("views").alias("views"),
        F.col("title").alias("title"),
        F.date_format("dateTaken", "HH:mm - dd/MM/yyyy").alias("dateTaken"),
        F.date_format("datePosted", "HH:mm - dd/MM/yyyy").alias("datePosted"),
    )


# -- owners -----------------------------------------------------------------


def search_owner(df: DataFrame, username: str | None = None) -> DataFrame:
    """Owner profile ranking — reference ``queries.py:298-351``: per-owner
    totals + argmax photo by (views, comments) via max-of-struct, globally
    ranked by total views, THEN filtered by username (global rank preserved
    — B9's arguably-intended semantics, kept). The per-row avatar HTTP UDF
    (F2, ``queries.py:349`` + ``flickrapi_utils.py:7-25``) becomes a pure
    column expression over the precomputed ``owner.iconFarm/iconServer``
    fields (constant per owner, carried through the hash agg with ``max``);
    the URL UDF (F1) is ``format_string``. The global rank window runs over
    one row per owner (bounded pre-aggregated input), the only safe shape."""
    totals = argmax_per_group(
        df.withColumn("owner_id", F.col("owner.id")).withColumn(
            "owner_username", F.col("owner.username")
        ),
        group_by=["owner_id", "owner_username"],
        order_cols=[
            F.coalesce(F.col("views"), F.lit(0)),
            F.coalesce(F.col("comments"), F.lit(0)),
            # explicit id tie-break: without it max-of-struct would fall
            # through to the remaining struct fields and break (views,
            # comments) ties lexicographically on the URL STRING, while the
            # oracles' rn=1 window orders by id DESC — a latent winner-row
            # divergence (photo_plans.py's twin already carries it)
            F.col("id"),
        ],
        payload={
            "most_viewed_photo_views": F.coalesce(F.col("views"), F.lit(0)),
            "most_viewed_photo_comments": F.coalesce(F.col("comments"), F.lit(0)),
            "best_photo_url": photo_url(
                F.col("farm"), F.col("server"), F.col("id"), F.col("secret")
            ),
            # icon fields ride the argmax struct: winner-row semantics, so a
            # null/inconsistent icon on a non-winner row can never leak in
            # (still one hash aggregate, no extra shuffle, no HTTP)
            "_icon_farm": F.col("owner.iconFarm"),
            "_icon_server": F.col("owner.iconServer"),
        },
        extra_aggs={
            "total_views": F.sum(F.coalesce(F.col("views"), F.lit(0))),
            "total_comments": F.sum(F.coalesce(F.col("comments"), F.lit(0))),
            "total_photos": F.count("id"),
        },
    )
    ranked = global_rank(
        totals, [F.desc("total_views"), F.col("owner_id")], rank_col="rank"
    ).select(
        # int for schema parity with the reference's row_number idiom —
        # safe here: the frame is owner-cardinality, not entity-cardinality.
        F.col("rank").cast("int").alias("rank"),
        F.col("owner_id").alias("user_id"),
        F.col("owner_username").alias("username"),
        "total_photos",
        "total_comments",
        "most_viewed_photo_views",
        "most_viewed_photo_comments",
        "best_photo_url",
        "total_views",
        avatar_url(
            F.col("owner_id"), F.col("_icon_farm"), F.col("_icon_server")
        ).alias("avatar_url"),
    )
    if username:
        ranked = ranked.filter(
            F.lower(F.col("username")).contains(username.lower())
        )
    return ranked


def top_50_owners(df: DataFrame) -> DataFrame:
    """Top 50 owners by total views — reference ``queries.py:354-364``.
    ``orderBy().limit()`` plans TakeOrderedAndProject (no global sort)."""
    return (
        df.groupBy(F.col("owner.username").alias("username"))
        .agg(F.sum("views").alias("total_views"))
        .orderBy(F.desc("total_views"), "username")
        .limit(50)
    )


# -- cameras ----------------------------------------------------------------


def _camera_base(df: DataFrame) -> DataFrame:
    """Camera rows with B5 FIXED: the reference builds a sentinel filter
    then overwrites it with a fresh isNotNull filter (``queries.py:451-457``,
    ``:491-499``), so sentinel rows leak into rankings. Intent: exclude."""
    return (
        df.withColumn("make", F.col("camera_info.make"))
        .withColumn("model", F.col("camera_info.model"))
        .filter(
            F.col("make").isNotNull()
            & F.col("model").isNotNull()
            & (F.col("make") != CAMERA_MAKE_SENTINEL)
            & (F.col("model") != CAMERA_MODEL_SENTINEL)
        )
    )


def top_brands_with_models(df: DataFrame) -> DataFrame:
    """Top-5 brands and each brand's top-5 models — reference
    ``queries.py:442-476``: two-level agg (A11), broadcast join against the
    ≤5-row brand list (J1), per-brand top-k window (W3)."""
    counts = _camera_base(df).groupBy("make", "model").agg(
        F.count("*").alias("count")
    )
    top_brands = (
        counts.groupBy("make")
        .agg(F.sum("count").alias("total_count"))
        .orderBy(F.desc("total_count"), "make")
        .limit(5)
    )
    joined = counts.join(F.broadcast(top_brands.select("make")), "make", "inner")
    return (
        topk_per_group(
            joined,
            partition_by=["make"],
            order_by=[F.desc("count"), "model"],
            k=5,
            rank_col="rank",
        )
        .select("make", "model", "count")
        .orderBy("make", F.desc("count"), "model")
    )


def top_models_per_year(df: DataFrame) -> DataFrame:
    """Top-5 camera models per posting year — reference
    ``queries.py:484-516`` (B5 fixed via ``_camera_base``)."""
    base = _camera_base(df).filter(F.col("datePosted").isNotNull())
    counts = base.groupBy(
        F.year("datePosted").alias("year"), "make", "model"
    ).agg(F.count("*").alias("count"))
    return (
        topk_per_group(
            counts,
            partition_by=["year"],
            order_by=[F.desc("count"), "make", "model"],
            k=5,
            rank_col="rank",
        )
        .select("year", "make", "model", "count")
        .orderBy("year", F.desc("count"), "make", "model")
    )
