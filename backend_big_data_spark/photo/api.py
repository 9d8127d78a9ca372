"""Serving layer — the reference's 27 HTTP endpoint semantics
(``endpoints.py``, SURVEY.md §2.12) as pure functions: DataFrame in, JSON-
serializable Python out. The observable contract includes the reference's
driver-side post-shaping (Italian month names, zero-filled months, per-year
regrouping, tuple-shaped coordinates), reproduced here; its route bugs
B2/B3/B4 (§2.13) are fixed. No HTTP framework dependency — any web layer
can wrap these one-liners (the reference's Flask app is exactly that).

Collection discipline: every function collects only BOUNDED results
(aggregates, explicit limits, or pages) — the reference's unbounded
``collect()`` routes (``endpoints.py:24,48``) are bounded here via
limit/pagination parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from backend_big_data_spark.photo import ml as photo_ml
from backend_big_data_spark.photo import queries as q

#: ``endpoints.py:7-11`` — month-number → Italian name mapping.
MAPPA_MESI = {
    1: "Gennaio", 2: "Febbraio", 3: "Marzo", 4: "Aprile",
    5: "Maggio", 6: "Giugno", 7: "Luglio", 8: "Agosto",
    9: "Settembre", 10: "Ottobre", 11: "Novembre", 12: "Dicembre",
}


def _rows(df: DataFrame) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


# -- raw rows / paging (endpoints.py:20-50, 321-341, 344-350) ---------------


def get_first_rows(df: DataFrame, limit: int = 10) -> list[dict]:
    """``/getFirstRows`` (``endpoints.py:20-24``)."""
    return _rows(q.get_first_n_rows(df, limit))


def photos_by_tag(
    df: DataFrame, tag: str, page: int = 1, page_size: int = 20
) -> list[dict]:
    """``/photosByTag`` (``endpoints.py:36-50``) — paginated (B6-fixed)."""
    return _rows(q.paginate_photos(q.get_photos_by_tag(df, tag), page, page_size))


def search_photos(
    df: DataFrame,
    keyword: str | None = None,
    data_inizio: str | None = None,
    data_fine: str | None = None,
    tag_list: list[str] | None = None,
    page: int = 1,
    page_size: int = 20,
) -> list[dict]:
    """``POST /searchPhotos`` (``endpoints.py:321-341``)."""
    found = q.search_photos(df, keyword, data_inizio, data_fine, tag_list)
    return _rows(q.paginate(found, ["url"], page=page, page_size=page_size))


def years(df: DataFrame) -> list[dict]:
    """``/years`` (``endpoints.py:344-350``)."""
    return _rows(q.get_years(df))


# -- histograms (endpoints.py:26-33, 52-123, 218-234) -----------------------


def photos_by_coordinates(df: DataFrame) -> list[list]:
    """``/photosByCoordinates`` (``endpoints.py:26-33``) — tuple-shaped
    triples to save response bytes, as the reference does."""
    return [
        [r["latitude"], r["longitude"], r["photoCount"]]
        for r in q.count_photos_by_coordinates(df).collect()
    ]


def _month_year_payload(month_df: DataFrame, year_df: DataFrame) -> dict:
    return {
        "month_data": [
            [MAPPA_MESI.get(r["month"]), r["count"]] for r in month_df.collect()
        ],
        "year_data": _rows(year_df),
    }


def photo_count_posted(df: DataFrame) -> dict:
    """``/photoCountPosted`` (``endpoints.py:52-65``) — Italian month names
    in month_data."""
    return _month_year_payload(
        q.photo_count_by_month_posted(df), q.photo_count_by_year_posted(df)
    )


def photo_count_taken(df: DataFrame) -> dict:
    """``/photoCountTaken`` (``endpoints.py:67-79``)."""
    return _month_year_payload(
        q.photo_count_by_month_taken(df), q.photo_count_by_year_taken(df)
    )


def photo_posted_per_month_by_year(
    df: DataFrame, input_year: int, input_type: str = "posted"
) -> list[dict]:
    """``/photoPostedPerMonthByYear`` (``endpoints.py:97-123``) with bug B2
    fixed (the taken branch called ``queries.queries...`` and assigned the
    wrong variable → NameError); missing months zero-filled 1-12 with
    Italian names, exactly the reference's shaping."""
    if input_type == "taken":
        result_df = q.photo_posted_per_month_by_year_taken(df, input_year)
    else:
        result_df = q.photo_posted_per_month_by_year_posted(df, input_year)
    by_month = {r["month"]: r["count"] for r in result_df.collect()}
    return [
        {"month": MAPPA_MESI[m], "count": by_month.get(m, 0)}
        for m in range(1, 13)
    ]


def photo_count_hour(df: DataFrame) -> dict:
    """``/photoCountHour`` (``endpoints.py:82-94``)."""
    return {
        "posted": _rows(q.count_photos_posted_per_hour(df)),
        "taken": _rows(q.count_photos_taken_per_hour(df)),
    }


def accuracy_distribution(df: DataFrame) -> list[dict]:
    """``/accuracyDistribution`` (``endpoints.py:228-234``)."""
    return _rows(q.calculate_accuracy_distribution(df))


def pro_users_distribution(df: DataFrame) -> list[dict]:
    """``/proUsersDistribution`` (``endpoints.py:218-225``) — B8: photo
    counts per pro flag (observable reference behavior)."""
    return _rows(q.calculate_pro_user_distribution(df))


# -- stats (endpoints.py:126-202) -------------------------------------------


def average_time_to_post(df: DataFrame) -> dict:
    """``/averageTimeToPost`` (``endpoints.py:126-132``)."""
    return q.calculate_average_time_to_post(df).collect()[0].asDict()


def view_stats(df: DataFrame) -> dict:
    """``/viewStats`` (``endpoints.py:143-149``)."""
    return q.calculate_views_stats(df).collect()[0].asDict()


def comment_stats(df: DataFrame) -> dict:
    """``/commentStats`` (``endpoints.py:151-157``)."""
    return q.calculate_comments_stats(df).collect()[0].asDict()


def avg_views_per_year(df: DataFrame) -> list[dict]:
    """``/avgViewsPerYear`` (``endpoints.py:160-166``)."""
    return _rows(q.calculate_views_by_year(df))


def avg_comments_per_year(df: DataFrame) -> list[dict]:
    """``/avgCommentsPerYear`` (``endpoints.py:168-174``)."""
    return _rows(q.calculate_comments_by_year(df))


def first_post_per_year(df: DataFrame) -> list[dict]:
    """``/firstPostPerYear`` (``endpoints.py:177-202``) — regrouped into
    ``{year, months: [{month, count}]}``, the reference's shape."""
    by_year: dict[int, list[dict]] = {}
    for r in q.first_post_per_year_month(df).collect():
        by_year.setdefault(r["year"], []).append(
            {"month": r["month"], "count": r["count"]}
        )
    return [{"year": y, "months": m} for y, m in by_year.items()]


def count_users(df: DataFrame) -> dict:
    """``/countUsers`` (``endpoints.py:134-140``) with bug B4 fixed (the
    reference calls ``.collect()`` on the int returned by ``count_user``)."""
    return {"count": q.count_user(df).collect()[0]["count"]}


# -- rankings (endpoints.py:206-269, 353-368) -------------------------------


def top_tags(df: DataFrame, page: int = 1, page_size: int = 20) -> list[dict]:
    """``/topTags`` (``endpoints.py:206-215``) — paginated."""
    ranked = q.get_top_tags(df)
    return _rows(
        q.paginate(ranked, [ranked["count"].desc(), "tagValue"], page, page_size)
    )


def search_owner(df: DataFrame, username: str | None = None) -> list[dict]:
    """``/searchOwner`` (``endpoints.py:237-246``). ``/searchOwnerM``
    (``endpoints.py:251-260``) called a nonexistent function (bug B3) —
    it aliases here."""
    return _rows(q.search_owner(df, username))


search_owner_m = search_owner  # B3 fix: alias of /searchOwner


def top50_owners(df: DataFrame) -> list[dict]:
    """``/top50Owners`` (``endpoints.py:263-269``)."""
    return _rows(q.top_50_owners(df))


def top_brand_and_cameras(df: DataFrame) -> list[dict]:
    """``/getTopBrandAndCameras`` (``endpoints.py:353-359``), B5 fixed."""
    return _rows(q.top_brands_with_models(df))


def top_cameras_per_year(df: DataFrame) -> list[dict]:
    """``/topCamerasPerYear`` (``endpoints.py:362-368``), B5 fixed."""
    return _rows(q.top_models_per_year(df))


# -- ML (endpoints.py:272-318) ----------------------------------------------


def run_kmeans(df: DataFrame, k: int = 5) -> dict:
    """``/runKMeans`` (``endpoints.py:272-283``) → {labels, centroids}."""
    labeled, centroids = photo_ml.run_kmeans_clustering(df, k)
    return {"labels": _rows(labeled), "centroids": _rows(centroids)}


def run_kmeans2(df: DataFrame, monuments: DataFrame, k: int = 5) -> dict:
    """``/runKMeans2`` (``endpoints.py:285-296``) → {labels, centroids,
    distanze} with monument distances via broadcast crossJoin instead of the
    reference's driver-side double loop (``mlqueries.py:120-137``)."""
    labeled, centroids = photo_ml.run_kmeans_clustering(df, k)
    distances = photo_ml.centroid_monument_distances(centroids, monuments)
    return {
        "labels": _rows(labeled),
        "centroids": _rows(centroids),
        "distanze": _rows(distances),
    }


def tag_association_rules(
    df: DataFrame,
    min_support: float = 0.01,
    min_confidence: float = 0.2,
    target_tags: list[str] | None = None,
) -> list[dict]:
    """``POST /tagAssociationRules`` (``endpoints.py:299-318``)."""
    return _rows(
        photo_ml.tag_association_rules(df, min_support, min_confidence, target_tags)
    )
