"""Photo-domain parity tests: fixture photos → every endpoint-semantics
function, hand-computed goldens. Covers the §2.13 bug-fix semantics
(B1/B5/B8/B10) explicitly."""

from __future__ import annotations

import pytest

from backend_big_data_spark.photo import api
from backend_big_data_spark.photo import queries as q
from backend_big_data_spark.photo.schema import (
    MONUMENTS_SCHEMA,
    PHOTO_SCHEMA_RAW,
    ingest,
)


def _photo(
    pid,
    owner_id="u1",
    username="alice",
    posted="2021-03-05T10:30:00.000+00:00",
    taken="2021-03-05T08:00:00.000+00:00",
    views=10,
    comments=1,
    tags=("rome",),
    lat=41.9,
    lon=12.5,
    accuracy=16,
    pro=False,
    make="Canon",
    model="EOS",
    title="a roman holiday",
):
    return {
        "camera_info": {"make": make, "model": model},
        "comments": comments,
        "datePosted": posted,
        "dateTaken": taken,
        "farm": "9",
        "geoData": {"accuracy": accuracy, "latitude": lat, "longitude": lon},
        "id": pid,
        "owner": {"id": owner_id, "pro": pro, "username": username},
        "secret": "s",
        "server": "srv",
        "tags": [{"count": 1, "value": t} for t in tags],
        "title": title,
        "views": views,
    }


@pytest.fixture(scope="module")
def photos(spark):
    rows = [
        _photo("p01", views=100, comments=5, tags=("rome", "sunset")),
        _photo("p02", views=50, comments=9, tags=("rome",),
               posted="2021-07-01T22:10:00.000+00:00",
               taken="2021-06-30T23:55:00.000+00:00"),
        _photo("p03", owner_id="u2", username="bob", pro=True, views=200,
               comments=2, tags=("sunset",), make="Nikon", model="D500",
               lat=45.46, lon=9.19,
               posted="2022-01-15T10:00:00.000+00:00",
               taken="2022-01-15T09:00:00.000+00:00", title="bright sunset"),
        _photo("p04", owner_id="u2", username="bob", pro=True, views=None,
               comments=None, tags=(), make=q.CAMERA_MAKE_SENTINEL,
               model=q.CAMERA_MODEL_SENTINEL, lat=45.47, lon=9.20,
               posted="2022-02-01T01:00:00.000+00:00",
               taken="2022-01-31T23:00:00.000+00:00", title="no camera"),
        _photo("p05", owner_id="u3", username="carla", views=75, comments=0,
               tags=("rome", "colosseo"), make="Canon", model="R5",
               posted="2022-02-02T01:30:00.000+00:00",
               taken="2021-12-25T12:00:00.000+00:00", title="colosseo!"),
    ]
    df = spark.createDataFrame(rows, PHOTO_SCHEMA_RAW)
    return ingest(df).cache()


def test_get_years(photos):
    assert [r["year"] for r in api.years(photos)] == [2021, 2022]


def test_photo_count_posted_shapes(photos):
    out = api.photo_count_posted(photos)
    assert ["Marzo", 1] in out["month_data"]  # month names italianized
    assert {"year": 2021, "count": 2} in out["year_data"]
    assert {"year": 2022, "count": 3} in out["year_data"]


def test_photo_posted_per_month_by_year_taken_fixes_b1(photos):
    # p05 TAKEN 2021-12 but POSTED 2022-02: the reference (bug B1) would
    # count it under month(datePosted)=2; the intent counts taken-month 12.
    out = api.photo_posted_per_month_by_year(photos, 2021, "taken")
    by_name = {r["month"]: r["count"] for r in out}
    assert by_name["Dicembre"] == 1 and by_name["Febbraio"] == 0
    assert len(out) == 12  # zero-filled

def test_photos_by_tag_no_duplication_b10(photos):
    # p01 has two tags; reference's explode (B10) would duplicate the row
    # when filtering a shared value. Exact-match, one row per photo:
    ids = sorted(r.id for r in q.get_photos_by_tag(photos, "rome").collect())
    assert ids == ["p01", "p02", "p05"]


def test_top_tags(photos):
    top = api.top_tags(photos, page=1, page_size=3)
    assert top[0] == {"tagValue": "rome", "count": 3}


def test_pro_distribution_b8_both_semantics(photos):
    photo_counts = {r["pro"]: r["count"] for r in api.pro_users_distribution(photos)}
    assert photo_counts == {True: 2, False: 3}  # photos, not users (B8 kept)
    user_counts = {
        r.pro: r["count"]
        for r in q.pro_user_distribution_distinct(photos).collect()
    }
    assert user_counts == {True: 1, False: 2}  # the docstring's intent


def test_average_time_to_post(photos):
    # minutes: p01 150, p02 1335, p03 60, p04 120, p05 38d13.5h = 55530
    out = api.average_time_to_post(photos)
    expected = (150 + 1335 + 60 + 120 + 55530) / 5
    assert abs(out["averageTimeToPostMinutes"] - expected) < 0.01


def test_first_post_per_year_regroup(photos):
    out = {d["year"]: d["months"] for d in api.first_post_per_year(photos)}
    # first posts: u1 2021-03, u2 2022-01, u3 2022-02
    assert out[2021] == [{"month": 3, "count": 1}]
    assert sorted(out[2022], key=lambda m: m["month"]) == [
        {"month": 1, "count": 1},
        {"month": 2, "count": 1},
    ]


def test_count_users_b4(photos):
    assert api.count_users(photos) == {"count": 3}


def test_search_owner_global_rank_b9(photos):
    # total views: bob 200, alice 150, carla 75 → bob rank 1
    rows = api.search_owner(photos, "bob")
    assert len(rows) == 1 and rows[0]["rank"] == 1
    assert rows[0]["total_photos"] == 2
    assert rows[0]["most_viewed_photo_views"] == 200
    assert rows[0]["best_photo_url"].endswith("/srv/p03_s.jpg")
    # F2 parity: no icon fields in the fixture → reference's default icon
    # (flickrapi_utils.py:23 fallback)
    from backend_big_data_spark.functions.scalars import DEFAULT_AVATAR

    assert rows[0]["avatar_url"] == DEFAULT_AVATAR
    # filtering AFTER ranking: carla keeps her global rank 3
    assert api.search_owner(photos, "carla")[0]["rank"] == 3


def test_search_owner_avatar_from_icon_fields(spark):
    # F2 parity with icon fields present: buddyicon URL formatted from the
    # precomputed owner.iconFarm/iconServer (flickrapi_utils.py:21-22 shape).
    row = _photo("p10", owner_id="u9", username="dana", views=5)
    row["owner"]["iconFarm"] = 4
    row["owner"]["iconServer"] = 388
    df = ingest(spark.createDataFrame([row], PHOTO_SCHEMA_RAW))
    out = api.search_owner(df, "dana")
    assert out[0]["avatar_url"] == (
        "https://farm4.staticflickr.com/388/buddyicons/u9.jpg"
    )


def test_top50_owners(photos):
    rows = api.top50_owners(photos)
    assert rows[0] == {"username": "bob", "total_views": 200}


def test_search_photos_branches(photos):
    # keyword hits title (p03 'bright sunset') and tag (p01 'sunset')
    got = {r["title"] for r in api.search_photos(photos, keyword="sunset")}
    assert got == {"a roman holiday", "bright sunset"}
    # date range only
    got = api.search_photos(photos, data_inizio="2022-01-01 00:00:00")
    assert len(got) == 3
    # tag list unioned with keyword
    got = api.search_photos(photos, keyword="colosseo", tag_list=["sunset"])
    assert {r["title"] for r in got} == {
        "colosseo!", "a roman holiday", "bright sunset",
    }
    # formatted dates, reference format
    one = api.search_photos(photos, keyword="roman")[0]
    assert one["datePosted"] == "10:30 - 05/03/2021"


def test_cameras_exclude_sentinels_b5(photos):
    brands = api.top_brand_and_cameras(photos)
    assert all(r["make"] != q.CAMERA_MAKE_SENTINEL for r in brands)
    assert {(r["make"], r["model"]) for r in brands} == {
        ("Canon", "EOS"), ("Canon", "R5"), ("Nikon", "D500"),
    }
    per_year = api.top_cameras_per_year(photos)
    assert all(r["make"] != q.CAMERA_MAKE_SENTINEL for r in per_year)
    y2022 = [r for r in per_year if r["year"] == 2022]
    assert {(r["make"], r["model"]) for r in y2022} == {
        ("Nikon", "D500"), ("Canon", "R5"),
    }


def test_kmeans_and_monument_distances(spark, photos):
    monuments = spark.createDataFrame(
        [("Colosseo", 41.8902, 12.4922), ("Duomo", 45.4642, 9.1900)],
        MONUMENTS_SCHEMA,
    )
    out = api.run_kmeans2(photos, monuments, k=2)
    assert len(out["centroids"]) == 2
    assert len(out["distanze"]) == 4  # 2 centroids × 2 monuments
    # fixture has a Rome blob and a Milan blob: each monument is ~0 km from
    # one centroid and hundreds of km from the other
    for monument in ("Colosseo", "Duomo"):
        ds = sorted(
            d["distance_km"] for d in out["distanze"] if d["monument"] == monument
        )
        assert ds[0] < 50 < 400 < ds[1]


def test_tag_association_rules(photos):
    rules = api.tag_association_rules(photos, 0.2, 0.5)
    as_pairs = {
        (tuple(r["antecedent"]), tuple(r["consequent"])): r["confidence"]
        for r in rules
    }
    # colosseo appears once, always with rome → confidence 1.0
    assert as_pairs[(("colosseo",), ("rome",))] == 1.0


def test_paginate_photos_stable(photos):
    p1 = q.paginate_photos(photos, 1, 2).collect()
    p2 = q.paginate_photos(photos, 2, 2).collect()
    p3 = q.paginate_photos(photos, 3, 2).collect()
    ids = [r.id for r in p1 + p2 + p3]
    assert ids == ["p01", "p02", "p03", "p04", "p05"]  # exact partition
