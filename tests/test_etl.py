"""ETL tests: cleaning chain semantics and mapInPandas enrichment."""

from __future__ import annotations

import pytest

from backend_big_data_spark.etl.cleaner import (
    clean_photos,
    fill_missing_camera_info,
    fill_null_comments,
    keep_posted_since_2000,
    null_sentinel_dates,
)
from backend_big_data_spark.etl.enrich import (
    DeterministicFakeFetcher,
    enrich_photos,
    http_fetcher,
)
from backend_big_data_spark.photo.schema import PHOTO_SCHEMA_RAW


def _raw(pid, posted, taken, comments=None, camera=None):
    return {
        "id": pid,
        "datePosted": posted,
        "dateTaken": taken,
        "comments": comments,
        "camera_info": camera,
        "owner": {"id": f"u_{pid}", "pro": None, "username": "x"},
        "farm": "9",
        "server": "srv",
        "secret": "s",
    }


@pytest.fixture()
def raw_photos(spark):
    rows = [
        _raw("a", "Jan 5, 2021 10:00:00 AM", "Jan 1, 0001 12:00:00 AM"),
        _raw("a", "Jan 5, 2021 10:00:00 AM", "Jan 1, 0001 12:00:00 AM"),  # dup
        _raw("b", "Mar 2, 1999 09:00:00 AM", "Feb 1, 2021 08:00:00 AM"),  # pre-2000
        _raw("c", "Jun 9, 2022 11:00:00 AM", "Jun 9, 2022 10:00:00 AM",
             comments=7, camera={"make": "Canon", "model": None}),
    ]
    return spark.createDataFrame(rows, PHOTO_SCHEMA_RAW)


def test_clean_photos_chain(raw_photos):
    out = clean_photos(raw_photos)
    rows = {r.id: r for r in out.collect()}
    assert set(rows) == {"a", "c"}          # dup removed, pre-2000 filtered
    assert rows["a"].dateTaken is None       # sentinel date nulled
    assert rows["a"].comments == 0           # null comments filled
    assert rows["c"].dateTaken is not None
    # partial camera_info → full sentinel struct
    assert rows["c"].camera_info.make == "Marca fotocamera non disponibile"
    assert rows["a"].camera_info.model == "Modello fotocamera non disponibile"


def test_clean_steps_are_independent(raw_photos):
    assert null_sentinel_dates(raw_photos).filter(
        "dateTaken IS NULL"
    ).count() == 2
    assert keep_posted_since_2000(raw_photos).count() == 3
    assert fill_null_comments(raw_photos).filter("comments = 0").count() == 3
    filled = fill_missing_camera_info(raw_photos)
    assert filled.filter("camera_info.make IS NOT NULL").count() == 4


def test_enrich_photos_rebuilds_fields(raw_photos):
    out = enrich_photos(raw_photos, DeterministicFakeFetcher)
    rows = {r.id: r for r in out.collect()}
    fake = DeterministicFakeFetcher()
    for pid, r in rows.items():
        comments, has_people, pro, make, model = fake(pid)
        assert r.comments == comments
        assert r.hasPeople == has_people
        assert r.owner.pro == pro                  # withField rebuild
        assert r.owner.username == "x"             # other owner fields kept
        assert (r.camera_info.make, r.camera_info.model) == (make, model)
    # idempotent job shape: same columns, same types (nullability of the
    # rebuilt camera_info struct container tightens, which is fine)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in raw_photos.schema.fields
    ]


def test_http_fetcher_is_stubbed():
    with pytest.raises(NotImplementedError):
        http_fetcher()
