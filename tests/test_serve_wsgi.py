"""WSGI serving layer: invoke the app callable directly (no server) and
check route contracts, parameter parsing, and error envelope."""

from __future__ import annotations

import io
import json

import pytest

from backend_big_data_spark.photo.serve import create_app


def _call(app, path, qs="", body=None):
    status_headers = {}

    def start_response(status, headers):
        status_headers["status"] = status

    environ = {"PATH_INFO": path, "QUERY_STRING": qs}
    if body is not None:
        raw = json.dumps(body).encode()
        environ["CONTENT_LENGTH"] = str(len(raw))
        environ["wsgi.input"] = io.BytesIO(raw)
    chunks = app(environ, start_response)
    return status_headers["status"], json.loads(b"".join(chunks))


@pytest.fixture(scope="module")
def app(spark):
    from backend_big_data_spark.photo.schema import PHOTO_SCHEMA_RAW, ingest
    from tests.test_photo_domain import _photo

    df = ingest(
        spark.createDataFrame(
            [
                _photo("p01", views=100, tags=("rome", "sunset")),
                _photo("p02", owner_id="u2", username="bob", views=50,
                       tags=("city",),
                       posted="2022-07-01T22:10:00.000+00:00"),
            ],
            PHOTO_SCHEMA_RAW,
        )
    )
    return create_app(df)


def test_years_route(app):
    status, payload = _call(app, "/years")
    assert status == "200 OK"
    assert [r["year"] for r in payload] == [2021, 2022]


def test_query_params_parsed(app):
    status, payload = _call(app, "/photosByTag", qs="tag=rome&page=1&page_size=5")
    assert status == "200 OK"
    assert [r["id"] for r in payload] == ["p01"]
    status, payload = _call(app, "/photoPostedPerMonthByYear", qs="year=2021&type=posted")
    assert status == "200 OK"
    assert len(payload) == 12  # zero-filled with Italian names


def test_post_body_routes(app):
    status, payload = _call(app, "/searchPhotos", body={"keyword": "sunset"})
    assert status == "200 OK"
    assert len(payload) == 1 and payload[0]["username"] == "alice"


def test_count_users_b4_fixed(app):
    status, payload = _call(app, "/countUsers")
    assert status == "200 OK" and payload == {"count": 2}


def test_unknown_route_404(app):
    status, payload = _call(app, "/nope")
    assert status.startswith("404") and "error" in payload


def test_error_envelope_500(app):
    # /runKMeans2 without a monuments table → per-route 500 envelope
    status, payload = _call(app, "/runKMeans2", qs="k=2")
    assert status.startswith("500") and "monuments" in payload["error"]


def _call_raw(app, path, extra_environ=None):
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = headers

    environ = {"PATH_INFO": path, "QUERY_STRING": ""}
    environ.update(extra_environ or {})
    body = b"".join(app(environ, start_response))
    return captured["status"], captured["headers"], body


def test_gzip_round_trip_and_vary(app, monkeypatch):
    import gzip as gz

    import backend_big_data_spark.photo.serve as serve_mod

    monkeypatch.setattr(serve_mod, "_GZIP_MIN_BYTES", 10)
    status, headers, body = _call_raw(
        app, "/years", {"HTTP_ACCEPT_ENCODING": "gzip, deflate"}
    )
    assert status == "200 OK"
    assert ("Content-Encoding", "gzip") in headers
    # compression is negotiable → caches must key on Accept-Encoding
    assert ("Vary", "Accept-Encoding") in headers
    assert [r["year"] for r in json.loads(gz.decompress(body))] == [2021, 2022]


def test_gzip_refused_with_q_zero(app, monkeypatch):
    import backend_big_data_spark.photo.serve as serve_mod

    monkeypatch.setattr(serve_mod, "_GZIP_MIN_BYTES", 10)
    status, headers, body = _call_raw(
        app, "/years", {"HTTP_ACCEPT_ENCODING": "gzip;q=0"}
    )
    assert status == "200 OK"
    assert not any(k == "Content-Encoding" for k, _ in headers)
    assert ("Vary", "Accept-Encoding") in headers  # still negotiable
    json.loads(body)  # plain JSON


def test_gzip_skipped_below_min_size(app):
    status, headers, body = _call_raw(
        app, "/years", {"HTTP_ACCEPT_ENCODING": "gzip"}
    )
    assert not any(k == "Content-Encoding" for k, _ in headers)
    json.loads(body)


def test_accept_encoding_q_value_parsing():
    from backend_big_data_spark.photo.serve import _negotiates_gzip

    assert _negotiates_gzip("gzip")
    assert _negotiates_gzip("deflate, gzip;q=0.5")
    assert _negotiates_gzip("*")
    assert _negotiates_gzip("GZIP")
    assert not _negotiates_gzip("gzip;q=0")
    assert not _negotiates_gzip("gzip;q=0.0")
    assert not _negotiates_gzip("identity")
    assert not _negotiates_gzip("")
    assert not _negotiates_gzip("gzip;q=bogus")
    # RFC 9110: the specific coding's q-value wins over '*' regardless of
    # header order
    assert not _negotiates_gzip("*, gzip;q=0")
    assert not _negotiates_gzip("gzip;q=0, *")
    assert _negotiates_gzip("*;q=0, gzip")
    assert _negotiates_gzip("identity;q=0, *;q=0.1")
    assert not _negotiates_gzip("*;q=0")
    assert not _negotiates_gzip("deflate, identity")


class TestSearchPhotosPaginationContract:
    """`/searchPhotos` through the FULL WSGI layer must honor the same
    pagination property the oracle-gated `events_search_page` certifies
    for `operators/windows.paginate` (B6 fix): pages are bounded by
    page_size, keyed-ordered, disjoint, complete in sequence, and empty
    past the end — asserted on a corpus big enough to span pages."""

    @pytest.fixture(scope="class")
    def many_app(self, spark):
        from backend_big_data_spark.photo.schema import (
            PHOTO_SCHEMA_RAW,
            ingest,
        )
        from tests.test_photo_domain import _photo

        rows = [
            _photo(f"p{i:03d}", views=i, title="sunset over the forum")
            for i in range(25)
        ]
        df = ingest(spark.createDataFrame(rows, PHOTO_SCHEMA_RAW))
        return create_app(df)

    def test_page_bounds_disjoint_complete_ordered(self, many_app):
        pages = []
        for page in (1, 2, 3):
            status, payload = _call(
                many_app,
                "/searchPhotos",
                qs=f"page={page}&page_size=10",
                body={"keyword": "sunset"},
            )
            assert status == "200 OK"
            assert len(payload) <= 10, page  # bounded result per page
            pages.append([r["url"] for r in payload])
        assert [len(p) for p in pages] == [10, 10, 5]
        flat = [u for p in pages for u in p]
        # disjoint + complete + keyed order (the route paginates by url)
        assert flat == sorted(
            f"https://farm9.staticflickr.com/srv/p{i:03d}_s.jpg"
            for i in range(25)
        )
        # past the end: empty, still 200 (not an error envelope)
        status, payload = _call(
            many_app,
            "/searchPhotos",
            qs="page=4&page_size=10",
            body={"keyword": "sunset"},
        )
        assert status == "200 OK" and payload == []

    def test_filter_applies_before_pagination(self, many_app):
        """A keyword that matches nothing must yield an empty first page
        (the filter runs before the window, not on the page)."""
        status, payload = _call(
            many_app,
            "/searchPhotos",
            qs="page=1&page_size=10",
            body={"keyword": "nomatch-keyword"},
        )
        assert status == "200 OK" and payload == []
