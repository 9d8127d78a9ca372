"""HTTP serving layer — the reference's Flask app (``endpoints.py``,
``main.py:151-152``) as a dependency-free WSGI application (Flask is not
available in this container; WSGI is the stdlib-portable contract every
framework and server speaks).

Route table mirrors the reference's 27 endpoints 1:1, including query-
string / JSON-body parameter names (``page``, ``page_size``, ``year``,
``type``, ``k``, ``minSupport`` …) and the per-route error envelope
(``{"error": ...} / 500``). All query logic lives in ``photo.api``; this
module only parses parameters and serializes JSON — the reference's
layering, minus its route bugs (B2/B3/B4 fixed in ``photo.api``).

Run: ``wsgiref.simple_server.make_server("", 8080, create_app(df,
monuments)).serve_forever()`` — or hand ``create_app``'s return to any
WSGI server (gunicorn etc.).
"""

from __future__ import annotations

import gzip
import json
from collections.abc import Callable
from urllib.parse import parse_qs

from pyspark.sql import DataFrame

from backend_big_data_spark.photo import api


def _json_default(o):
    # timestamps and Rows stringify; keeps the envelope dependency-free
    return str(o)


#: Below this size gzip overhead beats the savings (flask-compress default
#: COMPRESS_MIN_SIZE is 500 bytes; same threshold kept).
_GZIP_MIN_BYTES = 500


def _negotiates_gzip(accept_encoding: str) -> bool:
    """True iff the client accepts gzip with a non-zero q-value. A bare
    substring test would gzip for ``gzip;q=0`` — a client explicitly
    REFUSING gzip; and the SPECIFIC ``gzip`` coding takes precedence over a
    ``*`` wildcard wherever each appears in the header, so
    ``*, gzip;q=0`` still refuses (RFC 9110 §12.5.3)."""

    def _q(params: str) -> float:
        params = params.strip()
        if params.startswith("q="):
            try:
                return float(params[2:])
            except ValueError:
                return 0.0
        return 1.0

    gzip_q: float | None = None
    star_q: float | None = None
    for part in accept_encoding.lower().split(","):
        coding, _, params = part.partition(";")
        coding = coding.strip()
        if coding == "gzip" and gzip_q is None:
            gzip_q = _q(params)
        elif coding == "*" and star_q is None:
            star_q = _q(params)
    if gzip_q is not None:
        return gzip_q > 0.0
    return star_q is not None and star_q > 0.0


def create_app(df: DataFrame, monuments: DataFrame | None = None) -> Callable:
    """Build the WSGI app closed over the photos DataFrame — the
    reference's ``create_app(df)`` shape (``endpoints.py:14``)."""

    def route(qs: dict, body: dict, path: str):
        def arg(name, default=None, cast=str):
            v = qs.get(name, [None])[0]
            return default if v is None else cast(v)

        page = arg("page", 1, int)
        page_size = arg("page_size", 20, int)
        if path == "/getFirstRows":
            return api.get_first_rows(df, arg("limit", 10, int))
        if path == "/photosByCoordinates":
            return api.photos_by_coordinates(df)
        if path == "/photosByTag":
            return api.photos_by_tag(df, arg("tag"), page, page_size)
        if path == "/photoCountPosted":
            return api.photo_count_posted(df)
        if path == "/photoCountTaken":
            return api.photo_count_taken(df)
        if path == "/photoCountHour":
            return api.photo_count_hour(df)
        if path == "/photoPostedPerMonthByYear":
            return api.photo_posted_per_month_by_year(
                df, arg("year", cast=int), arg("type", "posted")
            )
        if path == "/averageTimeToPost":
            return api.average_time_to_post(df)
        if path == "/countUsers":
            return api.count_users(df)
        if path == "/viewStats":
            return api.view_stats(df)
        if path == "/commentStats":
            return api.comment_stats(df)
        if path == "/avgViewsPerYear":
            return api.avg_views_per_year(df)
        if path == "/avgCommentsPerYear":
            return api.avg_comments_per_year(df)
        if path == "/firstPostPerYear":
            return api.first_post_per_year(df)
        if path == "/topTags":
            return api.top_tags(df, page, page_size)
        if path == "/proUsersDistribution":
            return api.pro_users_distribution(df)
        if path == "/accuracyDistribution":
            return api.accuracy_distribution(df)
        if path == "/searchOwner":
            return api.search_owner(df, arg("username"))
        if path == "/searchOwnerM":  # B3: alias of /searchOwner
            return api.search_owner_m(df, arg("username"))
        if path == "/top50Owners":
            return api.top50_owners(df)
        if path == "/getTopBrandAndCameras":
            return api.top_brand_and_cameras(df)
        if path == "/topCamerasPerYear":
            return api.top_cameras_per_year(df)
        if path == "/years":
            return api.years(df)
        if path == "/runKMeans":
            return api.run_kmeans(df, arg("k", 5, int))
        if path == "/runKMeans2":
            if monuments is None:
                raise ValueError("monuments table not configured")
            return api.run_kmeans2(df, monuments, arg("k", 5, int))
        if path == "/searchPhotos":  # POST, JSON body
            return api.search_photos(
                df,
                keyword=body.get("keyword"),
                data_inizio=body.get("dataInizio"),
                data_fine=body.get("dataFine"),
                tag_list=body.get("tag_list"),
                page=page,
                page_size=page_size,
            )
        if path == "/tagAssociationRules":  # POST, JSON body
            return api.tag_association_rules(
                df,
                min_support=float(body.get("minSupport", 0.01)),
                min_confidence=float(body.get("minConfidence", 0.2)),
                target_tags=body.get("target_tags"),
            )
        return None

    def app(environ, start_response):
        path = environ.get("PATH_INFO", "/")
        qs = parse_qs(environ.get("QUERY_STRING", ""))
        # gzip response compression — the reference serves through
        # flask-compress (``endpoints.py:17`` Compress(app)); here it's the
        # same negotiation done by hand: compress iff the client advertises
        # gzip with a non-zero q-value and the body clears a minimum size
        # (tiny payloads grow).
        accepts_gzip = _negotiates_gzip(environ.get("HTTP_ACCEPT_ENCODING", ""))

        def respond(status: str, payload: bytes):
            headers = [("Content-Type", "application/json")]
            if len(payload) >= _GZIP_MIN_BYTES:
                # compression is negotiable for this response — tell caches
                # (flask-compress emits the same Vary header)
                headers.append(("Vary", "Accept-Encoding"))
                if accepts_gzip:
                    payload = gzip.compress(payload, compresslevel=6)
                    headers.append(("Content-Encoding", "gzip"))
            headers.append(("Content-Length", str(len(payload))))
            start_response(status, headers)
            return [payload]

        body = {}
        try:
            length = int(environ.get("CONTENT_LENGTH") or 0)
            if length:
                body = json.loads(environ["wsgi.input"].read(length))
            result = route(qs, body, path)
            if result is None:
                return respond("404 Not Found", b'{"error": "no such route"}')
            payload = json.dumps(result, default=_json_default).encode()
            return respond("200 OK", payload)
        except Exception as e:  # the reference's per-route 500 envelope
            err = json.dumps({"error": str(e)}).encode()
            return respond("500 Internal Server Error", err)

    return app
