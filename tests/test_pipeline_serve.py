"""Pipeline-operations WSGI serving (serving/pipeline_serve.py): route
contracts over the real sf0.001 tables, row-cap enforcement before
collect, introspection, and the error envelope."""

from __future__ import annotations

import io
import json

import pytest

from backend_big_data_spark.serving.pipeline_serve import (
    MAX_ROWS,
    create_pipeline_app,
)
from tests.conftest import SF_SMALL


def _call(app, path, qs=""):
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    environ = {"PATH_INFO": path, "QUERY_STRING": qs,
               "wsgi.input": io.BytesIO(b"")}
    chunks = app(environ, start_response)
    return captured["status"], json.loads(b"".join(chunks)), captured["headers"]


@pytest.fixture(scope="module")
def app(spark):
    # doc_langid opted in explicitly: the generic route is allowlist-only
    return create_pipeline_app(spark, SF_SMALL, extra_allowed={"doc_langid"})


@pytest.mark.slow
def test_named_operational_routes(app):
    status, payload, _ = _call(app, "/ops/sourceDupStats")
    assert status == "200 OK"
    assert payload and {"source", "n_docs"} <= set(payload[0])

    status, payload, _ = _call(app, "/ops/embeddingHealth")
    assert status == "200 OK"
    assert len(payload) == 1  # one-row readout

    status, payload, _ = _call(app, "/ops/hllErrorBand")
    assert status == "200 OK"
    assert all(r["within_band"] for r in payload)

    status, payload, _ = _call(app, "/ops/qualityCalibration")
    assert status == "200 OK"
    assert payload and {"source", "threshold_bucket", "kept_rate_fp"} <= set(
        payload[0]
    )

    status, payload, _ = _call(app, "/ops/quantileSketchBand")
    assert status == "200 OK"
    assert all(r["p50_within_band"] and r["p90_within_band"] for r in payload)

    status, payload, _ = _call(app, "/ops/datasheet")
    assert status == "200 OK"
    assert len(payload) == 1 and payload[0]["n_docs"] > 0
    assert {"total_tokens", "exact_dup_ppm", "mean_ttr_fp"} <= set(payload[0])

    status, payload, _ = _call(app, "/ops/leakageSafeSplit")
    assert status == "200 OK"
    assert {r["split"] for r in payload} == {"train", "val", "test"}
    assert all(r["cross_split_near_pairs"] == 0 for r in payload)

    status, payload, _ = _call(app, "/ops/communityModularity")
    assert status == "200 OK"
    assert payload and {"community", "n_nodes", "contrib_fp"} <= set(payload[0])

    status, payload, _ = _call(app, "/ops/tokenizerFertility")
    assert status == "200 OK"
    assert payload and {"len_bucket", "bpe_chars_per_tok_mil",
                        "uni_chars_per_tok_mil"} <= set(payload[0])


def test_introspection_lists_registry(app):
    status, entries, _ = _call(app, "/ops/queries")
    assert status == "200 OK"
    by = {e["name"]: e["servable"] for e in entries}
    assert by["doc_removal_audit"] and by["ann_recall_eval"]  # dashboards
    assert by["doc_langid"]  # the fixture's explicit opt-in
    assert not by["doc_incremental_semdedup"]  # compute-heavy: flagged
    assert len(entries) >= 180


def test_generic_query_route_with_cap(app):
    status, payload, _ = _call(app, "/ops/query/doc_langid", qs="limit=7")
    assert status == "200 OK"
    assert len(payload) == 7
    # a limit beyond the ceiling clamps instead of collecting unboundedly
    status, payload, _ = _call(
        app, "/ops/query/doc_langid", qs=f"limit={MAX_ROWS * 100}"
    )
    assert status == "200 OK"
    assert len(payload) <= MAX_ROWS


def test_generic_route_rejects_non_allowlisted_query(app):
    """`limit` bounds collected rows, not compute — a registered but
    non-dashboard query (full incremental-SemDeDup pipeline) must be
    rejected on the generic route, not silently launched."""
    status, payload, _ = _call(app, "/ops/query/doc_incremental_semdedup")
    assert status == "403 Forbidden"
    assert "not servable" in payload["error"]
    assert "extra_allowed" in payload["error"]  # the opt-in is named


def test_unknown_routes_and_queries_404(app):
    status, payload, _ = _call(app, "/nope")
    assert status == "404 Not Found"
    status, payload, _ = _call(app, "/ops/query/definitely_not_registered")
    assert status == "404 Not Found"
    assert "definitely_not_registered" in payload["error"]


def test_gzip_negotiated_on_large_payload(app):
    captured = {}

    def start_response(status, headers):
        captured["status"] = status
        captured["headers"] = dict(headers)

    environ = {
        "PATH_INFO": "/ops/queries",
        "QUERY_STRING": "",
        "HTTP_ACCEPT_ENCODING": "gzip",
        "wsgi.input": io.BytesIO(b""),
    }
    chunks = app(environ, start_response)
    assert captured["headers"].get("Content-Encoding") == "gzip"
    import gzip as _gz

    assert json.loads(_gz.decompress(b"".join(chunks)))
