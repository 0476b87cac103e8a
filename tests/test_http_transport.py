"""End-to-end tests of the PRODUCTION HttpTransport (urllib request
building, param encoding, retry/backoff, JSON decode) against a local
HTTP server that replays each portal's wire protocol offline.

The FakePortal servers implement the portal SEMANTICS; these tests put
them behind a real socket so the full pickled-transport DataSource path —
driver plan → executor worker → HTTP GET → JSON — runs with the
production transport instead of the in-process FakeTransport."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from openpolicedata_spark.sources.portals.testing import FakePortal
from openpolicedata_spark.sources.portals.transport import (
    HttpTransport,
    RateLimitError,
    TransportError,
)
from openpolicedata_spark.sources.rest import RestLoader


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        params = {k: v[0] for k, v in
                  urllib.parse.parse_qs(parsed.query).items()}
        srv = self.server
        if srv.fail_remaining > 0:
            srv.fail_remaining -= 1
            self.send_response(srv.fail_code)
            self.end_headers()
            return
        try:
            out = srv.portal(parsed.path, params)
        except Exception as e:  # protocol bug → 500 with detail
            self.send_response(500)
            self.end_headers()
            self.wfile.write(str(e).encode())
            return
        body = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


def _serve(portal: FakePortal, fail_remaining: int = 0, fail_code: int = 503):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.portal = portal
    srv.fail_remaining = fail_remaining
    srv.fail_code = fail_code
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


PORTALS = [
    ("opd_socrata", "socrata", "", "abcd-1234"),
    ("opd_arcgis", "arcgis", "/FeatureServer/0", ""),
    ("opd_ckan", "ckan", "", "resource-1"),
    ("opd_carto", "carto", "", "incidents"),
    ("opd_ods", "ods", "", "incidents"),
]


@pytest.mark.parametrize("fmt,portal,path,ds", PORTALS)
def test_portal_over_real_http_transport(spark, fmt, portal, path, ds):
    """Full load + year filter for every portal through HttpTransport:
    the same assertions the FakeTransport tests make, but over a socket
    with production URL building and JSON handling."""
    date_text = "epoch_ms" if portal == "arcgis" else "iso"
    server = FakePortal(portal, date_text=date_text)
    srv, base = _serve(server)
    try:
        loader = RestLoader(
            spark, format_name=fmt, url=base + path, dataset=ds,
            date_field="incident_date", agency_field="agency",
            date_format=("epoch_ms" if date_text == "epoch_ms"
                         else "timestamp"),
            transport=HttpTransport(sleep_s=0.0, timeout_s=10),
        )
        df = loader.load()
        assert df.count() == len(server.rows)
        got = {r.case_id for r in df.select("case_id").collect()}
        assert got == {r["case_id"] for r in server.rows}
        import datetime as dt

        def _year(r):
            if date_text == "epoch_ms":
                return dt.datetime.utcfromtimestamp(
                    r["incident_date"] / 1000).year
            return int(str(r["incident_date"])[:4])

        expected = sum(1 for r in server.rows if _year(r) == 2020)
        assert loader.get_count(2020, force=True) == expected > 0
    finally:
        srv.shutdown()


def test_http_transport_retries_on_503(spark):
    """Two 503s then success: the transport's backoff loop must recover
    without surfacing an error (reference retries transient failures,
    arcgis_class.py:461-476)."""
    server = FakePortal("socrata")
    srv, base = _serve(server, fail_remaining=2)
    try:
        t = HttpTransport(sleep_s=0.0, backoff_s=0.01, timeout_s=10)
        out = t.get_json(f"{base}/resource/abcd-1234.json",
                         {"$select": "count(*)", "$where": None})
        assert out[0]["count"] == str(len(server.rows))
        assert srv.fail_remaining == 0
    finally:
        srv.shutdown()


def test_http_transport_rate_limit_exhaustion(spark):
    """Persistent 429 must raise RateLimitError (an
    OPD_TooManyRequestsError) after the retry budget."""
    server = FakePortal("socrata")
    srv, base = _serve(server, fail_remaining=99, fail_code=429)
    try:
        t = HttpTransport(sleep_s=0.0, backoff_s=0.01, retries=2, timeout_s=10)
        with pytest.raises(RateLimitError):
            t.get_json(f"{base}/resource/abcd-1234.json", {})
    finally:
        srv.shutdown()


def test_http_transport_hard_error_no_retry(spark):
    """A 404 is not transient: fail immediately (one request), as a
    TransportError."""
    server = FakePortal("socrata")
    srv, base = _serve(server, fail_remaining=1, fail_code=404)
    try:
        t = HttpTransport(sleep_s=0.0, backoff_s=0.01, timeout_s=10)
        with pytest.raises(TransportError):
            t.get_json(f"{base}/resource/abcd-1234.json", {})
        # only the first request failed; the budgeted retries were NOT spent
        assert srv.fail_remaining == 0
    finally:
        srv.shutdown()
