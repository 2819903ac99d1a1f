"""Loopback test of the REST ingest/request server — wire-format
parity with aduana-server.py (POST /crawled, GET /request?n=)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request


def _post(base: str, payload: bytes):
    req = urllib.request.Request(
        f"{base}/crawled",
        data=payload,
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=30)


def test_rest_server_loopback(spark):
    from aduana_spark.server import server_from_settings

    srv = server_from_settings(
        spark, {"SEEDS": ["https://a.org/", "https://b.org/"], "DEFAULT_REQS": 5}
    )
    with srv:
        base = srv.url
        got = json.loads(urllib.request.urlopen(f"{base}/request?n=10", timeout=30).read())
        assert set(got) == {"https://a.org/", "https://b.org/"}

        payload = {
            "url": "https://a.org/",
            "score": 0.4,
            "links": [["https://a.org/deep", 0.7]],
            "content_hash": 27348276,
        }
        resp = _post(base, json.dumps(payload).encode())
        assert resp.status == 201
        got = json.loads(urllib.request.urlopen(f"{base}/request", timeout=30).read())
        assert got == ["https://a.org/deep"]

        # reference error strings on malformed input
        try:
            _post(base, b"{not json")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"could not parse JSON" in e.read()
        try:
            _post(base, json.dumps({"score": 1.0}).encode())
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b'"url" field' in e.read()
