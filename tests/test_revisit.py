"""Conditional revisit / recrawl end-to-end against a local in-process HTTP
server that implements real ETag / Last-Modified validation (RFC 9110 §13):
cycle 1 captures validators, the server changes ONE page, cycle 2 refetches
conditionally — unchanged pages come back 304 body-less, the changed page
transfers, and the unchanged set exports as WARC 1.1 ``revisit`` records
with the server-not-modified profile."""

from __future__ import annotations

import gzip
import hashlib
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

import ray.data as rd

from monocator_ray.crawl.revisit import (
    conditional_refetch,
    export_warc_revisits,
    split_revisit,
    validators_from_fetch,
)
from monocator_ray.stages.fetch import ConditionalFetcher


class _Site:
    """Mutable page store the handler serves with validation."""

    def __init__(self):
        self.lock = threading.Lock()
        self.pages: dict[str, tuple[bytes, str | None, str | None]] = {}
        self.conditional_hits = 0
        self.full_bodies_sent = 0

    def put(self, path, body, etag=None, last_modified=None):
        with self.lock:
            self.pages[path] = (body, etag, last_modified)


def _make_handler(site: _Site):
    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            with site.lock:
                entry = site.pages.get(self.path)
            if entry is None:
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body, etag, lm = entry
            inm = self.headers.get("If-None-Match")
            ims = self.headers.get("If-Modified-Since")
            if inm or ims:
                with site.lock:
                    site.conditional_hits += 1
            # §13.1.3 evaluation order: If-None-Match wins when present
            not_modified = (
                (inm is not None and etag is not None and inm == etag)
                or (inm is None and ims is not None and lm is not None
                    and ims == lm)
            )
            if not_modified:
                self.send_response(304)
                if etag:
                    self.send_header("ETag", etag)
                self.end_headers()
                return
            with site.lock:
                site.full_bodies_sent += 1
            self.send_response(200)
            if etag:
                self.send_header("ETag", etag)
            if lm:
                self.send_header("Last-Modified", lm)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return H


@pytest.fixture()
def site_server():
    site = _Site()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(site))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield site, f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _fetch_table(base, paths):
    return pa.table({"url": pa.array([base + p for p in paths])})


def test_revisit_cycle(site_server, ray_session, tmp_path):
    site, base = site_server
    site.put("/p1", b"<html>one</html>", etag='"v1-p1"')
    site.put("/p2", b"<html>two</html>", etag='"v1-p2"')
    site.put("/p3", b"<html>three</html>", etag='"v1-p3"')
    # Last-Modified only (no ETag) -> If-Modified-Since path
    site.put("/p4", b"<html>four</html>",
             last_modified="Tue, 01 Apr 2025 00:00:00 GMT")

    fetcher = ConditionalFetcher(allow_network=True, timeout_s=5.0)

    # ---- cycle 1: unconditional (no validator columns) ----
    out1 = fetcher(_fetch_table(base, ["/p1", "/p2", "/p3", "/p4"]))
    assert out1["fetch_status"].to_pylist() == [200, 200, 200, 200]
    assert site.conditional_hits == 0
    from monocator_ray.stages.grouped import collect_arrow

    vt = collect_arrow(validators_from_fetch(rd.from_arrow(out1)))
    vt = vt.sort_by("url")
    assert vt.num_rows == 4  # every row had a validator

    # ---- the site changes one page ----
    site.put("/p2", b"<html>two CHANGED</html>", etag='"v2-p2"')

    # ---- cycle 2: conditional over the validator artifact ----
    bodies_before = site.full_bodies_sent
    out2 = fetcher(vt.select(["url", "etag", "last_modified"]))
    by_url = dict(zip(out2["url"].to_pylist(),
                      out2["fetch_status"].to_pylist()))
    assert by_url[base + "/p1"] == 304
    assert by_url[base + "/p2"] == 200
    assert by_url[base + "/p3"] == 304
    assert by_url[base + "/p4"] == 304  # If-Modified-Since path
    assert site.full_bodies_sent - bodies_before == 1  # only p2 transferred
    assert site.conditional_hits == 4
    html_by_url = dict(zip(out2["url"].to_pylist(), out2["html"].to_pylist()))
    assert html_by_url[base + "/p2"] == b"<html>two CHANGED</html>"
    assert html_by_url[base + "/p1"] is None
    # 304 carries validators forward; 200 carries the NEW etag
    etag_by_url = dict(zip(out2["url"].to_pylist(), out2["etag"].to_pylist()))
    assert etag_by_url[base + "/p2"] == '"v2-p2"'
    assert etag_by_url[base + "/p1"] == '"v1-p1"'

    # ---- split + WARC revisit export ----
    annotated = rd.from_arrow(out2)
    changed, log = split_revisit(annotated)
    changed_urls = [r["url"] for r in changed.take_all()]
    assert changed_urls == [base + "/p2"]
    log_rows = {r["url"]: r["not_modified"] for r in log.take_all()}
    assert log_rows[base + "/p1"] is True and log_rows[base + "/p2"] is False

    manifest = export_warc_revisits(
        annotated, rd.from_arrow(vt), str(tmp_path / "rv")).materialize()
    n = sum(r["n_records"] for r in manifest.take_all())
    assert n == 3
    files = list((tmp_path / "rv").glob("revisit-*.warc.gz"))
    assert files
    text = b"".join(gzip.decompress(f.read_bytes()) for f in files).decode()
    assert text.count("WARC-Type: revisit") == 3
    assert "server-not-modified" in text
    # WARC 1.1 §5.2: every record carries a mandatory WARC-Record-ID,
    # deterministic (uuid5 over url+date) and unique per record
    import re

    rids = re.findall(r"WARC-Record-ID: <urn:uuid:([0-9a-f-]{36})>", text)
    assert len(rids) == 3 and len(set(rids)) == 3
    # digest of the PRIOR capture rides along for replay resolution
    sha1_p1 = hashlib.sha256(b"<html>one</html>").hexdigest()
    assert f"WARC-Payload-Digest: sha256:{sha1_p1}" in text


def test_pipeline_shapes_with_ray(site_server, ray_session):
    """conditional_refetch drives the actor-pool stage over a VALIDATORS
    Dataset (the streaming recrawl shape)."""
    site, base = site_server
    for i in range(8):
        site.put(f"/d{i}", f"<html>{i}</html>".encode(), etag=f'"e{i}"')
    fetcher = ConditionalFetcher(allow_network=True, timeout_s=5.0)
    first = fetcher(_fetch_table(base, [f"/d{i}" for i in range(8)]))
    vt = pa.table({
        "url": first["url"],
        "etag": first["etag"],
        "last_modified": first["last_modified"],
        "payload_sha256": pa.array([None] * 8, pa.string()),
    })
    site.put("/d3", b"<html>3 new</html>", etag='"e3b"')
    annotated = conditional_refetch(
        rd.from_arrow(vt),
        ConditionalFetcher,
        {"allow_network": True, "timeout_s": 5.0},
        concurrency=1,
        batch_size=4,
    )
    changed, log = split_revisit(annotated)
    assert [r["url"] for r in changed.take_all()] == [base + "/d3"]
    stats = {}
    for r in log.take_all():
        stats[r["url"]] = r["fetch_status"]
    assert sum(1 for s in stats.values() if s == 304) == 7
