"""HttpFetcher end-to-end against local in-process HTTP servers — the
sandbox-safe analog of the reference's WireMock PageFetcherTest surface
(/root/reference/src/mock-servers.MD:1-4): concurrent per-host fan-out,
max-body truncation WITHOUT a Content-Length header, timeout capture, and
the redirect cap.  No outbound network: everything binds 127.0.0.1.
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pyarrow as pa
import pytest

from monocator_ray.stages.fetch import HttpFetcher


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.0"  # close-delimited bodies (no Content-Length)

    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        srv = self.server
        with srv.stats_lock:
            srv.concurrent += 1
            srv.max_concurrent = max(srv.max_concurrent, srv.concurrent)
        try:
            if self.path.startswith("/ok"):
                body = f"<html><body>ok {self.path}</body></html>".encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/big-no-length":
                # > max_body, NO Content-Length: client must stream+truncate
                self.send_response(200)
                self.end_headers()  # HTTP/1.0: body ends at connection close
                self.wfile.write(b"x" * 10_000)
            elif self.path.startswith("/redir/"):
                n = int(self.path.rsplit("/", 1)[1])
                self.send_response(302)
                target = "/ok-final" if n <= 1 else f"/redir/{n - 1}"
                self.send_header("Location", target)
                self.send_header("Content-Length", "0")
                self.end_headers()
            elif self.path == "/ok-final":
                body = b"made it"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/gz"):
                import gzip as _gzip

                raw = f"<html><body>compressed {self.path}</body></html>".encode()
                body = _gzip.compress(raw)
                self.send_response(200)
                self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/deflate-raw":
                import zlib as _zlib

                raw = b"<html><body>raw deflate</body></html>"
                c = _zlib.compressobj(wbits=-15)
                body = c.compress(raw) + c.flush()
                self.send_response(200)
                self.send_header("Content-Encoding", "deflate")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/zipbomb":
                import gzip as _gzip

                body = _gzip.compress(b"A" * 50_000_000)  # ~50 MB -> ~50 KB
                self.send_response(200)
                self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/xgzip":
                import gzip as _gzip

                body = _gzip.compress(b"<html><body>x-gzip alias</body></html>")
                self.send_response(200)
                self.send_header("Content-Encoding", "x-gzip")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/brotli":
                self.send_response(200)
                self.send_header("Content-Encoding", "br")
                self.send_header("Content-Length", "4")
                self.end_headers()
                self.wfile.write(b"\x0b\x02\x80!")  # no br decoder here
            elif self.path == "/badgzip":
                self.send_response(200)
                self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", "9")
                self.end_headers()
                self.wfile.write(b"notgzip!!")
            elif self.path == "/robots.txt":
                mode = getattr(srv, "robots_mode", "404")
                if mode == "200":
                    body = b"User-agent: *\nDisallow: /private\nCrawl-delay: 2\n"
                    self.send_response(200)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif mode == "500":
                    self.send_error(500)
                else:
                    self.send_error(404)
            elif self.path == "/slow":
                time.sleep(1.0)
                self.send_response(200)
                self.send_header("Content-Length", "4")
                self.end_headers()
                self.wfile.write(b"slow")
            elif self.path.startswith("/pause"):
                time.sleep(0.25)
                body = b"paused"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)
        finally:
            with srv.stats_lock:
                srv.concurrent -= 1


def _start_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.stats_lock = threading.Lock()
    srv.concurrent = 0
    srv.max_concurrent = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


@pytest.fixture(scope="module")
def servers():
    a, b = _start_server(), _start_server()
    yield a, b
    a.shutdown()
    b.shutdown()


def _batch(urls: list[str]) -> pa.Table:
    return pa.table({"url": pa.array(urls, pa.string())})


def test_requires_network_opt_in():
    with pytest.raises(RuntimeError, match="allow_network"):
        HttpFetcher()


def test_fetch_statuses_and_truncation(servers):
    a, _ = servers
    base = f"http://127.0.0.1:{a.server_address[1]}"
    f = HttpFetcher(timeout_s=5.0, max_body=2500, allow_network=True)
    out = f(_batch([f"{base}/ok", f"{base}/big-no-length", f"{base}/nope"]))
    status = out["fetch_status"].to_pylist()
    assert status == [200, 200, 404]
    htmls = out["html"].to_pylist()
    assert b"ok /ok" in htmls[0]
    # max-body enforced with no Content-Length header (mock-servers.MD:4)
    assert len(htmls[1]) == 2500
    assert htmls[2] is None


def test_timeout_records_transport_error(servers):
    a, _ = servers
    base = f"http://127.0.0.1:{a.server_address[1]}"
    f = HttpFetcher(timeout_s=0.2, allow_network=True)
    out = f(_batch([f"{base}/slow", f"{base}/ok"]))
    assert out["fetch_status"].to_pylist() == [-1, 200]


def test_redirect_cap_enforced(servers):
    a, _ = servers
    base = f"http://127.0.0.1:{a.server_address[1]}"
    f = HttpFetcher(timeout_s=5.0, max_redirects=3, allow_network=True)
    out = f(_batch([f"{base}/redir/2", f"{base}/redir/8"]))
    status = out["fetch_status"].to_pylist()
    assert status[0] == 200  # 2 hops < cap -> followed to /ok-final
    assert b"ok-final" in out["html"][0].as_py()
    assert status[1] != 200  # over the cap -> error status, not a 200


def test_per_host_serial_cross_host_parallel():
    # fresh servers: earlier tests' abandoned /slow requests would otherwise
    # still be draining and pollute the concurrency counters
    a, b = _start_server(), _start_server()
    pa_, pb = a.server_address[1], b.server_address[1]
    # 3 pause-URLs per "host" (host = netloc incl. port) x 2 hosts
    urls = [f"http://127.0.0.1:{pa_}/pause?i={i}" for i in range(3)]
    urls += [f"http://127.0.0.1:{pb}/pause?i={i}" for i in range(3)]
    f = HttpFetcher(timeout_s=5.0, allow_network=True)
    t0 = time.monotonic()
    out = f(_batch(urls))
    wall = time.monotonic() - t0
    assert out["fetch_status"].to_pylist() == [200] * 6
    # serialized per host: each server never saw 2 concurrent requests
    assert a.max_concurrent == 1 and b.max_concurrent == 1
    # parallel across hosts: 6 x 0.25s serial would be >= 1.5s; two hosts
    # in parallel bound it near 0.75s (generous margin for VM noise)
    assert wall < 1.3
    a.shutdown()
    b.shutdown()


def test_warc_ts_set_only_on_body(servers):
    a, _ = servers
    base = f"http://127.0.0.1:{a.server_address[1]}"
    f = HttpFetcher(timeout_s=5.0, allow_network=True)
    out = f(_batch([f"{base}/ok", f"{base}/nope"]))
    ts = out["warc_ts"].to_numpy(zero_copy_only=False)
    assert ts[0] != np.datetime64(0, "us")
    assert ts[1] == np.datetime64(0, "us")


def test_compressed_responses_decode_and_zipbomb_capped(servers):
    """gzip and raw-deflate bodies decode transparently; a gzip bomb is
    capped at max_body DECOMPRESSED bytes; undecodable encoded bytes
    record no body (page is unparseable either way)."""
    a, _ = servers
    base = f"http://127.0.0.1:{a.server_address[1]}"
    f = HttpFetcher(timeout_s=5.0, max_body=4096, allow_network=True)
    out = f(_batch([f"{base}/gz1", f"{base}/deflate-raw",
                    f"{base}/zipbomb", f"{base}/badgzip"]))
    rows = {r["url"].rsplit("/", 1)[1]: r for r in out.to_pylist()}
    assert b"compressed /gz1" in rows["gz1"]["html"]
    assert rows["gz1"]["fetch_status"] == 200
    assert rows["deflate-raw"]["html"] == b"<html><body>raw deflate</body></html>"
    # bomb: ~50 MB decompressed, capped at max_body
    assert rows["zipbomb"]["fetch_status"] == 200
    assert len(rows["zipbomb"]["html"]) == 4096
    assert rows["zipbomb"]["html"] == b"A" * 4096
    # broken encoding: status kept, body dropped
    assert rows["badgzip"]["fetch_status"] == 200
    assert rows["badgzip"]["html"] is None
    # RFC 9110 x-gzip alias decodes; an undecodable coding (br) drops the
    # body instead of leaking compressed bytes downstream as html
    out2 = f(_batch([f"{base}/xgzip", f"{base}/brotli"]))
    rows2 = {r["url"].rsplit("/", 1)[1]: r for r in out2.to_pylist()}
    assert rows2["xgzip"]["html"] == b"<html><body>x-gzip alias</body></html>"
    assert rows2["brotli"]["fetch_status"] == 200
    assert rows2["brotli"]["html"] is None


def test_fetch_robots_rfc9309_availability(servers):
    """fetch_robots over local servers: 2xx parses, 404 allows all,
    5xx/transport disallows all (RFC 9309 2.3.1)."""
    from monocator_ray.state.robots import fetch_robots

    a, b = servers
    host_a = f"127.0.0.1:{a.server_address[1]}"
    host_b = f"127.0.0.1:{b.server_address[1]}"
    f = HttpFetcher(timeout_s=2.0, allow_network=True)

    # 200: rules parse (disallow + crawl delay)
    a.robots_mode = "200"
    b.robots_mode = "404"
    dead = "127.0.0.1:1"
    rules = fetch_robots([host_a, host_b, dead], f)
    assert not rules[host_a].allowed("/private/x")
    assert rules[host_a].allowed("/public")
    assert rules[host_a].crawl_delay_ms == 2000
    # 404 -> unavailable -> allow all
    assert rules[host_b].allowed("/anything")
    # transport error -> unreachable -> complete disallow
    assert not rules[dead].allowed("/") and not rules[dead].allowed("/a/b")

    # 5xx -> unreachable -> complete disallow
    a.robots_mode = "500"
    rules = fetch_robots([host_a], f)
    assert not rules[host_a].allowed("/public")
    a.robots_mode = "404"


def test_https_fetch_with_verified_local_tls():
    """HTTPS end-to-end against a local TLS-wrapped HTTP server with REAL
    certificate verification: the client context trusts only the test CA
    and checks the hostname (the leaf carries an IPAddress(127.0.0.1)
    SAN), mirroring the probe tests' no-network mock-server discipline.
    An UNtrusted default-context fetch against the same server must fail
    with status -1, proving verification is actually on."""
    import datetime
    import ipaddress
    import ssl

    from cryptography import x509 as cx
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.hazmat.primitives.hashes import SHA256
    from cryptography.x509.oid import NameOID

    def name(cn):
        return cx.Name([cx.NameAttribute(NameOID.COMMON_NAME, cn)])

    nb = datetime.datetime(2020, 1, 1)
    na = datetime.datetime(2040, 1, 1)
    ca_key = ec.generate_private_key(ec.SECP256R1())
    leaf_key = ec.generate_private_key(ec.SECP256R1())
    ca_cert = (cx.CertificateBuilder()
               .subject_name(name("Fetch Test CA")).issuer_name(name("Fetch Test CA"))
               .public_key(ca_key.public_key()).serial_number(cx.random_serial_number())
               .not_valid_before(nb).not_valid_after(na)
               .add_extension(cx.BasicConstraints(ca=True, path_length=None), True)
               .sign(ca_key, SHA256()))
    leaf_cert = (cx.CertificateBuilder()
                 .subject_name(name("127.0.0.1")).issuer_name(name("Fetch Test CA"))
                 .public_key(leaf_key.public_key()).serial_number(cx.random_serial_number())
                 .not_valid_before(nb).not_valid_after(na)
                 .add_extension(cx.SubjectAlternativeName(
                     [cx.IPAddress(ipaddress.IPv4Address("127.0.0.1"))]), False)
                 .sign(ca_key, SHA256()))
    pem = serialization.Encoding.PEM
    import tempfile, os
    d = tempfile.mkdtemp()
    chain = os.path.join(d, "chain.pem")
    key = os.path.join(d, "key.pem")
    ca = os.path.join(d, "ca.pem")
    open(chain, "wb").write(leaf_cert.public_bytes(pem) + ca_cert.public_bytes(pem))
    open(key, "wb").write(leaf_key.private_bytes(
        pem, serialization.PrivateFormat.PKCS8, serialization.NoEncryption()))
    open(ca, "wb").write(ca_cert.public_bytes(pem))

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    srv.stats_lock = threading.Lock()
    srv.concurrent = srv.max_concurrent = 0
    sctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    sctx.load_cert_chain(chain, key)
    srv.socket = sctx.wrap_socket(srv.socket, server_side=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        url = f"https://127.0.0.1:{port}/ok"
        cctx = ssl.create_default_context(cafile=ca)  # verify + hostname ON
        f = HttpFetcher(timeout_s=3.0, allow_network=True, ssl_context=cctx)
        batch = pa.table({"url": pa.array([url], pa.string())})
        out = f(batch)
        assert out["fetch_status"][0].as_py() == 200
        assert b"ok /ok" in out["html"][0].as_py()
        # default trust store does NOT contain the test CA -> must fail
        f2 = HttpFetcher(timeout_s=3.0, allow_network=True)
        out2 = f2(batch)
        assert out2["fetch_status"][0].as_py() == -1
    finally:
        srv.shutdown()
        srv.server_close()
