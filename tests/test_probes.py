"""Real TLS / DNS / SMTP probers against LOCAL in-process servers — closing
the last `partial` component (VERDICT r3 "Next round" #1).  Same
no-outbound-network discipline as tests/test_http_fetch.py: every protocol
peer runs in this process on 127.0.0.1.

The TLS server's certificate chain is generated with `cryptography`
(import-gated — the library is only a TEST fixture dependency; the probers
and the RFC 5280 parser in stages/x509.py are pure stdlib)."""

import datetime as dt
import hashlib
import socket
import socketserver
import ssl
import struct
import threading

import pytest

from monocator_ray.stages.modules import (
    DNS_RESULT,
    SMTP_RESULT,
    TLS_SCAN,
    DnsModule,
    SmtpModule,
    TlsModule,
    convert_to_entity,
    save_visit_result,
)
from monocator_ray.stages.probes import (
    dns_probe_fn,
    encode_dns_query,
    parse_dns_response,
    probe_dns,
    probe_smtp,
    probe_tls,
    smtp_probe_fn,
    tls_cert_chain,
    tls_cert_fn,
    tls_probe_fn,
)
from monocator_ray.stages.x509 import parse_certificate

cryptography = pytest.importorskip("cryptography")

NOT_BEFORE = dt.datetime(2026, 1, 1, 0, 0, 0)
NOT_AFTER = dt.datetime(2027, 1, 1, 0, 0, 0)


# ------------------------------------------------------------ TLS fixture

def _make_chain():
    """Deterministic-shape CA + leaf (EC P-256).  Returns (leaf_der,
    ca_der, chain_pem_bytes, key_pem_bytes)."""
    from cryptography import x509 as cx
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.hazmat.primitives.hashes import SHA256
    from cryptography.x509.oid import NameOID

    def name(cn, org):
        return cx.Name([
            cx.NameAttribute(NameOID.COMMON_NAME, cn),
            cx.NameAttribute(NameOID.ORGANIZATION_NAME, org),
        ])

    ca_key = ec.generate_private_key(ec.SECP256R1())
    leaf_key = ec.generate_private_key(ec.SECP256R1())
    ca_name = name("Monocator Test Root CA", "Monocator Tests")
    ca_cert = (
        cx.CertificateBuilder()
        .subject_name(ca_name).issuer_name(ca_name)
        .public_key(ca_key.public_key())
        .serial_number(cx.random_serial_number())
        .not_valid_before(NOT_BEFORE).not_valid_after(NOT_AFTER)
        .add_extension(cx.BasicConstraints(ca=True, path_length=None), True)
        .sign(ca_key, SHA256())
    )
    leaf_cert = (
        cx.CertificateBuilder()
        .subject_name(name("leaf.test.invalid", "Monocator Tests"))
        .issuer_name(ca_name)
        .public_key(leaf_key.public_key())
        .serial_number(cx.random_serial_number())
        .not_valid_before(NOT_BEFORE).not_valid_after(NOT_AFTER)
        .sign(ca_key, SHA256())
    )
    der = serialization.Encoding.DER
    pem = serialization.Encoding.PEM
    chain_pem = leaf_cert.public_bytes(pem) + ca_cert.public_bytes(pem)
    key_pem = leaf_key.private_bytes(
        pem, serialization.PrivateFormat.PKCS8, serialization.NoEncryption()
    )
    return (leaf_cert.public_bytes(der), ca_cert.public_bytes(der),
            chain_pem, key_pem)


class _TlsServer:
    """Accept loop that completes handshakes and closes; handshake
    failures (version probes the server refuses) are normal traffic."""

    def __init__(self, chain_pem, key_pem, tmp_path, max_version=None):
        cert_file = tmp_path / f"chain{id(self)}.pem"
        key_file = tmp_path / f"key{id(self)}.pem"
        cert_file.write_bytes(chain_pem)
        key_file.write_bytes(key_pem)
        self.ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        self.ctx.load_cert_chain(str(cert_file), str(key_file))
        if max_version is not None:
            self.ctx.maximum_version = max_version
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(16)
        self.sock.settimeout(0.2)
        self.port = self.sock.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except socket.timeout:
                continue
            try:
                conn.settimeout(2)
                with self.ctx.wrap_socket(conn, server_side=True):
                    pass
            except (ssl.SSLError, OSError):
                try:
                    conn.close()
                except OSError:
                    pass

    def close(self):
        self._stop.set()
        self._thread.join(5)
        self.sock.close()


@pytest.fixture(scope="module")
def tls_chain():
    return _make_chain()


@pytest.fixture()
def tls_server(tls_chain, tmp_path):
    srv = _TlsServer(tls_chain[2], tls_chain[3], tmp_path)
    yield srv
    srv.close()


# -------------------------------------------------------------- X.509 ----

def test_x509_parser_matches_cryptography(tls_chain):
    from cryptography import x509 as cx

    leaf_der, ca_der, _, _ = tls_chain
    got = parse_certificate(leaf_der)
    ref = cx.load_der_x509_certificate(leaf_der)
    assert got["subject"] == "CN=leaf.test.invalid, O=Monocator Tests"
    assert got["issuer"] == "CN=Monocator Test Root CA, O=Monocator Tests"
    assert got["not_before"] == NOT_BEFORE
    assert got["not_after"] == NOT_AFTER
    assert got["sha256_fingerprint"] == hashlib.sha256(leaf_der).digest()
    # cross-check against the reference parser's view of the same DER
    assert got["not_before"] == ref.not_valid_before
    assert got["not_after"] == ref.not_valid_after
    ca = parse_certificate(ca_der)
    assert ca["subject"] == ca["issuer"]  # self-signed root


def test_x509_parser_rejects_garbage():
    with pytest.raises(ValueError):
        parse_certificate(b"\x30\x03\x02\x01")  # truncated content
    with pytest.raises(ValueError):
        parse_certificate(b"\x04\x02ok")  # not a SEQUENCE


# ---------------------------------------------------------------- TLS ----

def test_probe_tls_negotiates_modern_versions(tls_server):
    r13 = probe_tls("127.0.0.1", tls_server.port, "tls13")
    assert r13["supported"] is True and r13["error"] == ""
    assert r13["cipher_suite"].startswith("TLS_")
    assert r13["millis"] >= 0
    r12 = probe_tls("127.0.0.1", tls_server.port, "tls12")
    assert r12["supported"] is True and r12["cipher_suite"]


def test_probe_tls_version_refused_by_server(tls_chain, tmp_path):
    srv = _TlsServer(tls_chain[2], tls_chain[3], tmp_path,
                     max_version=ssl.TLSVersion.TLSv1_2)
    try:
        assert probe_tls("127.0.0.1", srv.port, "tls12")["supported"] is True
        r13 = probe_tls("127.0.0.1", srv.port, "tls13")
        assert r13["supported"] is False and r13["error"]
    finally:
        srv.close()


def test_probe_tls_legacy_and_unreachable(tls_server):
    # SSLv2/SSLv3: gone from OpenSSL 3 — honest stack-limitation report
    for v in ("ssl2", "ssl3"):
        r = probe_tls("127.0.0.1", tls_server.port, v)
        assert r["supported"] is False and "local TLS stack" in r["error"]
    # legacy TLS the modern server refuses
    assert probe_tls("127.0.0.1", tls_server.port, "tls10")["supported"] is False
    # nothing listening
    r = probe_tls("127.0.0.1", 1, "tls13", timeout=1.0)
    assert r["supported"] is False and r["error"]


def test_tls_cert_chain_parses_presented_leaf(tls_server, tls_chain):
    chain = tls_cert_chain("127.0.0.1", tls_server.port)
    assert chain is not None and len(chain) >= 1
    leaf = chain[0]
    assert leaf["subject"] == "CN=leaf.test.invalid, O=Monocator Tests"
    assert leaf["issuer"] == "CN=Monocator Test Root CA, O=Monocator Tests"
    assert leaf["sha256_fingerprint"] == hashlib.sha256(tls_chain[0]).digest()
    assert tls_cert_chain("127.0.0.1", 1, timeout=1.0) is None


def test_tls_module_end_to_end_real_prober(tls_server, tmp_path):
    """The full reference flow with a REAL handshake: visit ->
    SingleVersionScan map + populated chain -> convertToEntity -> save ->
    DuckDB export (TODO.MD:38-51)."""
    import duckdb
    import pyarrow.parquet as pq

    mod = TlsModule(probe_fn=tls_probe_fn(port=tls_server.port, timeout=2.0),
                    cert_fn=tls_cert_fn(port=tls_server.port, timeout=2.0))
    t = mod.visit("test.invalid", ["127.0.0.1"])
    assert t.schema.equals(TLS_SCAN)
    assert t["connect_ok"].to_pylist() == [True]
    scans = dict(t["scans"][0].as_py())
    assert scans["tls13"]["supported"] is True
    assert scans["ssl2"]["supported"] is False
    chain = t["certificate_chain"][0].as_py()
    assert chain and chain[0]["subject"] == "CN=leaf.test.invalid, O=Monocator Tests"

    ent = convert_to_entity(t, TLS_SCAN, "tls")
    save_visit_result(str(tmp_path), "test.invalid", {"tls_scan": ent})
    pq_path = tmp_path / "tls_scan" / "test.invalid.parquet"
    assert pq.read_table(str(pq_path)).num_rows == 1

    from monocator_ray.sources.duck import export_duckdb

    db = str(tmp_path / "scan.duckdb")
    assert export_duckdb([str(pq_path)], db, "tls_scan") == 1
    con = duckdb.connect(db)
    try:
        subj, ok = con.execute(
            "SELECT certificate_chain[1].subject, connect_ok FROM tls_scan"
        ).fetchone()
    finally:
        con.close()
    assert subj == "CN=leaf.test.invalid, O=Monocator Tests" and ok is True


# ---------------------------------------------------------------- DNS ----

class _DnsServer:
    """RFC 1035 UDP responder with a canned zone.  Responses are built by
    hand (struct) so the client parser is pinned to the WIRE format — the
    MX exchange uses a §4.1.4 compression pointer into the question."""

    ZONE = {
        ("test.example", 1): [socket.inet_aton("192.0.2.10"),
                              socket.inet_aton("192.0.2.11")],
        ("test.example", 28): [socket.inet_pton(socket.AF_INET6, "2001:db8::1")],
        ("test.example", 16): [b"\x0bv=spf1 -all"],
        ("www.test.example", 1): [socket.inet_aton("192.0.2.20")],
    }

    def __init__(self):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(0.2)
        self.addr = self.sock.getsockname()
        self.queries = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    @staticmethod
    def _qname(data):
        labels, pos = [], 12
        while data[pos]:
            n = data[pos]
            labels.append(data[pos + 1 : pos + 1 + n].decode())
            pos += 1 + n
        return ".".join(labels), pos + 1

    def _loop(self):
        while not self._stop.is_set():
            try:
                data, peer = self.sock.recvfrom(512)
            except socket.timeout:
                continue
            self.queries += 1
            txid = data[:2]
            name, qend = self._qname(data)
            qtype = struct.unpack_from(">H", data, qend)[0]
            question = data[12 : qend + 4]
            if qtype == 15 and name == "test.example":
                # MX with a compressed exchange: "mail" + ptr to offset 12
                rdata = struct.pack(">H", 10) + b"\x04mail" + b"\xc0\x0c"
                answers = [rdata]
            else:
                answers = self.ZONE.get((name, qtype), [])
            if answers:
                hdr = txid + struct.pack(">HHHHH", 0x8180, 1, len(answers), 0, 0)
                body = b""
                for rdata in answers:
                    body += (b"\xc0\x0c" + struct.pack(">HHIH", qtype, 1, 60,
                                                       len(rdata)) + rdata)
                self.sock.sendto(hdr + question + body, peer)
            else:  # NXDOMAIN
                hdr = txid + struct.pack(">HHHHH", 0x8183, 1, 0, 0, 0)
                self.sock.sendto(hdr + question, peer)

    def close(self):
        self._stop.set()
        self._thread.join(5)
        self.sock.close()


@pytest.fixture()
def dns_server():
    srv = _DnsServer()
    yield srv
    srv.close()


def test_probe_dns_rrtypes_and_compression(dns_server):
    addr = dns_server.addr
    assert probe_dns("test.example", "A", addr) == ["192.0.2.10", "192.0.2.11"]
    assert probe_dns("test.example", "AAAA", addr) == ["2001:db8::1"]
    # the exchange name is compressed on the wire — pointer chasing works
    assert probe_dns("test.example", "MX", addr) == ["10 mail.test.example"]
    assert probe_dns("test.example", "TXT", addr) == ["v=spf1 -all"]
    assert probe_dns("nope.example", "A", addr) == []  # NXDOMAIN -> empty


def test_dns_wire_format_roundtrip():
    q = encode_dns_query(0x1234, "a.b.example", "A")
    assert q[:2] == b"\x12\x34"
    assert b"\x01a\x01b\x07example\x00" in q
    with pytest.raises(ValueError):
        parse_dns_response(q[:4])
    with pytest.raises(ValueError):
        encode_dns_query(1, "." + "x" * 64 + ".example", "A")
    # hostile pointer loop is bounded, not infinite
    loop = struct.pack(">HHHHHH", 1, 0x8180, 0, 1, 0, 0) + b"\xc0\x0c"
    with pytest.raises(ValueError):
        parse_dns_response(loop)


def test_dns_module_flow_and_cache(dns_server):
    mod = DnsModule(probe_fn=dns_probe_fn(dns_server.addr, timeout=2.0),
                    rrtypes=("A", "MX"))
    t = mod.visit("test.example")
    assert t.schema.equals(DNS_RESULT)
    assert t.num_rows == 4  # ("", "www") x ("A", "MX")
    rows = {(r["prefix"], r["rrtype"]): r["values"] for r in t.to_pylist()}
    assert rows[("", "A")] == ["192.0.2.10", "192.0.2.11"]
    assert rows[("www", "A")] == ["192.0.2.20"]
    assert rows[("", "MX")] == ["10 mail.test.example"]
    assert rows[("www", "MX")] == []
    # KeyedCache: revisiting resolves nothing new
    before = dns_server.queries
    mod.visit("test.example")
    assert dns_server.queries == before


# --------------------------------------------------------------- SMTP ----

class _SmtpHandler(socketserver.StreamRequestHandler):
    def handle(self):
        self.wfile.write(b"220-mx.test.example ESMTP\r\n220 ready\r\n")
        while True:
            line = self.rfile.readline(1024)
            if not line:
                return
            cmd = line.strip().upper()
            if cmd.startswith(b"EHLO"):
                self.wfile.write(b"250-mx.test.example\r\n"
                                 b"250-PIPELINING\r\n250 SIZE 1000000\r\n")
            elif cmd.startswith(b"QUIT"):
                self.wfile.write(b"221 bye\r\n")
                return
            else:
                self.wfile.write(b"502 nope\r\n")


@pytest.fixture()
def smtp_server():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _SmtpHandler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()
    srv.server_close()


def test_probe_smtp_banner_and_module(smtp_server):
    host, port = smtp_server
    r = probe_smtp(host, port, timeout=2.0)
    assert r["connect_ok"] is True
    assert r["banner"] == "mx.test.example ESMTP\nready"  # multiline 220
    down = probe_smtp("127.0.0.1", 1, timeout=1.0)
    assert down["connect_ok"] is False

    mod = SmtpModule(probe_fn=smtp_probe_fn(port=port, timeout=2.0))
    t = mod.visit("test.example", [host])
    assert t.schema.equals(SMTP_RESULT)
    assert t["connect_ok"].to_pylist() == [True]
    assert "ESMTP" in t["banner"][0].as_py()


def test_dns_to_smtp_composition(dns_server, smtp_server):
    """The module pipeline the reference runs: DNS MX answers feed the
    SMTP module (TODO.MD flow), probing the mail hosts the zone names."""
    dns_mod = DnsModule(probe_fn=dns_probe_fn(dns_server.addr, timeout=2.0),
                        prefixes=("",), rrtypes=("MX",))
    mx_rows = dns_mod.visit("test.example").to_pylist()
    mx_hosts = [v.split(" ", 1)[1] for r in mx_rows for v in r["values"]]
    assert mx_hosts == ["mail.test.example"]
    # the sandbox can't resolve that host — point the prober at the local
    # server the way a deployment's resolver would
    host, port = smtp_server
    smtp_mod = SmtpModule(probe_fn=lambda mx: probe_smtp(host, port, 2.0))
    t = smtp_mod.visit("test.example", mx_hosts)
    assert t["mx_host"].to_pylist() == ["mail.test.example"]
    assert t["connect_ok"].to_pylist() == [True]
