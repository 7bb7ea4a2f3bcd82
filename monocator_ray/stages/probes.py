"""Real network probers for the non-web crawler modules (dns / tls / smtp)
— pure-stdlib clients that drop in behind the ``probe_fn`` seams of
``stages.modules`` (reference module flow, /root/reference/src/TODO.MD:3-51).

The sandbox has no OUTBOUND network, but these are real protocol clients:
the test suite drives every one of them against local in-process servers
(an ``ssl``-wrapped TLS listener, an RFC 1035 UDP responder, an SMTP banner
server) — the same no-outbound-network discipline ``stages/fetch.py`` and
the RFC 9309 robots tests established.  A real deployment points them at
real hosts unchanged.

Protocol surface, all public-spec:

* TLS — one ``ssl.SSLContext`` handshake per (host, version) with the
  version pinned ``minimum_version == maximum_version`` (RFC 8446 / 5246
  negotiation happens inside OpenSSL); ``CERT_NONE`` because a scanner
  records what the peer presents, it does not enforce trust.  SSLv2/SSLv3
  are gone from OpenSSL 3 — probing them reports ``supported=False`` with
  a stack-limitation error string rather than pretending to test them.
* Certificate chain — the peer's DER certificates parsed by the
  pure-stdlib RFC 5280 parser in ``stages.x509``.  Python < 3.13 exposes
  only the LEAF over ``getpeercert(binary_form=True)``; 3.13+ returns the
  chain as presented (``get_unverified_chain``).  Either way the result is
  a real populated ``Optional<List<Certificate>>`` analog.
* DNS — a minimal RFC 1035 resolver client over UDP: QNAME label
  encoding, RD flag, answer parsing with §4.1.4 name-compression pointer
  chasing (loop-bounded), A/AAAA/MX/TXT/NS/CNAME RDATA rendering.
* SMTP — RFC 5321 connect, multiline ``220`` greeting, ``EHLO``/``QUIT``
  exchange; records the banner and connect outcome.
"""

from __future__ import annotations

import socket
import ssl
import struct
import time

from monocator_ray.stages.x509 import parse_certificate

# ---------------------------------------------------------------- TLS ----

_TLS_VERSIONS = {
    "tls13": ssl.TLSVersion.TLSv1_3,
    "tls12": ssl.TLSVersion.TLSv1_2,
    "tls11": ssl.TLSVersion.TLSv1_1,
    "tls10": ssl.TLSVersion.TLSv1,
}


def _client_ctx(version: str | None = None) -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE  # scanner records, policy verifies later
    if version is not None:
        import warnings

        ver = _TLS_VERSIONS[version]
        with warnings.catch_warnings():
            # probing legacy versions is this scanner's JOB — the stdlib
            # deprecation warning is for servers, not scanners
            warnings.simplefilter("ignore", DeprecationWarning)
            ctx.minimum_version = ver
            ctx.maximum_version = ver
        if ver in (ssl.TLSVersion.TLSv1, ssl.TLSVersion.TLSv1_1):
            # OpenSSL 3 security level forbids legacy handshakes by default
            ctx.set_ciphers("DEFAULT:@SECLEVEL=0")
    return ctx


def probe_tls(host: str, port: int, version: str,
              timeout: float = 5.0, server_hostname: str | None = None) -> dict:
    """One pinned-version handshake -> SINGLE_VERSION_SCAN dict."""
    t0 = time.monotonic()
    if version not in _TLS_VERSIONS:
        return {"supported": False, "cipher_suite": "",
                "error": f"{version} not supported by local TLS stack "
                         "(OpenSSL 3 removed SSLv2/SSLv3)",
                "millis": 0}
    try:
        ctx = _client_ctx(version)
        with socket.create_connection((host, port), timeout=timeout) as raw:
            raw.settimeout(timeout)
            with ctx.wrap_socket(
                raw, server_hostname=server_hostname or host
            ) as tls:
                cipher = tls.cipher()
        return {"supported": True,
                "cipher_suite": cipher[0] if cipher else "",
                "error": "",
                "millis": int((time.monotonic() - t0) * 1000)}
    except (OSError, ssl.SSLError) as e:
        return {"supported": False, "cipher_suite": "",
                "error": f"{type(e).__name__}: {e}",
                "millis": int((time.monotonic() - t0) * 1000)}


def tls_cert_chain(host: str, port: int, timeout: float = 5.0,
                   server_hostname: str | None = None) -> list[dict] | None:
    """The certificate chain the peer presents, parsed to CERTIFICATE
    entity dicts; ``None`` when no connection/chain could be obtained
    (the Optional<List<Certificate>> semantics, TODO.MD:15-17,50)."""
    try:
        ctx = _client_ctx()
        with socket.create_connection((host, port), timeout=timeout) as raw:
            raw.settimeout(timeout)
            with ctx.wrap_socket(
                raw, server_hostname=server_hostname or host
            ) as tls:
                if hasattr(tls, "get_unverified_chain"):  # Python 3.13+
                    ders = [
                        c if isinstance(c, (bytes, bytearray))
                        else c.public_bytes(ssl._ssl.ENCODING_DER)
                        for c in tls.get_unverified_chain() or []
                    ]
                else:  # leaf-only on older runtimes, documented above
                    leaf = tls.getpeercert(binary_form=True)
                    ders = [leaf] if leaf else []
        return [parse_certificate(d) for d in ders] or None
    except (OSError, ssl.SSLError, ValueError):
        return None


def tls_probe_fn(port: int = 443, timeout: float = 5.0):
    """Factory: the (ip, version) probe_fn TlsModule expects."""
    return lambda ip, version: probe_tls(ip, port, version, timeout)


def tls_cert_fn(port: int = 443, timeout: float = 5.0):
    """Factory: the (ip) cert_fn TlsModule expects."""
    return lambda ip: tls_cert_chain(ip, port, timeout)


# ---------------------------------------------------------------- DNS ----

DNS_TYPES = {"A": 1, "NS": 2, "CNAME": 5, "MX": 15, "TXT": 16, "AAAA": 28}
_TYPE_NAMES = {v: k for k, v in DNS_TYPES.items()}


def encode_dns_query(txid: int, name: str, rrtype: str) -> bytes:
    """RFC 1035 §4.1.1-4.1.2 query: header (RD set) + one question."""
    out = struct.pack(">HHHHHH", txid, 0x0100, 1, 0, 0, 0)
    for label in name.rstrip(".").split("."):
        raw = label.encode("idna") if not label.isascii() else label.encode()
        if not 0 < len(raw) < 64:
            raise ValueError(f"bad DNS label {label!r}")
        out += bytes([len(raw)]) + raw
    return out + b"\x00" + struct.pack(">HH", DNS_TYPES[rrtype], 1)


def _read_name(data: bytes, pos: int) -> tuple[str, int]:
    """Decompress a domain name at ``pos`` (RFC 1035 §4.1.4 pointers);
    returns (name, position after the name's first encoding)."""
    labels: list[str] = []
    end = -1
    hops = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated DNS name")
        b = data[pos]
        if b & 0xC0 == 0xC0:  # compression pointer
            if end < 0:
                end = pos + 2
            pos = struct.unpack_from(">H", data, pos)[0] & 0x3FFF
            hops += 1
            if hops > 64:  # hostile pointer loop
                raise ValueError("DNS name pointer loop")
        elif b == 0:
            if end < 0:
                end = pos + 1
            return ".".join(labels), end
        else:
            labels.append(data[pos + 1 : pos + 1 + b].decode("ascii", "replace"))
            pos += 1 + b


def _render_rdata(rtype: int, rdata: bytes, data: bytes, rpos: int) -> str:
    if rtype == 1:  # A
        return socket.inet_ntop(socket.AF_INET, rdata)
    if rtype == 28:  # AAAA
        return socket.inet_ntop(socket.AF_INET6, rdata)
    if rtype == 15:  # MX: preference + exchange (may be compressed)
        pref = struct.unpack_from(">H", data, rpos)[0]
        host, _ = _read_name(data, rpos + 2)
        return f"{pref} {host}"
    if rtype == 16:  # TXT: sequence of character-strings
        out, p = [], 0
        while p < len(rdata):
            ln = rdata[p]
            out.append(rdata[p + 1 : p + 1 + ln].decode("utf-8", "replace"))
            p += 1 + ln
        return "".join(out)
    if rtype in (2, 5):  # NS / CNAME (may be compressed)
        host, _ = _read_name(data, rpos)
        return host
    return rdata.hex()


def parse_dns_response(data: bytes, txid: int | None = None) -> list[tuple[str, str, str]]:
    """Answer section -> [(owner_name, rrtype_name, rendered_value)]."""
    if len(data) < 12:
        raise ValueError("truncated DNS header")
    rid, flags, qd, an, _ns, _ar = struct.unpack_from(">HHHHHH", data, 0)
    if txid is not None and rid != txid:
        raise ValueError("DNS txid mismatch")
    rcode = flags & 0xF
    if rcode not in (0, 3):  # NOERROR / NXDOMAIN (empty answers)
        raise ValueError(f"DNS rcode {rcode}")
    pos = 12
    for _ in range(qd):  # skip questions
        _, pos = _read_name(data, pos)
        pos += 4
    out = []
    for _ in range(an):
        name, pos = _read_name(data, pos)
        rtype, _rclass, _ttl, rdlen = struct.unpack_from(">HHIH", data, pos)
        pos += 10
        rdata = data[pos : pos + rdlen]
        out.append((name, _TYPE_NAMES.get(rtype, str(rtype)),
                    _render_rdata(rtype, rdata, data, pos)))
        pos += rdlen
    return out


def probe_dns(name: str, rrtype: str, server: tuple[str, int] = ("127.0.0.1", 53),
              timeout: float = 5.0) -> list[str]:
    """Resolve ``name``/``rrtype`` against ``server`` -> rendered values of
    the answers matching the queried type (CNAME indirection answers are
    dropped — the module records per-rrtype values, TODO.MD:59)."""
    txid = int.from_bytes(__import__("os").urandom(2), "big")
    query = encode_dns_query(txid, name, rrtype)
    with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
        s.settimeout(timeout)
        s.sendto(query, server)
        data, _ = s.recvfrom(4096)
    return [v for _n, t, v in parse_dns_response(data, txid) if t == rrtype]


def dns_probe_fn(server: tuple[str, int] = ("127.0.0.1", 53),
                 timeout: float = 5.0):
    """Factory: the (name, rrtype) probe_fn DnsModule expects."""
    return lambda name, rrtype: probe_dns(name, rrtype, server, timeout)


# --------------------------------------------------------------- SMTP ----

def _read_reply(fh) -> tuple[int, str]:
    """One (possibly multiline) SMTP reply -> (code, joined text)."""
    lines = []
    while True:
        raw = fh.readline(1024)
        if not raw:
            raise ConnectionError("SMTP peer closed mid-reply")
        line = raw.decode("utf-8", "replace").rstrip("\r\n")
        lines.append(line[4:])
        if len(line) < 4 or line[3] != "-":
            return int(line[:3]), "\n".join(lines)


def probe_smtp(host: str, port: int = 25, timeout: float = 5.0,
               helo: str = "probe.invalid") -> dict:
    """RFC 5321 banner probe -> SMTP_RESULT fields (connect_ok, banner)."""
    try:
        with socket.create_connection((host, port), timeout=timeout) as s:
            s.settimeout(timeout)
            fh = s.makefile("rb")
            code, banner = _read_reply(fh)
            if code != 220:
                return {"connect_ok": False, "banner": banner}
            s.sendall(f"EHLO {helo}\r\n".encode())
            _read_reply(fh)  # capability list; banner is the greeting
            s.sendall(b"QUIT\r\n")
            try:
                _read_reply(fh)
            except (ConnectionError, OSError):
                pass  # peers may close straight after QUIT
        return {"connect_ok": True, "banner": banner}
    except (OSError, ValueError) as e:
        return {"connect_ok": False, "banner": f"{type(e).__name__}: {e}"}


def smtp_probe_fn(port: int = 25, timeout: float = 5.0):
    """Factory: the (mx_host) probe_fn SmtpModule expects."""
    return lambda mx_host: probe_smtp(mx_host, port, timeout)
