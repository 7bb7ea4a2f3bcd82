"""Non-web crawler modules (dns / tls / smtp / screenshot) — config surface
and entity model parity with the reference (SURVEY.md §1.1).

The reference's richest surviving artifact is the TLS-crawler entity model
(/root/reference/src/TODO.MD:3-51): ``FullScan`` holds a
``Map<TlsProtocolVersion, SingleVersionScan>`` plus ``connectOK``; a
certificate chain is ``Optional<List<Certificate>>``; results flow
``module.visit -> CrawlResult -> convertToEntity -> repository.save``
(TODO.MD:38-51) with a ``FullScanCache.find(ip)`` memo (TODO.MD:5,41).

The modules are safe-by-default: with no injected prober they raise
``NetworkUnavailable`` (the sandbox has no OUTBOUND network).  REAL probers
live in ``stages.probes`` — pure-stdlib TLS / DNS (RFC 1035) / SMTP
(RFC 5321) clients, driven in the test suite against local in-process
servers (``tests/test_probes.py``) exactly like the HTTP fetcher and the
RFC 9309 robots acquisition.  A deployment wires them in with the
factories::

    TlsModule(probe_fn=probes.tls_probe_fn(), cert_fn=probes.tls_cert_fn())
    DnsModule(probe_fn=probes.dns_probe_fn(resolver_addr))
    SmtpModule(probe_fn=probes.smtp_probe_fn())
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from monocator_ray.state.robots import KeyedCache

# TlsProtocolVersion flags verbatim from the VisitRequest format
# (/root/reference/src/TODO.MD:68-75)
TLS_VERSIONS = ("tls13", "tls12", "tls11", "tls10", "ssl3", "ssl2")

# SingleVersionScan (TODO.MD:26-34): per-version connect outcome
SINGLE_VERSION_SCAN = pa.struct(
    [
        ("supported", pa.bool_()),
        ("cipher_suite", pa.string()),
        ("error", pa.string()),
        ("millis", pa.int64()),
    ]
)

# Certificate (chain entries; Optional<List<Certificate>>, TODO.MD:15-17,50)
CERTIFICATE = pa.struct(
    [
        ("subject", pa.string()),
        ("issuer", pa.string()),
        ("not_before", pa.timestamp("us")),
        ("not_after", pa.timestamp("us")),
        ("sha256_fingerprint", pa.binary()),
    ]
)

# FullScan / FullScanEntity (TODO.MD:3-5,26-34): one row per scanned ip
TLS_SCAN = pa.schema(
    [
        ("domain", pa.string()),
        ("ip", pa.string()),
        ("connect_ok", pa.bool_()),
        ("scans", pa.map_(pa.string(), SINGLE_VERSION_SCAN)),
        ("certificate_chain", pa.list_(CERTIFICATE)),
    ]
)

DNS_RESULT = pa.schema(
    [
        ("domain", pa.string()),
        ("prefix", pa.string()),   # dns.prefixes (TODO.MD:58)
        ("rrtype", pa.string()),   # dns.rrtypes (TODO.MD:59)
        ("values", pa.list_(pa.string())),
    ]
)

SMTP_RESULT = pa.schema(
    [
        ("domain", pa.string()),
        ("mx_host", pa.string()),
        ("connect_ok", pa.bool_()),
        ("banner", pa.string()),
    ]
)


class NetworkUnavailable(NotImplementedError):
    """Raised by the stub probes; a real deployment injects probe_fn."""


def _no_network_probe(*_a, **_k):
    raise NetworkUnavailable("sandbox has no network; inject probe_fn (see module docstring)")


@dataclass
class TlsModule:
    """TLS module (TODO.MD:36-51 flow): visit(domain, ips) -> TLS_SCAN rows.
    ``cache`` reproduces FullScanCache.find(ip): one scan per ip per run."""

    enabled_versions: tuple = TLS_VERSIONS
    probe_fn: object = _no_network_probe  # (ip, version) -> dict matching SINGLE_VERSION_SCAN
    # saveCertificates(Optional<List<Certificate>>) analog (TODO.MD:15-17,50):
    # (ip) -> list of CERTIFICATE dicts, or None when no chain was obtained
    cert_fn: object = None
    cache: KeyedCache = field(default_factory=KeyedCache)

    def visit(self, domain: str, ips: list[str]) -> pa.Table:
        rows = []
        for ip in ips:
            full = self.cache.find_or_compute(ip, self._scan_ip)
            rows.append(dict(full, domain=domain, ip=ip))
        return pa.Table.from_pylist(rows, schema=TLS_SCAN) if rows else pa.table(
            {f.name: pa.array([], f.type) for f in TLS_SCAN}
        )

    def _scan_ip(self, ip: str) -> dict:
        scans = []
        connect_ok = False
        for v in self.enabled_versions:
            r = self.probe_fn(ip, v)  # raises NetworkUnavailable in sandbox
            scans.append((v, r))
            connect_ok = connect_ok or bool(r.get("supported"))
        # chain is Optional: only fetched on a successful connect, and a
        # prober may still return None (chain unavailable) -> null column
        chain = self.cert_fn(ip) if (connect_ok and self.cert_fn is not None) else None
        return {"connect_ok": connect_ok, "scans": scans, "certificate_chain": chain}


@dataclass
class DnsModule:
    """DNS module: per-domain prefix x rrtype resolution -> DNS_RESULT
    rows (``dns.prefixes`` / ``dns.rrtypes`` config surface,
    /root/reference/src/TODO.MD:58-59).  ``cache`` memoizes per
    (name, rrtype) like FullScanCache — a domain visited under several
    seeds resolves once per run."""

    prefixes: tuple = ("", "www")
    rrtypes: tuple = ("A", "AAAA", "MX", "TXT")
    probe_fn: object = _no_network_probe  # (name, rrtype) -> list[str]
    cache: KeyedCache = field(default_factory=KeyedCache)

    def visit(self, domain: str) -> pa.Table:
        rows = []
        for p in self.prefixes:
            name = f"{p}.{domain}" if p else domain
            for rt in self.rrtypes:
                vals = self.cache.find_or_compute(
                    (name, rt), lambda k: self.probe_fn(k[0], k[1])
                )
                rows.append({"domain": domain, "prefix": p, "rrtype": rt,
                             "values": vals})
        return pa.Table.from_pylist(rows, schema=DNS_RESULT) if rows else pa.table(
            {f.name: pa.array([], f.type) for f in DNS_RESULT}
        )


@dataclass
class SmtpModule:
    """SMTP module: banner-probe each MX host -> SMTP_RESULT rows.  The MX
    list comes from DnsModule's ``MX`` rrtype values (``"pref host"`` —
    pass just the hosts); ``cache`` keys on mx_host so shared mail
    infrastructure probes once per run."""

    probe_fn: object = _no_network_probe  # (mx_host) -> {connect_ok, banner}
    cache: KeyedCache = field(default_factory=KeyedCache)

    def visit(self, domain: str, mx_hosts: list[str]) -> pa.Table:
        rows = []
        for mx in mx_hosts:
            r = self.cache.find_or_compute(mx, self.probe_fn)
            rows.append({"domain": domain, "mx_host": mx,
                         "connect_ok": bool(r["connect_ok"]),
                         "banner": r["banner"]})
        return pa.Table.from_pylist(rows, schema=SMTP_RESULT) if rows else pa.table(
            {f.name: pa.array([], f.type) for f in SMTP_RESULT}
        )


def convert_to_entity(result: pa.Table, schema: pa.Schema, where: str = "module") -> pa.Table:
    """CrawlResult#convertToEntity analog (TODO.MD:7-9,22-24,48): validate a
    module result against its entity schema before persistence."""
    from monocator_ray.schemas import assert_schema

    return assert_schema(result, schema, where)


def save_visit_result(out_dir: str, domain: str, module_tables: dict) -> None:
    """VisitService.save(VisitResult) analog (TODO.MD:44-51): persist each
    module's entity table, one logical table per entity."""
    import os

    import pyarrow.parquet as pq

    for name, tbl in module_tables.items():
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(tbl, os.path.join(d, f"{domain}.parquet"))
