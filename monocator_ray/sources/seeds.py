"""S2 — seed / VisitRequest ingestion (SURVEY.md §2.1).

The reference's unit of work is a VisitRequest: one domain + per-module
enable flags (message format verbatim at /root/reference/src/TODO.MD:56-77).
Here: read seed text/CSV/parquet -> canonical VisitRequests with defaults;
``requests_to_seed_urls`` turns them into frontier seed URLs (http://domain/).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from monocator_ray.schemas import SCREENSHOT_MODES, VISIT_REQUESTS
from monocator_ray.shipping import ensure_shipped
from monocator_ray.urlnorm import canonicalize_url


def default_request(domain: str) -> dict:
    """Defaults mirror TODO.MD:56-77: web on, other modules off."""
    return {
        "domain": domain.strip().lower().rstrip("."),
        "web_enabled": True,
        "web_max_pages": 10,
        "vat_enabled": False,
        "dns_enabled": False,
        "tls_enabled": False,
        "smtp_enabled": False,
        "screenshot_mode": SCREENSHOT_MODES[0],
    }


def to_visit_requests(batch: pa.Table) -> pa.Table:
    """map_batches fn: seed lines (column 'text' or 'domain') -> requests."""
    col = "domain" if "domain" in batch.schema.names else "text"
    rows = [default_request(d) for d in batch[col].to_pylist() if d and d.strip()]
    return pa.Table.from_pylist(rows, schema=VISIT_REQUESTS)


def read_seeds(path: str) -> rd.Dataset:
    """Seed list file (one domain per line, or CSV/parquet with a 'domain'
    column) -> VisitRequests dataset."""
    ensure_shipped()
    if path.endswith(".parquet"):
        ds = rd.read_parquet(path)
    elif path.endswith(".csv"):
        ds = rd.read_csv(path)
    else:
        ds = rd.read_text(path)
    return ds.map_batches(to_visit_requests, batch_format="pyarrow")


def requests_to_seed_urls(requests: pa.Table) -> list[str]:
    """Enabled web requests -> canonical seed URLs; per-host page caps are
    derived separately via ``host_caps_from_requests``."""
    urls = []
    for row in requests.to_pylist():
        if row["web_enabled"]:
            u = canonicalize_url(f"http://{row['domain']}/")
            if u:
                urls.append(u)
    return urls


def seed_urls_from_file(path: str) -> list[str]:
    """Seed file -> frontier URLs, auto-detecting the three accepted
    shapes: a SITEMAP file (.xml / .xml.gz, or content sniffed as XML /
    gzip — the sitemaps.org seed source; urlset pages seed directly,
    nested sitemapindex files resolve if they are local paths) parses via
    sources/sitemap.py; a text file of FULL URLS (lines containing '://')
    seeds those exact pages; anything else (domain lines, CSV/parquet
    with a 'domain' column) goes through VisitRequests and seeds each
    host's root.  Without the URL branch a full-URL line would be treated
    as a domain and mangled into 'http://http//...' (code-review r3
    finding #1) — every CLI entry (crawl / corpus / jobs) must route
    through here."""
    if not path.endswith((".csv", ".parquet")):
        with open(path, "rb") as fh:
            raw = fh.read()
        is_sitemap = (path.endswith((".xml", ".xml.gz"))
                      or raw[:2] == b"\x1f\x8b" or raw.lstrip()[:1] == b"<")
        if is_sitemap:
            import os

            from monocator_ray.sources.sitemap import parse_sitemap

            pages, children = parse_sitemap(raw)
            # resolve LOCAL child sitemaps (an index of files beside it);
            # remote children would need the fetch path
            base = os.path.dirname(os.path.abspath(path))
            for child in children:
                cp = child if os.path.exists(child) else os.path.join(
                    base, os.path.basename(child))
                if os.path.exists(cp):
                    with open(cp, "rb") as fh:
                        p2, _ = parse_sitemap(fh.read())
                    pages.extend(p2)
            seen: set[str] = set()
            out = []
            for u in pages:
                c = canonicalize_url(u)
                if c and c not in seen:
                    seen.add(c)
                    out.append(c)
            return out
        lines = [x.strip() for x in raw.decode("utf-8", "replace").splitlines()
                 if x.strip()]
        if lines and "://" in lines[0]:
            return [u for u in (canonicalize_url(x) for x in lines) if u]
    reqs = read_seeds(path).to_pandas()
    return requests_to_seed_urls(pa.Table.from_pandas(reqs))


def read_blacklist(path: str) -> frozenset[str]:
    """S5 — small filter table of blocked hosts (the reference's
    BlacklistEntry, /root/reference/src/TODO.MD:11-13).  One host per line
    (text) or a 'host' column (csv/parquet); shipped as a broadcast set into
    the link filter, never a shuffle join."""
    import pyarrow.parquet as pq

    if path.endswith(".parquet"):
        vals = pq.read_table(path)["host"].to_pylist()
    else:
        with open(path) as f:
            vals = [ln.split(",")[0] for ln in f.read().splitlines()]
    return frozenset(v.strip().lower() for v in vals if v.strip() and not v.startswith("#"))


def host_caps_from_requests(requests: pa.Table) -> dict[str, int]:
    """domain -> web_max_pages (G1 per-host cap source)."""
    return {
        row["domain"]: int(row["web_max_pages"])
        for row in requests.to_pylist()
        if row["web_enabled"] and row["web_max_pages"] > 0
    }
