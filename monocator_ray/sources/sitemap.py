"""Sitemap ingestion (S2 companion) — the standard crawler seed source the
public sitemaps.org protocol defines: XML ``<urlset>`` page lists, XML
``<sitemapindex>`` pointing at child sitemaps, plain-text one-URL-per-line
files, any of them gzipped.  A production crawl seeds its frontier from
hosts' sitemaps before falling back to root pages; here the parser + seed
plumbing are real (fixture-tested), and fetching the sitemap bytes rides
the same gated HTTP path as every other page.

Scale shape: parsing is per-payload and stateless — ``sitemap_urls_batch``
drops into ``map_batches`` over a (url, body) Dataset of fetched sitemap
files, emitting canonical URLs that feed the frontier exactly like
extracted links (seen-set dedup happens there, not here).  Index recursion
is bounded by ``max_depth`` (the protocol allows nesting; real-web indexes
are 1-2 levels).
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

import pyarrow as pa

from monocator_ray.urlnorm import canonicalize_url

_GZIP_MAGIC = b"\x1f\x8b"
MAX_SITEMAP_URLS = 50_000  # per file, per sitemaps.org


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def parse_sitemap(data: bytes) -> tuple[list[str], list[str]]:
    """Sitemap payload -> (page_urls, child_sitemap_urls).  Handles the
    three public formats: XML urlset, XML sitemapindex, plain text; gzip
    by magic.  Raises ValueError on payloads that are none of them."""
    if data[:2] == _GZIP_MAGIC:
        data = gzip.decompress(data)
    stripped = data.lstrip()
    if stripped[:1] == b"<":
        # untrusted web payload: reject DTDs before they reach the XML
        # parser — stdlib etree expands internal entities, so a hostile
        # billion-laughs sitemap would otherwise OOM the worker
        # (code-review r3-closing finding #4; legitimate sitemaps per
        # sitemaps.org carry no DOCTYPE).  Scan the WHOLE payload, not a
        # prefix: a DOCTYPE can be pushed arbitrarily deep by leading XML
        # comments (ADVICE r3 #1), and the payload is already fully in
        # memory, bounded by the fetch body cap.
        if b"<!DOCTYPE" in stripped or b"<!ENTITY" in stripped:
            raise ValueError("sitemap XML with DTD/entities rejected")
        try:
            root = ET.fromstring(stripped)
        except ET.ParseError as e:
            raise ValueError(f"malformed sitemap XML: {e}") from None
        kind = _localname(root.tag)
        locs = [
            (el.text or "").strip()
            for el in root.iter()
            if _localname(el.tag) == "loc"
        ]
        locs = [u for u in locs if u][:MAX_SITEMAP_URLS]
        if kind == "sitemapindex":
            return [], locs
        if kind == "urlset":
            return locs, []
        raise ValueError(f"not a sitemap root element: {kind!r}")
    # plain-text sitemap: one URL per line
    urls = []
    for ln in stripped.decode("utf-8", "replace").splitlines():
        ln = ln.strip()
        if ln and "://" in ln:
            urls.append(ln)
        if len(urls) >= MAX_SITEMAP_URLS:
            break
    if not urls:
        raise ValueError("payload is neither sitemap XML nor a URL list")
    return urls, []


def sitemap_seed_urls(payloads: dict[str, bytes], roots: list[str],
                      max_depth: int = 3) -> list[str]:
    """Resolve sitemap-index recursion OFFLINE over already-fetched
    payloads (``payloads``: sitemap url -> bytes; ``roots``: where to
    start) and return deduped canonical page URLs in first-seen order.
    A child index referenced but not present in ``payloads`` is skipped
    (its fetch failed) — same tolerance as a real crawler."""
    return _resolve_seed_urls(
        {u: parse_sitemap(b) for u, b in payloads.items()}, roots, max_depth
    )


def _resolve_seed_urls(parsed: dict[str, tuple[list[str], list[str]]],
                       roots: list[str], max_depth: int) -> list[str]:
    """The recursion walk over ALREADY-PARSED sitemaps (url -> (pages,
    children)) — shared by the offline resolver above and the network
    discovery below so each payload is parsed exactly once."""
    seen_maps: set[str] = set()
    out: list[str] = []
    seen_pages: set[str] = set()
    frontier = list(roots)
    for _ in range(max_depth):
        nxt: list[str] = []
        for sm in frontier:
            if sm in seen_maps or sm not in parsed:
                continue
            seen_maps.add(sm)
            pages, children = parsed[sm]
            for u in pages:
                c = canonicalize_url(u)
                if c and c not in seen_pages:
                    seen_pages.add(c)
                    out.append(c)
            nxt.extend(children)
        if not nxt:
            break
        frontier = nxt
    return out


def sitemap_urls_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` fn over fetched sitemap files (columns: url, body
    binary) -> (src_sitemap, url, is_sitemap) rows: page URLs canonical,
    child-index URLs flagged so the caller can queue another fetch round.
    Unparseable payloads emit nothing (a real crawler logs and moves on)."""
    srcs, urls, flags = [], [], []
    for src, body in zip(batch["url"].to_pylist(), batch["body"].to_pylist()):
        try:
            pages, children = parse_sitemap(body or b"")
        except ValueError:
            continue
        for u in pages:
            c = canonicalize_url(u)
            if c:
                srcs.append(src)
                urls.append(c)
                flags.append(False)
        for u in children:
            srcs.append(src)
            urls.append(u)
            flags.append(True)
    return pa.table({"src_sitemap": pa.array(srcs, pa.string()),
                     "url": pa.array(urls, pa.string()),
                     "is_sitemap": pa.array(flags, pa.bool_())})


def discover_sitemap_seeds(hosts: list[str], fetcher, scheme: str = "http",
                           max_depth: int = 3) -> tuple[list[str], dict]:
    """Full production seed discovery: fetch each host's robots.txt,
    collect its non-group ``Sitemap:`` records (sitemaps.org), fetch those
    sitemaps through the SAME fetcher — following ``<sitemapindex>``
    recursion breadth-first up to ``max_depth`` rounds, one batched fetch
    per round — and return ``(seed_urls, robots_rules)`` so the caller
    seeds the frontier and keeps the politeness rules it already paid to
    fetch.  ``fetcher`` is any HttpFetcher-contract batch stage; failed or
    unparseable sitemap fetches are skipped exactly like
    ``sitemap_seed_urls`` (a real crawler logs and moves on).

    Scale shape: like fetch_robots, this runs inside the per-shard
    host-discovery pass (hosts arrive already sharded) — rounds are
    batched fetches, never a driver loop over individual URLs."""
    from monocator_ray.state.robots import fetch_robots

    rules = fetch_robots(hosts, fetcher, scheme)
    roots: list[str] = []
    for h in hosts:
        for sm in getattr(rules.get(h), "sitemaps", []):
            if sm not in roots:
                roots.append(sm)

    parsed: dict[str, tuple[list[str], list[str]]] = {}
    frontier = list(roots)
    for _ in range(max_depth):
        # dedup within the round too: two indexes referencing the same
        # child in one round must not fetch it twice
        need, seen_round = [], set()
        for u in frontier:
            if u not in parsed and u not in seen_round:
                need.append(u)
                seen_round.add(u)
        if not need:
            break
        got = fetcher(pa.table({"url": pa.array(need, pa.string())}))
        children: list[str] = []
        for u, body, status in zip(need, got["html"].to_pylist(),
                                   got["fetch_status"].to_pylist()):
            if not (200 <= status < 300 and body):
                continue
            try:
                parsed[u] = parse_sitemap(body)
            except ValueError:
                continue  # not a sitemap: don't feed the resolver
            children.extend(k for k in parsed[u][1] if k not in parsed)
        frontier = children
    return _resolve_seed_urls(parsed, roots, max_depth), rules
