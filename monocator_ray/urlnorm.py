"""URL canonicalization (SURVEY.md §2 M1) — the single canonical form that
feeds the seen-set ("canonicalized-URL 64-bit hashes", BASELINE.json).

Rules (idempotent — property-tested in tests/test_urlnorm.py):
  * strip surrounding whitespace
  * scheme lowercased; only http/https survive downstream filters
  * host lowercased, IDNA-encoded if non-ASCII, trailing dot stripped
  * default port stripped (http:80, https:443)
  * path: dot-segments resolved (./, ../), empty path -> "/",
    percent-encoding normalized (unreserved chars decoded, hex uppercased,
    stray '%' escaped)
  * query kept (order preserved — reordering would change server semantics),
    percent-normalized
  * fragment dropped

Per-row Python in a vectorized wrapper: canonicalization is string surgery on
short strings (~1-2 us/url) and runs only on the link-emission path, which is
dwarfed by HTML parsing.  A fast-path regex skips already-canonical URLs
(the common case inside a crawl, since we only ever emit canonical forms).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import numpy as np

_UNRESERVED = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")
_HEX = "0123456789ABCDEF"

# Canonical already: lowercase scheme+host, no default port, absolute clean path.
_FAST_CANONICAL = re.compile(
    r"^(https?)://"
    r"[a-z0-9]([a-z0-9\-]*[a-z0-9])?(\.[a-z0-9]([a-z0-9\-]*[a-z0-9])?)*"
    r"(:\d+)?"
    r"/[A-Za-z0-9/_\-.~=&?]*$"
)
_FAST_BAD_BITS = re.compile(r"%|#|//.*//|/\.\.?(/|$)|:80/|:80$|:443/|:443$|\?.*\?")


def _pct_normalize(s: str) -> str:
    """Decode unreserved %XX, uppercase the rest, escape stray '%'."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            if i + 2 < n and s[i + 1] in "0123456789abcdefABCDEF" and s[i + 2] in "0123456789abcdefABCDEF":
                byte = int(s[i + 1 : i + 3], 16)
                ch = chr(byte)
                if ch in _UNRESERVED:
                    out.append(ch)
                else:
                    out.append("%" + _HEX[byte >> 4] + _HEX[byte & 0xF])
                i += 3
                continue
            out.append("%25")  # stray percent
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _resolve_dots(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if "." not in path:
        return path
    segments = path.split("/")
    out: list[str] = []
    for seg in segments:
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # preserve trailing slash semantics of "." / ".."
    if segments and segments[-1] in (".", "..") and (not out or out[-1] != ""):
        out.append("")
    if not out or out[0] != "":
        out.insert(0, "")
    return "/".join(out)


def _canon_host(host: str) -> str:
    host = host.strip().rstrip(".").lower()
    if not host:
        return host
    try:
        host.encode("ascii")
    except UnicodeEncodeError:
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            return ""
    return host


def canonicalize_url(url: str) -> str:
    """Canonical form of one URL; returns "" for unusable/non-http(s) URLs."""
    url = url.strip()
    if not url:
        return ""
    if _FAST_CANONICAL.match(url) and not _FAST_BAD_BITS.search(url):
        return url
    try:
        parts = urlsplit(url)
    except ValueError:
        return ""
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return ""
    host = _canon_host(parts.hostname or "")
    if not host:
        return ""
    port = ""
    try:
        p = parts.port
    except ValueError:
        return ""
    if p is not None and not (scheme == "http" and p == 80) and not (scheme == "https" and p == 443):
        port = f":{p}"
    path = _pct_normalize(_resolve_dots(parts.path or "/"))
    if not path.startswith("/"):
        path = "/" + path
    query = f"?{_pct_normalize(parts.query)}" if parts.query else ""
    return f"{scheme}://{host}{port}{path}{query}"


def host_of(url: str) -> str:
    """Host part of an (assumed canonical) URL — cheap string slice."""
    start = url.find("://")
    if start < 0:
        return ""
    start += 3
    end = len(url)
    for i in range(start, len(url)):
        if url[i] in "/?#:":
            end = i
            break
    return url[start:end]


def registrable_domain(host: str) -> str:
    """Last two DNS labels (no public-suffix list in the sandbox; documented
    approximation — e.g. 'a.b.example.com' -> 'example.com')."""
    parts = host.rsplit(".", 2)
    if len(parts) <= 2:
        return host
    return ".".join(parts[-2:])


def canonicalize_batch(urls) -> np.ndarray:
    """Vectorized wrapper: object ndarray of canonical URLs ('' = drop)."""
    return np.fromiter((canonicalize_url(u) for u in urls), dtype=object, count=len(urls))


def join_url(base: str, href: str) -> str:
    """Absolutize href against base (used by link extraction M6), then
    canonicalize.  Handles <base href> upstream (caller passes effective base).
    """
    href = href.strip()
    if not href or href.startswith("#"):
        return ""
    low = href[:12].lower()
    if low.startswith(("javascript:", "mailto:", "tel:", "data:")):
        return ""
    if "://" in href[:10]:
        return canonicalize_url(href)
    if href.startswith("//"):
        scheme_end = base.find("://")
        scheme = base[:scheme_end] if scheme_end > 0 else "http"
        return canonicalize_url(f"{scheme}:{href}")
    # relative: resolve against base
    scheme_end = base.find("://")
    if scheme_end < 0:
        return ""
    path_start = base.find("/", scheme_end + 3)
    origin = base if path_start < 0 else base[:path_start]
    base_path = "/" if path_start < 0 else base[path_start:]
    q = base_path.find("?")
    if q >= 0:
        base_path = base_path[:q]
    if href.startswith("/"):
        return canonicalize_url(origin + href)
    if href.startswith("?"):
        return canonicalize_url(origin + base_path + href)
    parent = base_path.rsplit("/", 1)[0]
    return canonicalize_url(f"{origin}{parent}/{href}")
