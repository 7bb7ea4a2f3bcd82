"""Fused single-pass HTML extractor (SURVEY.md §2 M4-M7): jsoup-equivalent
visible text, out-links, title, meta description, link counts — one parse.

TEXT EXTRACTION CONTRACT (the SPEC byte-identity invariant; BASELINE.json
input_hint).  The reference used jsoup's ``Element.text()`` (reference is a
stub — see SURVEY.md §0 — so the contract is pinned by the spec oracle at
tests/oracle/jsoup_text.py and the committed golden files, generated once and
hand-reviewed).  Rules, exactly:

  1. Bytes are decoded by ``sniff_decode``: UTF-8/16 BOM, else <meta charset>
     within the first 1024 bytes, else UTF-8; undecodable bytes -> U+FFFD.
  2. Whitespace = {space, \\t, \\n, \\r, \\f, NBSP(\\xa0)} (jsoup's
     isActuallyWhitespace set).  Runs collapse to a single ASCII space; a
     space is never emitted at the start of the accumulator or after an
     existing space.
  3. Content of <script> <style> <template> <noscript> and the whole <head>
     subtree is excluded (jsoup excludes DataNodes and comments; excluding
     head/noscript is our documented normalization of "visible text").
  4. Entering or leaving a block-level element, or hitting <br>, inserts one
     space if the accumulator is non-empty and does not already end in space
     (jsoup's appendSpaceIfNeeded on block boundaries).
  5. Result is stripped of leading/trailing spaces.

HTML entities are decoded (html.parser convert_charrefs); &nbsp; therefore
becomes whitespace per rule 2.  Comments never reach the accumulator.

This file is the ENGINE implementation (optimized streaming pass, regex
whitespace collapse).  The oracle at tests/oracle/jsoup_text.py implements
the same contract as a naive character loop and is never imported here.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

# Rule 4: jsoup block-level tags (Tag registry isBlock) + structural extras.
BLOCK_TAGS = frozenset(
    """html body frameset noframes section nav aside hgroup header footer p
    h1 h2 h3 h4 h5 h6 ul ol pre div blockquote hr address figure figcaption
    form fieldset ins del dl dt dd li table caption thead tfoot tbody colgroup
    col tr th td video audio canvas details menu article main center dir
    summary plaintext listing marquee applet svg math title meta link
    """.split()
)

# Rule 3: subtrees whose character data is never visible text.
SKIP_TAGS = frozenset({"script", "style", "template", "noscript", "head"})

# rel tokens a polite crawler does not follow (public convention:
# nofollow original, sponsored/ugc the 2019 refinements)
_NOFOLLOW_RELS = frozenset({"nofollow", "sponsored", "ugc"})

_WS_RUN = re.compile(r"[ \t\n\r\f\xa0]+")
# Collapse-only-what-changes variant: a plain single space (the overwhelming
# majority of whitespace in extracted text) is already in canonical form, and
# matching it makes re.sub rebuild the page string span by span (~0.8 ms/page
# measured).  This pattern matches exactly the runs whose replacement differs
# from themselves: a space followed by more whitespace, or a run starting
# with a non-space whitespace char.  sub(" ") over it is byte-identical to
# _WS_RUN.sub(" ") (property-tested), at ~half the scan cost.
_WS_FIX = re.compile(r" [ \t\n\r\f\xa0]+|[\t\n\r\f\xa0][ \t\n\r\f\xa0]*")
_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.IGNORECASE
)


def sniff_decode(html: bytes) -> str:
    """Contract rule 1: BOM > meta charset (first 1024 bytes) > UTF-8."""
    if html.startswith(b"\xef\xbb\xbf"):
        return html[3:].decode("utf-8", errors="replace")
    if html.startswith(b"\xff\xfe"):
        return html.decode("utf-16-le", errors="replace").lstrip("﻿")
    if html.startswith(b"\xfe\xff"):
        return html.decode("utf-16-be", errors="replace").lstrip("﻿")
    m = _META_CHARSET.search(html[:1024])
    if m:
        enc = m.group(1).decode("ascii", errors="replace")
        try:
            return html.decode(enc, errors="replace")
        except (LookupError, ValueError):
            pass
    return html.decode("utf-8", errors="replace")


@dataclass
class PageExtract:
    text: str = ""
    title: str = ""
    meta_description: str = ""
    meta_robots: str = ""  # raw content of <meta name="robots">, lowercased
    canonical: str = ""  # first <link rel="canonical" href=...>
    base_href: str = ""
    links: list = field(default_factory=list)  # raw href strings, document order
    # rel=nofollow/sponsored/ugc hrefs, kept separate: a polite crawler
    # never FOLLOWS them (the crawl feeds .links to the frontier) but
    # reporting may still count them (public rel-attribute convention)
    nofollow: list = field(default_factory=list)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._acc: list[str] = []
        self._last_space = True  # treat empty accumulator as "ends with space"
        self._skip = 0
        self._in_title = False
        self._title: list[str] = []
        self.out = PageExtract()

    # -- text accumulation (contract rules 2 & 4) --
    def _block_boundary(self) -> None:
        if not self._last_space:
            self._acc.append(" ")
            self._last_space = True

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip += 1
        if tag == "title":
            self._in_title = True
        elif tag == "a" or tag == "area":
            href = rel = None
            for k, v in attrs:
                if k == "href" and href is None:
                    href = v
                elif k == "rel" and rel is None:
                    rel = v
            if href:
                if rel and _NOFOLLOW_RELS & set((rel or "").lower().split()):
                    self.out.nofollow.append(href)
                else:
                    self.out.links.append(href)
        elif tag == "meta":
            a = dict(attrs)
            name = (a.get("name") or "").lower()
            if name == "description":
                self.out.meta_description = a.get("content") or ""
            elif name == "robots" and not self.out.meta_robots:
                self.out.meta_robots = (a.get("content") or "").lower()
        elif tag == "base" and not self.out.base_href:
            self.out.base_href = dict(attrs).get("href") or ""
        elif tag == "link" and not self.out.canonical:
            a = dict(attrs)
            if (a.get("rel") or "").lower().strip() == "canonical":
                self.out.canonical = a.get("href") or ""
        if tag in BLOCK_TAGS or tag == "br":
            self._block_boundary()

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag in SKIP_TAGS:
            self._skip -= 1
        if tag == "title":
            self._in_title = False

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS and self._skip > 0:
            self._skip -= 1
        if tag == "title":
            self._in_title = False
        if tag in BLOCK_TAGS:
            self._block_boundary()

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title.append(data)
        if self._skip:
            return
        norm = _WS_RUN.sub(" ", data)
        if not norm:
            return
        if norm[0] == " " and self._last_space:
            norm = norm[1:]
            if not norm:
                return
        self._acc.append(norm)
        self._last_space = norm[-1] == " "

    def finish(self) -> PageExtract:
        self.out.text = "".join(self._acc).strip(" ")
        self.out.title = _WS_RUN.sub(" ", "".join(self._title)).strip(" ")
        return self.out


def extract_page_htmlparser(html: bytes | str) -> PageExtract:
    """Reference engine path: stdlib html.parser event loop (kept as the
    semantic anchor; the fast scanner below must agree with it)."""
    doc = sniff_decode(html) if isinstance(html, (bytes, bytearray)) else html
    p = _Extractor()
    try:
        p.feed(doc)
        p.close()
    except Exception:
        pass  # salvage whatever was accumulated from malformed input
    return p.finish()


# ---------------------------------------------------------------------------
# Fast scanner: one compiled master regex over the document instead of
# html.parser's per-tag regex machinery (~2-3x on real pages).  Emits the
# exact same event semantics as _Extractor (verified by the golden corpus,
# the hypothesis engine-vs-oracle tests and a synth-page equality test).
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"<!--.*?(?:-->|$)"                                      # comment
    r"|<!(?:[^>]*)(?:>|$)"                                   # doctype/decl
    r"|<\?(?:[^>]*)(?:>|$)"                                  # processing instr
    r"|</\s*([a-zA-Z][a-zA-Z0-9-]*)[^>]*>"                    # end tag
    r"|<([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*?)(/?)>",  # start tag
    re.S,
)
_ATTR = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|[^\s>]*))?"""
)
_RAWTEXT = frozenset({"script", "style"})  # html.parser CDATA_CONTENT_ELEMENTS
_RAW_CLOSE = {t: re.compile("</" + t, re.IGNORECASE) for t in _RAWTEXT}
_ATTR_TAGS = frozenset({"a", "area", "meta", "base", "link"})

from html import unescape as _unescape  # noqa: E402


def _parse_attrs(raw: str) -> dict:
    out = {}
    for m in _ATTR.finditer(raw):
        name = m.group(1).lower()
        if m.group(2) is None:
            val = None
        elif m.group(3) is not None:
            val = m.group(3)
        elif m.group(4) is not None:
            val = m.group(4)
        else:
            val = m.group(2)
        if val and "&" in val:
            val = _unescape(val)
        if name not in out:
            out[name] = val
    return out


# Per-tag dispatch flags: one dict lookup per tag instead of 4-5 frozenset
# membership tests (the scanner sees ~1 tag per 30 bytes of real HTML).
_F_BLOCK, _F_SKIP, _F_ATTR, _F_TITLE, _F_BR, _F_RAW = 1, 2, 4, 8, 16, 32
_TAG_FLAGS: dict[str, int] = {}
for _t in BLOCK_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_BLOCK
for _t in SKIP_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_SKIP
for _t in _ATTR_TAGS:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_ATTR
for _t in _RAWTEXT:
    _TAG_FLAGS[_t] = _TAG_FLAGS.get(_t, 0) | _F_RAW
_TAG_FLAGS["title"] = _TAG_FLAGS.get("title", 0) | _F_TITLE
_TAG_FLAGS["br"] = _TAG_FLAGS.get("br", 0) | _F_BR


def _unescape_joined(segments: list[str]) -> str:
    """Decode HTML entities over a whole page's data segments in ONE
    ``html.unescape`` call while preserving per-segment semantics.

    Segments are joined on a NUL sentinel: NUL is a valid entity-NAME
    character to the charref regex but occurs in no html5 entity name, so a
    candidate spanning two segments can never decode (the longest-known-
    prefix rule then decodes exactly the first segment's prefix and leaves
    the rest — including the sentinel — untouched), and NUL terminates
    numeric/hex digit runs just like a segment boundary.  ``&#0;`` decodes
    to U+FFFD, never to NUL, so stripping sentinels afterwards recovers the
    exact concatenation of per-segment unescapes.  Callers must route
    documents that themselves contain NUL to the per-segment path.
    """
    joined = "\x00".join(segments)
    if "&" in joined:
        joined = _unescape(joined)
    return joined.replace("\x00", "")


def extract_page(html: bytes | str) -> PageExtract:
    """Parse one page; returns text/title/meta/links in a single pass
    (fast scanner; contract identical to extract_page_htmlparser)."""
    doc = sniff_decode(html) if isinstance(html, (bytes, bytearray)) else html
    n = len(doc)
    out = PageExtract()
    # raw accumulation: segments + boundary spaces are concatenated and
    # whitespace-collapsed ONCE at the end — rule 2 is a pure function of
    # the concatenated visible stream, so this is byte-identical to
    # incremental per-segment collapsing (and ~30% faster).  Entities are
    # decoded in one batched pass at the end (_unescape_joined) unless the
    # document itself contains the NUL sentinel (vanishingly rare).
    acc: list[str] = []
    skip = 0
    in_title = False
    title: list[str] = []
    pos = 0
    search = _TOKEN.search
    flags_get = _TAG_FLAGS.get

    while pos < n:
        m = search(doc, pos)
        if m is None:
            seg = doc[pos:]
            if in_title:
                title.append(seg)
            if not skip:
                acc.append(seg)
            break
        start = m.start()
        if start > pos:
            seg = doc[pos:start]
            if in_title:
                title.append(seg)
            if not skip:
                acc.append(seg)
        pos = m.end()
        end_name, start_name, attrs_raw, sc = m.group(1, 2, 3, 4)
        if end_name is not None:  # end tag
            f = flags_get(end_name.lower(), 0)
            if f:
                if f & _F_SKIP and skip > 0:
                    skip -= 1
                if f & _F_TITLE:
                    in_title = False
                if f & _F_BLOCK:
                    acc.append(" ")
            continue
        if start_name is None:
            continue  # comment / doctype / PI
        tag = start_name.lower()
        f = flags_get(tag, 0)
        if not f:
            continue
        selfclose = sc == "/"
        if f & _F_ATTR:
            a = _parse_attrs(attrs_raw)
            if tag == "a" or tag == "area":
                href = a.get("href")
                if href:
                    rel = a.get("rel")
                    if rel and _NOFOLLOW_RELS & set(rel.lower().split()):
                        out.nofollow.append(href)
                    else:
                        out.links.append(href)
            elif tag == "meta":
                name = (a.get("name") or "").lower()
                if name == "description":
                    out.meta_description = a.get("content") or ""
                elif name == "robots" and not out.meta_robots:
                    out.meta_robots = (a.get("content") or "").lower()
            elif tag == "base" and not out.base_href:
                out.base_href = a.get("href") or ""
            elif tag == "link" and not out.canonical:
                if (a.get("rel") or "").lower().strip() == "canonical":
                    out.canonical = a.get("href") or ""
        if f & _F_SKIP:
            if f & _F_RAW and not selfclose:
                # CDATA: skip to the matching close tag without tokenizing
                # (case-insensitive search instead of a full-page .lower()
                # copy — raw-text blocks are rare, page copies are not)
                mraw = _RAW_CLOSE[tag].search(doc, pos)
                if mraw is None:
                    break  # unterminated raw text: rest is invisible data
                gt = doc.find(">", mraw.start())
                if f & _F_BLOCK:
                    acc.append(" ")
                pos = n if gt < 0 else gt + 1
                continue
            if not selfclose:
                skip += 1
        if f & _F_TITLE:
            in_title = not selfclose
        if f & (_F_BLOCK | _F_BR):
            acc.append(" ")

    if "\x00" in doc:  # per-segment fallback: sentinel would be ambiguous
        acc = [_unescape(s) if "&" in s else s for s in acc]
        title = [_unescape(s) if "&" in s else s for s in title]
        text_raw, title_raw = "".join(acc), "".join(title)
    else:
        text_raw, title_raw = _unescape_joined(acc), _unescape_joined(title)
    out.text = _WS_FIX.sub(" ", text_raw).strip(" ")
    out.title = _WS_FIX.sub(" ", title_raw).strip(" ")
    return out
