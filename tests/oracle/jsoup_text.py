"""Spec oracle for jsoup-equivalent visible-text extraction (SURVEY.md §5.2).

A deliberately naive, obviously-correct, character-at-a-time implementation of
the text contract documented in monocator_ray/html/textex.py (rules 1-5).
Because the reference checkout is a stub with no buildable code (SURVEY.md
§0), golden files are generated from THIS oracle, hand-reviewed, and
committed; the engine must match them byte-for-byte.

This module is never imported by the engine — it exists only so tests can
check two independent implementations of the same written contract against
each other on arbitrary input (hypothesis) and on the committed corpus.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

WHITESPACE = {" ", "\t", "\n", "\r", "\f", "\xa0"}

BLOCK_TAGS = frozenset(
    """html body frameset noframes section nav aside hgroup header footer p
    h1 h2 h3 h4 h5 h6 ul ol pre div blockquote hr address figure figcaption
    form fieldset ins del dl dt dd li table caption thead tfoot tbody colgroup
    col tr th td video audio canvas details menu article main center dir
    summary plaintext listing marquee applet svg math title meta link
    """.split()
)

SKIP_TAGS = frozenset({"script", "style", "template", "noscript", "head"})

_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([A-Za-z0-9_\-]+)""", re.IGNORECASE
)


def decode(html: bytes) -> str:
    """Contract rule 1, naive restatement."""
    if html.startswith(b"\xef\xbb\xbf"):
        return html[3:].decode("utf-8", errors="replace")
    if html.startswith(b"\xff\xfe"):
        return html.decode("utf-16-le", errors="replace").lstrip("﻿")
    if html.startswith(b"\xfe\xff"):
        return html.decode("utf-16-be", errors="replace").lstrip("﻿")
    m = _META_CHARSET.search(html[:1024])
    if m:
        try:
            return html.decode(m.group(1).decode("ascii"), errors="replace")
        except (LookupError, ValueError):
            pass
    return html.decode("utf-8", errors="replace")


class _OracleParser(HTMLParser):
    """Emits (kind, payload) events; all text logic lives in jsoup_text()."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.events: list[tuple[str, str]] = []

    def handle_starttag(self, tag, attrs):
        self.events.append(("start", tag))

    def handle_endtag(self, tag):
        self.events.append(("end", tag))

    def handle_startendtag(self, tag, attrs):
        self.events.append(("start", tag))
        self.events.append(("end", tag))

    def handle_data(self, data):
        self.events.append(("data", data))


def jsoup_text(html: bytes | str) -> str:
    """Visible text of `html` per the written contract, char by char."""
    doc = decode(html) if isinstance(html, (bytes, bytearray)) else html
    parser = _OracleParser()
    try:
        parser.feed(doc)
        parser.close()
    except Exception:
        pass
    acc: list[str] = []
    skip_depth = 0

    def append_space_if_needed() -> None:
        if acc and acc[-1] != " ":
            acc.append(" ")

    for kind, payload in parser.events:
        if kind == "start":
            if payload in SKIP_TAGS:
                skip_depth += 1
            if payload in BLOCK_TAGS or payload == "br":
                append_space_if_needed()
        elif kind == "end":
            if payload in SKIP_TAGS and skip_depth > 0:
                skip_depth -= 1
            if payload in BLOCK_TAGS:
                append_space_if_needed()
        else:  # data
            if skip_depth:
                continue
            for ch in payload:
                if ch in WHITESPACE:
                    # rule 2: single space, never leading, never doubled
                    if acc and acc[-1] != " ":
                        acc.append(" ")
                else:
                    acc.append(ch)
    return "".join(acc).strip(" ")
