"""Golden-file byte-identity tests for the text extractor (SPEC invariant)
plus engine-vs-oracle agreement on generated HTML (SURVEY.md §5.2)."""

import pathlib

from hypothesis import given, settings
from hypothesis import strategies as st

from monocator_ray.html.textex import extract_page, sniff_decode
from tests.oracle.jsoup_text import jsoup_text

HERE = pathlib.Path(__file__).parent
HTML_DIR = HERE / "fixtures" / "html"
GOLD_DIR = HERE / "fixtures" / "golden"


def test_golden_corpus_byte_identity():
    cases = sorted(HTML_DIR.glob("*.html"))
    assert len(cases) >= 10
    for f in cases:
        golden = (GOLD_DIR / (f.stem + ".txt")).read_bytes()
        got = extract_page(f.read_bytes()).text.encode("utf-8")
        assert got == golden, f"byte mismatch for {f.name}"


def test_links_title_meta_extraction():
    ex = extract_page((HTML_DIR / "base_href_relative.html").read_bytes())
    assert ex.base_href == "http://example.com/sub/dir/"
    assert ex.links == [
        "page.html",
        "../up.html",
        "/root.html",
        "//other.example/x",
        "https://full.example/y",
    ]
    ex2 = extract_page((HTML_DIR / "empty_body.html").read_bytes())
    assert ex2.title == "only title"
    assert ex2.text == ""


def test_charset_sniffing():
    assert sniff_decode("abc".encode("utf-8")) == "abc"
    assert "café" in sniff_decode(
        b'<meta charset="iso-8859-1"><p>caf\xe9</p>'
    )
    body = "<p>hi</p>".encode("utf-16-le")
    assert "hi" in sniff_decode(b"\xff\xfe" + body)
    # undecodable bytes -> U+FFFD, never an exception
    assert "�" in sniff_decode(b"<p>\xff\xfe\xfa bad</p>"[2:] + b"\xff")


# -- generated-HTML agreement: two independent implementations of the
#    written contract must agree on arbitrary tag soup --

_tag = st.sampled_from(
    ["p", "div", "span", "b", "i", "li", "ul", "br", "script", "style",
     "td", "tr", "table", "h1", "a", "em", "noscript", "section"]
)
_text = st.text(
    alphabet=st.characters(blacklist_characters="<>&", blacklist_categories=("Cs",)),
    max_size=30,
)
# Entity fragments, deliberately including SPLIT and MALFORMED pieces: when
# adjacent data segments are separated only by a tag, per-segment decoding
# must NOT merge them into one entity (the batched-unescape sentinel relies
# on exactly this; see textex._unescape_joined).
_entity_bits = st.sampled_from(
    ["&amp;", "&amp", "&am", "p;", "&#38;", "&#x26;", "&#x2", "6;", "&nbsp;",
     "&nb", "sp;", "&notareal;", "&", "&#", "&#0;", "&#xD800;", "&lt", ";",
     "&Tab;", "&" + "a" * 40 + ";", "&aacute", "x&y", "&#1114112;"]
)
_textent = st.one_of(_text, _entity_bits)


@st.composite
def html_soup(draw):
    n = draw(st.integers(1, 30))
    parts = ["<html><body>"]
    open_tags = []
    for _ in range(n):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(_textent))
        elif kind == 1:
            t = draw(_tag)
            parts.append(f"<{t}>")
            if t not in ("br",):
                open_tags.append(t)
        elif kind == 2 and open_tags:
            parts.append(f"</{open_tags.pop()}>")
        else:
            parts.append("<!-- c -->")
    for t in reversed(open_tags):
        parts.append(f"</{t}>")
    parts.append("</body></html>")
    return "".join(parts)


@given(html_soup())
@settings(max_examples=200, deadline=None)
def test_engine_matches_oracle_on_generated_html(doc):
    assert extract_page(doc).text == jsoup_text(doc)


@given(st.text(alphabet=" \t\n\r\f\xa0xy \x0b", max_size=60))
@settings(max_examples=300, deadline=None)
def test_ws_fix_equals_ws_run(s):
    """The collapse-only-what-changes pattern must be byte-identical to the
    plain run collapse (incl. on \\x0b and unicode spaces OUTSIDE the class)."""
    from monocator_ray.html.textex import _WS_FIX, _WS_RUN

    assert _WS_FIX.sub(" ", s) == _WS_RUN.sub(" ", s)


def test_split_and_malformed_entities_stay_per_segment():
    """Entities split by a tag must decode per data segment (html.parser
    semantics), and a NUL in the document must not corrupt batched decode."""
    from monocator_ray.html.textex import extract_page_htmlparser

    cases = [
        "<p>&am<span></span>p;</p>",      # split name: no merge
        "<p>&amp<span></span>x</p>",      # prefix decode + remainder
        "<p>&<span></span>#38;</p>",      # split numeric introducer
        "<p>&#3<span></span>8;</p>",      # split digits
        "<p>&amp</p>",                     # bare known name, no semicolon
        "<p>&#0;&#xD800;&#1114112;</p>",  # invalid charrefs
        "<p>a\x00b &amp; c</p>",          # NUL in doc -> fallback path
        "<title>&am</title><p>&amp;</p>", # title segments too
    ]
    for doc in cases:
        a, b = extract_page(doc), extract_page_htmlparser(doc)
        assert (a.text, a.title) == (b.text, b.title), doc


@given(st.binary(max_size=200))
@settings(max_examples=100, deadline=None)
def test_extractor_never_raises_on_garbage(data):
    extract_page(data)  # must not raise


@given(html_soup())
@settings(max_examples=200, deadline=None)
def test_fast_scanner_matches_htmlparser_engine(doc):
    from monocator_ray.html.textex import extract_page_htmlparser

    a = extract_page(doc)
    b = extract_page_htmlparser(doc)
    assert (a.text, a.title, a.links) == (b.text, b.title, b.links)


def test_rel_nofollow_links_are_not_followed():
    """rel=nofollow/sponsored/ugc hrefs land in .nofollow, not .links, in
    BOTH engines (the crawl frontier feeds only from .links)."""
    from monocator_ray.html.textex import extract_page, extract_page_htmlparser

    doc = (b'<html><body><a href="/f1">x</a>'
           b'<a rel="nofollow" href="/n1">y</a>'
           b'<a href="/n2" rel="ugc sponsored">z</a>'
           b'<a rel="noopener" href="/f2">w</a>'
           b'<area href="/n3" rel="NOFOLLOW">'
           b'<a rel="nofollow">no href</a></body></html>')
    for fn in (extract_page, extract_page_htmlparser):
        e = fn(doc)
        assert e.links == ["/f1", "/f2"], fn.__name__
        assert e.nofollow == ["/n1", "/n2", "/n3"], fn.__name__
