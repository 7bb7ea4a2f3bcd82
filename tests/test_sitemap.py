"""Sitemap ingestion (sources/sitemap.py + the seed-file auto-detect)."""

import gzip

import pyarrow as pa
import pytest

from monocator_ray.sources.sitemap import (
    parse_sitemap, sitemap_seed_urls, sitemap_urls_batch,
)

_URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.example/p1</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>http://a.example/p2</loc></url>
  <url><loc> http://a.example/p3 </loc></url>
</urlset>"""

_INDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.example/sm1.xml</loc></sitemap>
  <sitemap><loc>http://a.example/sm2.xml.gz</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_index_text_and_gzip():
    pages, kids = parse_sitemap(_URLSET)
    assert pages == ["http://a.example/p1", "http://a.example/p2",
                     "http://a.example/p3"] and kids == []
    pages, kids = parse_sitemap(_INDEX)
    assert pages == [] and kids == ["http://a.example/sm1.xml",
                                    "http://a.example/sm2.xml.gz"]
    # gzip by magic, regardless of name
    pages, _ = parse_sitemap(gzip.compress(_URLSET))
    assert len(pages) == 3
    # plain-text sitemap
    pages, kids = parse_sitemap(b"http://t.example/a\n# not a url\nhttp://t.example/b\n")
    assert pages == ["http://t.example/a", "http://t.example/b"] and kids == []
    with pytest.raises(ValueError):
        parse_sitemap(b"just words, no urls")
    with pytest.raises(ValueError):
        parse_sitemap(b"<html><body>404</body></html>")
    with pytest.raises(ValueError):
        parse_sitemap(b"<urlset><url><loc>x</loc>")  # malformed XML


def test_index_recursion_offline_and_dedup():
    payloads = {
        "root": _INDEX,
        "http://a.example/sm1.xml": _URLSET,
        # sm2 fetch "failed" -> skipped; duplicate pages dedup first-seen
        "loop": b"""<sitemapindex><sitemap><loc>loop</loc></sitemap>
                    <sitemap><loc>http://a.example/sm1.xml</loc></sitemap>
                    </sitemapindex>""",
    }
    urls = sitemap_seed_urls(payloads, ["root"])
    assert urls == ["http://a.example/p1", "http://a.example/p2",
                    "http://a.example/p3"]
    # self-referencing index terminates (seen-set + depth bound)
    urls = sitemap_seed_urls(payloads, ["loop"])
    assert len(urls) == 3


def test_sitemap_urls_batch_mapfn():
    batch = pa.table({
        "url": pa.array(["http://a.example/sitemap.xml",
                         "http://b.example/sitemap.xml",
                         "http://c.example/broken.xml"], pa.string()),
        "body": pa.array([_URLSET, _INDEX, b"<html>nope</html>"], pa.binary()),
    })
    out = sitemap_urls_batch(batch)
    rows = out.to_pylist()
    assert [r["url"] for r in rows if not r["is_sitemap"]] == [
        "http://a.example/p1", "http://a.example/p2", "http://a.example/p3"]
    assert [r["url"] for r in rows if r["is_sitemap"]] == [
        "http://a.example/sm1.xml", "http://a.example/sm2.xml.gz"]
    assert all(r["src_sitemap"].startswith("http://") for r in rows)


def test_seed_file_autodetects_sitemaps(tmp_path):
    from monocator_ray.sources.seeds import seed_urls_from_file

    # plain urlset file (content-sniffed, no .xml needed)
    p = tmp_path / "seeds"
    p.write_bytes(_URLSET)
    assert seed_urls_from_file(str(p)) == [
        "http://a.example/p1", "http://a.example/p2", "http://a.example/p3"]
    # gzipped by magic
    pz = tmp_path / "sitemap.xml.gz"
    pz.write_bytes(gzip.compress(_URLSET))
    assert len(seed_urls_from_file(str(pz))) == 3
    # index resolving a LOCAL child beside it
    (tmp_path / "sm1.xml").write_bytes(_URLSET)
    idx = tmp_path / "sitemap.xml"
    idx.write_bytes(_INDEX)  # sm1.xml resolves locally, sm2 missing -> skipped
    assert seed_urls_from_file(str(idx)) == [
        "http://a.example/p1", "http://a.example/p2", "http://a.example/p3"]
    # the existing URL-lines and domain paths still work
    pu = tmp_path / "urls.txt"
    pu.write_text("http://x.example/a\nhttp://x.example/b\n")
    assert seed_urls_from_file(str(pu)) == ["http://x.example/a", "http://x.example/b"]


def test_dtd_and_entity_payloads_rejected():
    """Untrusted-web hardening: a DTD/entity-bearing sitemap (billion-laughs
    shape) is rejected BEFORE the XML parser can expand it."""
    evil = (b'<?xml version="1.0"?><!DOCTYPE a [<!ENTITY b "bb">]>'
            b"<urlset><url><loc>&b;</loc></url></urlset>")
    with pytest.raises(ValueError, match="DTD"):
        parse_sitemap(evil)
    # and through the batch fn it is skipped, not crashed
    batch = pa.table({"url": pa.array(["http://e.example/s.xml"], pa.string()),
                      "body": pa.array([evil], pa.binary())})
    assert sitemap_urls_batch(batch).num_rows == 0


def test_dtd_pushed_past_prefix_window_still_rejected():
    """ADVICE r3 #1: a DOCTYPE shoved deep into the payload by >4KB of
    leading XML comments must still be rejected — the guard scans the
    WHOLE payload, not a prefix window."""
    evil = (b'<?xml version="1.0"?>'
            + b"<!-- " + b"pad " * 2048 + b"-->"  # ~8KB of comment padding
            + b'<!DOCTYPE a [<!ENTITY b "bb">]>'
            b"<urlset><url><loc>&b;</loc></url></urlset>")
    with pytest.raises(ValueError, match="DTD"):
        parse_sitemap(evil)


def test_robots_sitemap_records_collected_file_wide():
    from monocator_ray.state.robots import parse_robots

    r = parse_robots(
        """
        User-agent: googlebot
        Sitemap: http://a.example/sm-a.xml
        User-agent: *
        Disallow: /private
        Sitemap: http://a.example/sm-b.xml.gz
        """
    )
    # non-group records: both collected, regardless of agent group; and
    # the Sitemap line ENDED the googlebot header, so Disallow applies
    # to the '*' group that follows it
    assert r.sitemaps == ["http://a.example/sm-a.xml",
                          "http://a.example/sm-b.xml.gz"]
    assert r.disallow == ["/private"]


def test_discover_sitemap_seeds_end_to_end():
    """robots.txt -> Sitemap records -> index recursion, through a fake
    HttpFetcher-contract stage (batched rounds, no per-URL driver loop)."""
    from monocator_ray.sources.sitemap import discover_sitemap_seeds

    pages = {
        "http://h1.example/robots.txt":
            b"User-agent: *\nDisallow: /private\n"
            b"Sitemap: http://h1.example/index.xml\n",
        "http://h2.example/robots.txt": b"User-agent: *\nDisallow:\n",
        "http://h1.example/index.xml": _INDEX.replace(b"a.example", b"h1.example"),
        "http://h1.example/sm1.xml": _URLSET.replace(b"a.example", b"h1.example"),
        # sm2.xml.gz intentionally missing: failed fetch is tolerated
    }
    calls = []

    def fake_fetcher(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        calls.append(urls)
        body = [pages.get(u) for u in urls]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "html": pa.array(body, pa.binary()),
            "fetch_status": pa.array([200 if b is not None else 404 for b in body],
                                     pa.int32()),
        })

    seeds, rules = discover_sitemap_seeds(["h1.example", "h2.example"], fake_fetcher)
    assert seeds == ["http://h1.example/p1", "http://h1.example/p2",
                     "http://h1.example/p3"]
    assert rules["h1.example"].disallow == ["/private"]
    assert rules["h2.example"].sitemaps == []
    # batched rounds: robots batch, then index root, then its children
    assert calls[0] == ["http://h1.example/robots.txt",
                        "http://h2.example/robots.txt"]
    assert calls[1] == ["http://h1.example/index.xml"]
    assert sorted(calls[2]) == ["http://h1.example/sm1.xml",
                                "http://h1.example/sm2.xml.gz"]
