"""Report layer (§3.3), HLL sketch (G6), Stage protocol (§2.10),
per-request host caps + visit() entry point (§3.2)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from monocator_ray.state.hll import HLL


def test_hll_accuracy_and_merge():
    from monocator_ray.hashing import hash_str64

    # HLL assumes uniform 64-bit hashes — use the engine's real hash fn
    a = hash_str64([f"url-a-{i}" for i in range(50_000)])
    b = hash_str64([f"url-b-{i}" for i in range(50_000)])
    h1, h2 = HLL(12), HLL(12)
    h1.add_hashes(a)
    h2.add_hashes(b)
    est1 = h1.estimate()
    assert abs(est1 - 50_000) / 50_000 < 0.05
    h1.merge(h2)
    est = h1.estimate()
    true = len(set(a.tolist()) | set(b.tolist()))
    assert abs(est - true) / true < 0.05
    # serialization roundtrip
    assert abs(HLL.loads(h1.dumps()).estimate() - est) < 1e-9


def test_hll_small_range():
    from monocator_ray.hashing import hash_str64

    h = HLL(12)
    h.add_hashes(hash_str64([f"u{i}" for i in range(100)]))
    assert abs(h.estimate() - 100) < 5


@pytest.mark.usefixtures("ray_session")
def test_stage_protocol_pipeline():
    import ray.data as rd

    from monocator_ray.shipping import ensure_shipped
    from monocator_ray.stages.base import MapBatchesStage, build_pipeline

    ensure_shipped()

    def double(t: pa.Table) -> pa.Table:
        return t.set_column(0, "id", pa.compute.multiply(t["id"], pa.scalar(2)))

    def add_flag(t: pa.Table) -> pa.Table:
        return t.append_column("flagged", pa.array([True] * t.num_rows))

    ds = rd.range(10)
    stages = [
        MapBatchesStage(name="double", fn=double),
        MapBatchesStage(name="vat", fn=add_flag, enabled_flag="vat_enabled"),
    ]
    # vat disabled -> stage skipped (module dispatch semantics)
    out = build_pipeline(ds, stages, {"vat_enabled": False}).take_all()
    assert sorted(r["id"] for r in out) == list(range(0, 20, 2))
    assert "flagged" not in out[0]
    out2 = build_pipeline(rd.range(4), stages, {"vat_enabled": True}).take_all()
    assert out2[0]["flagged"] is True or out2[0]["flagged"] == True  # noqa: E712


@pytest.fixture(scope="module")
def mini_crawl(tmp_path_factory):
    """One small crawl reused by the report-layer tests."""
    import ray

    from monocator_ray.crawl.driver import CrawlConfig, crawl
    from monocator_ray.sources.synth import SynthSpec, write_synth_pages

    d = tmp_path_factory.mktemp("web")
    out = tmp_path_factory.mktemp("out")
    write_synth_pages(str(d), 300, 10, 4, use_ray=False)
    spec = SynthSpec(300, 10)
    cfg = CrawlConfig(num_shards=2, budget_per_epoch=128, max_depth=4, link_cap=16,
                      num_buckets=4, fetch_concurrency=2, extract_concurrency=2)
    crawl(spec.seeds(10), str(d), str(out), cfg)
    return str(out)


@pytest.mark.usefixtures("ray_session")
def test_report_layer(mini_crawl):
    from monocator_ray import report
    from monocator_ray.crawl.driver import read_visit_log

    vl = read_visit_log(mini_crawl)
    stats = report.crawl_stats(mini_crawl).to_pandas()
    assert stats["fetched"].sum() == vl.num_rows
    assert (stats["ok"] + stats["errors"] == stats["fetched"]).all()

    hist = report.depth_histogram(mini_crawl).to_pandas()
    assert hist["n"].sum() == vl.num_rows

    hot = report.hot_hosts(mini_crawl, k=3).to_pandas()
    assert len(hot) == 3 and hot["n"].is_monotonic_decreasing

    est = report.approx_distinct_urls(mini_crawl)
    true = len(set(vl["url_hash"].to_pylist()))
    assert abs(est - true) / true < 0.1

    dd = report.content_dedup(mini_crawl).to_pandas()
    assert dd["n_pages"].sum() == sum(1 for s in vl["fetch_status"].to_pylist() if s == 200)

    roll = report.domain_rollup(mini_crawl).to_pandas()
    assert roll["n_pages"].sum() == vl.num_rows
    assert (roll[roll["vat_found"]]["vat_number"].str.startswith("BE")).all()

    assert report.seen_except_frontier(mini_crawl) == 0


@pytest.mark.usefixtures("ray_session")
def test_pages_source_roundtrip(mini_crawl, tmp_path):
    """S1/S3: export -> read_pages -> fill_text end-to-end slice."""
    from monocator_ray.crawl.driver import export_pages
    from monocator_ray.sources.pages import fill_text, read_pages, write_pages

    dest = tmp_path / "pages"
    export_pages(mini_crawl, str(dest))
    ds = read_pages(str(dest))
    assert ds.count() > 0
    # prune at the read: only url column leaves storage
    urls = read_pages(str(dest), columns=["url"]).take(3)
    assert all(r["url"].startswith("http://") for r in urls)
    out = tmp_path / "pages2"
    write_pages(fill_text(read_pages(str(dest))), str(out))
    import pyarrow.parquet as pq

    t = pq.read_table(str(out))
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]


def test_keyed_cache():
    from monocator_ray.state.robots import KeyedCache

    calls = []
    c = KeyedCache(ttl_epochs=2)
    assert c.find_or_compute("a", lambda k: calls.append(k) or 1, epoch=0) == 1
    assert c.find_or_compute("a", lambda k: calls.append(k) or 2, epoch=1) == 1
    assert calls == ["a"]
    # TTL expiry on virtual epoch time
    assert c.find_or_compute("a", lambda k: calls.append(k) or 3, epoch=5) == 3
    assert calls == ["a", "a"]


@pytest.mark.usefixtures("ray_session")
def test_visits_join_requests(mini_crawl):
    import pyarrow as pa

    from monocator_ray.report import visits_join_requests
    from monocator_ray.sources.seeds import default_request

    reqs = pa.Table.from_pylist([default_request(f"host{i}.example") for i in range(10)])
    out = visits_join_requests(mini_crawl, reqs).to_pandas()
    assert "web_max_pages" in out.columns
    assert out["web_enabled"].notna().all()


@pytest.mark.usefixtures("ray_session")
def test_visit_single_domain_with_cap(tmp_path):
    """Entry point 2: visit() caps fetches at web_max_pages for the domain
    (reference VisitRequest web.max_pages, TODO.MD:61) — matches the sim."""
    import numpy as np

    from monocator_ray.crawl.driver import CrawlConfig, read_visit_log, visit
    from monocator_ray.sources.synth import SynthSpec, write_synth_pages
    from tests.oracle.crawl_sim import SimConfig, simulate

    d = tmp_path / "web"
    write_synth_pages(str(d), 200, 6, 4, use_ray=False)
    spec = SynthSpec(200, 6)
    cfg = CrawlConfig(num_shards=2, budget_per_epoch=32, max_depth=6, link_cap=16,
                      num_buckets=4, fetch_concurrency=2, extract_concurrency=2)
    visit("host0.example", str(d), str(tmp_path / "out"), cfg, max_pages=5)
    vl = read_visit_log(str(tmp_path / "out"))
    host0 = [u for u in vl["url"].to_pylist() if "host0" in u]
    assert len(host0) <= 5

    tbl = spec.batch(np.arange(200))
    web = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    sim = simulate(["http://host0.example/"], web,
                   SimConfig(budget_per_epoch=32, max_depth=6, link_cap=16,
                             host_caps={"host0.example": 5}))
    assert vl.num_rows == len(sim.visit_log)
    assert vl["url"].to_pylist() == [r[1] for r in sim.visit_log]


def test_crawl_corpus_bridge():
    """The crawl pages artifact feeds the curation pipeline end to end:
    every kept row passes the token gate, doc_id is the url-hash identity,
    and the kept set is within the fetched set."""
    from monocator_ray.pipelines.registry import q_crawl_corpus, q_crawl_flagship

    vl = q_crawl_flagship("/root/testdata/sf0.001")
    fetched = vl.num_rows
    df = q_crawl_corpus("/root/testdata/sf0.001").to_pandas()
    assert 0 < len(df) <= fetched
    assert set(df.columns) == {"doc_id", "lang_pred", "n_tokens"}
    assert (df["n_tokens"] >= 10).all()
    assert df["doc_id"].is_unique


def test_anchor_texts_on_planted_pages():
    """Planted anchors pin resolution (relative hrefs against the page URL,
    canonicalization), tag stripping, entity decode, mode + ties."""
    import ray.data as rd

    from monocator_ray.report import anchor_texts_from_pages

    pages = pa.table(
        {
            "url": pa.array(
                [
                    "http://a.test/p1",
                    "http://a.test/p2",
                    "http://b.test/x",
                ],
                pa.string(),
            ),
            "html": pa.array(
                [
                    b'<html><body>'
                    b'<a href="/t">Home&amp;Start</a>'
                    b'<a href="http://b.test/x">click <b>here</b></a>'
                    b"</body></html>",
                    b'<a href="http://a.test/t">Home&amp;Start</a>'
                    b'<a href="http://a.test/t">other\n  text</a>'
                    b'<a href="http://b.test/x">click here</a>',
                    b'<a href="http://a.test/t">aaa</a>'
                    b'<a href="http://a.test/t">other text</a>',
                ],
                pa.binary(),
            ),
        }
    )
    out = (
        anchor_texts_from_pages(rd.from_arrow(pages))
        .to_pandas()
        .set_index("target_url")
    )
    t = out.loc["http://a.test/t"]
    # 4 inbound: Home&Start x2, 'other text' x2 (ws-collapsed), aaa x1 -> 5
    assert int(t["n_anchors"]) == 5
    assert int(t["n_unique_anchors"]) == 3
    # tie 2-2 between 'Home&Start' and 'other text' -> lexicographically first
    assert t["top_anchor"] == "Home&Start"
    b = out.loc["http://b.test/x"]
    assert int(b["n_anchors"]) == 2 and b["top_anchor"] == "click here"


def test_host_pagerank_matches_driver_recompute(mini_crawl):
    """Engine host PageRank == a single-process recompute: same extractor,
    same URL identity, same integer kernel — over the mini crawl's pages."""
    import numpy as np

    from monocator_ray.crawl.driver import artifact_files
    from monocator_ray.hashing import hash_str64
    from monocator_ray.html.textex import extract_page
    from monocator_ray.pipelines.graph import host_pagerank, pagerank_int
    from monocator_ray.urlnorm import canonicalize_url, host_of, join_url

    got = host_pagerank(mini_crawl).to_pandas()

    import pyarrow.parquet as pq

    pairs, names = set(), {}
    for f in artifact_files(mini_crawl):
        t = pq.read_table(f, columns=["url", "html"])
        for url, doc in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            s = host_of(url)
            ex = extract_page(doc or b"")
            base = ex.base_href or url
            for href in ex.links:
                child = canonicalize_url(join_url(base, href))
                d = host_of(child) if child else ""
                if not s or not d or s == d:
                    continue
                ha = int(hash_str64(np.array([s], object))[0].view(np.int64))
                hb = int(hash_str64(np.array([d], object))[0].view(np.int64))
                names[ha], names[hb] = s, d
                pairs.add((ha, hb))
                pairs.add((hb, ha))
    src = np.array([a for a, _ in sorted(pairs)], np.int64)
    dst = np.array([b for _, b in sorted(pairs)], np.int64)
    nodes, r = pagerank_int(src, dst)
    want = sorted(zip((names[int(n)] for n in nodes), map(int, r)))
    assert sorted(zip(got["host"], got["rank_e12"].astype(int))) == want
    assert len(want) > 2


@pytest.mark.usefixtures("ray_session")
def test_seen_except_frontier_detects_planted_orphan(mini_crawl, tmp_path):
    """The ==0 audit must not be vacuous: plant one hash in a seen shard
    that is neither visited nor queued and the sorted-merge must count it
    (pins the VERDICT r2 #6 rewrite's correctness, not just its memory
    shape)."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray import report
    from monocator_ray.crawl.driver import latest_checkpoint

    out = tmp_path / "planted"
    shutil.copytree(mini_crawl, out)
    ckpt = os.path.join(latest_checkpoint(str(out)), "checkpoint")
    shard = next(f for f in sorted(os.listdir(ckpt)) if f.startswith("seen-"))
    p = os.path.join(ckpt, shard)
    t = pq.read_table(p)
    arr = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    planted = np.uint64(0xDEADBEEFDEADBEEF)
    assert planted not in arr
    arr2 = np.sort(np.append(arr, planted))  # shard stays a sorted run
    pq.write_table(pa.table({"url_hash": pa.array(arr2, pa.uint64())}), p)
    assert report.seen_except_frontier(str(out)) == 1


def test_meta_robots_noindex_nofollow():
    """<meta name=robots> page directives: nofollow empties the followable
    link set (counts still report the page's links), noindex sets the
    features flag; both extractor engines agree on meta_robots."""
    import numpy as np
    import pyarrow as pa

    from monocator_ray.html.textex import extract_page, extract_page_htmlparser
    from monocator_ray.stages.extract import ExtractStage

    page_nf = (b'<html><head><meta name="robots" content="NOINDEX, nofollow">'
               b'</head><body><a href="/a">a</a><a href="/b">b</a></body></html>')
    page_ok = b'<html><body><a href="/c">c</a></body></html>'
    for fn in (extract_page, extract_page_htmlparser):
        assert fn(page_nf).meta_robots == "noindex, nofollow", fn.__name__
        assert fn(page_ok).meta_robots == ""

    batch = pa.table({
        "url": pa.array(["http://h1.test/x", "http://h1.test/y"], pa.string()),
        "html": pa.array([page_nf, page_ok], pa.binary()),
        "fetch_status": pa.array(np.array([200, 200], np.int32), pa.int32()),
    })
    out = ExtractStage(link_cap=16, with_vat=False)(batch)
    rows = out.to_pylist()
    assert rows[0]["noindex"] is True and rows[0]["links"] == []
    assert rows[0]["links_internal"] == 2  # counts still observed
    assert rows[1]["noindex"] is False and rows[1]["links"] == ["http://h1.test/c"]

    # rel=nofollow: same counting treatment as meta-robots nofollow —
    # counts observe the anchor, the frontier never gets it
    page_rel = (b'<html><body><a href="/a">a</a>'
                b'<a rel="nofollow" href="http://other.test/x">x</a></body></html>')
    batch2 = pa.table({
        "url": pa.array(["http://h1.test/z"], pa.string()),
        "html": pa.array([page_rel], pa.binary()),
        "fetch_status": pa.array(np.array([200], np.int32), pa.int32()),
    })
    r2 = ExtractStage(link_cap=16, with_vat=False)(batch2).to_pylist()[0]
    assert r2["links"] == ["http://h1.test/a"]  # nofollow not followed
    assert r2["links_internal"] == 1 and r2["links_external"] == 1  # but counted


@pytest.mark.usefixtures("ray_session")
def test_canonical_extraction_and_groups(tmp_path):
    """<link rel=canonical> resolves against the page base and feeds the
    canonical-duplicate rollup (pages sharing a target cluster; pages
    without a declaration are their own target)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray import report
    from monocator_ray.hashing import hash_url64
    from monocator_ray.stages.extract import ExtractStage

    def page(canon=None):
        head = f'<link rel="canonical" href="{canon}">' if canon else ""
        return f"<html><head>{head}</head><body>t</body></html>".encode()

    urls = [f"http://h1.test/p{i}" for i in range(5)]
    htmls = [page("/canon"), page("http://h1.test/canon"), page(), page(), page("/other")]
    batch = pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(htmls, pa.binary()),
        "fetch_status": pa.array(np.array([200] * 5, np.int32), pa.int32()),
    })
    out = ExtractStage(link_cap=8, with_vat=False)(batch)
    canon = out["canonical_url"].to_pylist()
    assert canon[0] == canon[1] == "http://h1.test/canon"  # relative resolved
    assert canon[2] == "" and canon[4] == "http://h1.test/other"

    # write an artifact-shaped dir and run the rollup
    feats = out.append_column(
        "url_hash", pa.array(hash_url64(urls), pa.uint64())
    )
    d = tmp_path / "epoch=0" / "crawl"
    d.mkdir(parents=True)
    pq.write_table(feats, str(d / "part0.parquet"))
    groups = report.canonical_groups(str(tmp_path)).to_pandas()
    assert len(groups) == 1  # only the shared target clusters (>1 page)
    assert groups.iloc[0]["canonical_url"] == "http://h1.test/canon"
    assert groups.iloc[0]["n_pages"] == 2
