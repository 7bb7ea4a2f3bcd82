"""SURVEY.md §5.2 item 6: first-wins dedup must be invariant under input
permutation (the parallelism-invariance property the crawl relies on)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from monocator_ray.stages.filters import first_wins_dedup


def _table(rows):
    return pa.table(
        {
            "url": pa.array([r[4] for r in rows], pa.string()),
            "url_hash": pa.array([r[3] for r in rows], pa.uint64()),
            "host": pa.array(["h"] * len(rows), pa.string()),
            "host_hash": pa.array([r[1] for r in rows], pa.uint64()),
            "depth": pa.array([r[0] for r in rows], pa.int32()),
            "discovery_time": pa.array([r[2] for r in rows], pa.int64()),
            "parent_url_hash": pa.array([0] * len(rows), pa.uint64()),
        }
    )


_row = st.tuples(
    st.integers(0, 3),           # depth
    st.integers(0, 2),           # host_hash (small -> collisions)
    st.integers(0, 100),         # discovery_time
    st.integers(0, 5),           # url_hash (small -> many dups)
    st.just("http://h/x"),
)


@given(st.lists(_row, min_size=1, max_size=40), st.randoms())
@settings(max_examples=150, deadline=None)
def test_first_wins_invariant_under_permutation(rows, rnd):
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    a = first_wins_dedup(_table(rows))
    b = first_wins_dedup(_table(shuffled))
    assert a.equals(b)
    # one row per url_hash, and it is the min-key row
    uh = a["url_hash"].to_pylist()
    assert len(uh) == len(set(uh))
    by_hash = {}
    for r in rows:
        key = (r[0], r[1], r[2], r[3])
        if r[3] not in by_hash or key < by_hash[r[3]]:
            by_hash[r[3]] = key
    got = {
        h: (d, hh, dt, h)
        for h, d, hh, dt in zip(uh, a["depth"].to_pylist(), a["host_hash"].to_pylist(), a["discovery_time"].to_pylist())
    }
    assert got == {h: k for h, k in by_hash.items()}


def test_seeds_file_roundtrip(tmp_path, ray_session):
    from monocator_ray.sources.seeds import read_seeds, requests_to_seed_urls

    f = tmp_path / "seeds.txt"
    f.write_text("example.com\nother.example\n\nexample.com\n")
    reqs = read_seeds(str(f)).to_pandas()
    # block order is not guaranteed by read_text; content is
    assert sorted(reqs["domain"]) == ["example.com", "example.com", "other.example"]
    assert reqs["web_enabled"].all()
    import pyarrow as pa

    urls = requests_to_seed_urls(pa.Table.from_pandas(reqs))
    assert sorted(set(urls)) == ["http://example.com/", "http://other.example/"]


def test_export_pages(tmp_path, ray_session):
    from monocator_ray.crawl.driver import CrawlConfig, crawl, export_pages
    from monocator_ray.schemas import PAGES
    from monocator_ray.sources.synth import SynthSpec, write_synth_pages

    d = tmp_path / "web"
    write_synth_pages(str(d), 120, 5, 2, use_ray=False)
    spec = SynthSpec(120, 5)
    cfg = CrawlConfig(num_shards=2, budget_per_epoch=64, max_depth=3, link_cap=8,
                      num_buckets=2, fetch_concurrency=2, extract_concurrency=2)
    crawl(spec.seeds(5), str(d), str(tmp_path / "out"), cfg)
    export_pages(str(tmp_path / "out"), str(tmp_path / "pages"))
    import pyarrow.parquet as pq

    t = pq.read_table(str(tmp_path / "pages"))
    assert t.schema.names == PAGES.names
    assert t.num_rows > 0
    assert all(x for x in t["text"].to_pylist()[:5])  # engine filled text
