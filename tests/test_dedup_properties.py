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


# ---- banded Levenshtein kernel (edit_distance_pairs verify step) ----
def test_banded_levenshtein_matches_reference():
    """Fuzz the vectorized banded DP against the plain O(n*m) reference:
    exact when true distance <= k, the k+1 sentinel otherwise; multibyte
    UTF-8 included (the kernel and DuckDB both work on bytes)."""
    import random

    import numpy as np

    from monocator_ray.stages.dedup import banded_levenshtein, levenshtein_ref

    rng = random.Random(1234)
    alphabet = "abcdefg 中文é"
    pa_, pb_ = [], []
    for _ in range(400):
        a = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 50)))
        b = list(a)
        for _ in range(rng.randrange(0, 8)):
            op = rng.randrange(3)
            p = rng.randrange(len(b)) if b else 0
            if op == 0 and b:
                b[p] = rng.choice(alphabet)
            elif op == 1 and b:
                del b[p]
            else:
                b.insert(p, rng.choice(alphabet))
        if rng.random() < 0.25:
            b = [rng.choice(alphabet) for _ in range(rng.randrange(0, 50))]
        pa_.append(a.encode())
        pb_.append("".join(b).encode())
    want = np.array([levenshtein_ref(a, b) for a, b in zip(pa_, pb_)])
    for k in (0, 1, 4, 16, 32):
        got = banded_levenshtein(pa_, pb_, k)
        exact = want <= k
        assert np.array_equal(got[exact], want[exact]), f"k={k}"
        assert np.all(got[~exact] == k + 1), f"k={k}"


def test_edit_distance_pairs_planted_fixture(tmp_path, ray_session):
    """Planted near-dups (incl. multibyte + cross-length-bucket pairs) --
    engine vs DuckDB levenshtein on the same parquet."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import q_edit_distance_pairs
    from monocator_ray.pipelines.registry import REGISTRY

    base = "the quick brown fox jumps over the lazy dog " * 4
    texts = [
        base,                                   # 0
        base[:-10] + "plus tail!",              # 1: close to 0
        base.replace("quick", "quack"),         # 2: 2 edits from 0
        "中文文档内容 " * 12,                     # 3 multibyte
        "中文文档内容 " * 12 + "x",               # 4: 1 byte edit from 3
        "completely different words entirely " * 5,  # 5 far away
        base + "Z" * 31,                        # 6: crosses a length bucket vs 0
    ]
    langs = ["en", "en", "en", "zh", "zh", "en", "en"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = (
        q_edit_distance_pairs(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    _fn, sql = REGISTRY["edit_distance_pairs"]
    want = con.execute(sql).df().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(want) >= 3  # the plant worked
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_banded_levenshtein_large_docs_promote_lanes():
    """Docs past the int16 lane bound (32 KB+) promote to int32 and stay
    exact; int32 histograms don't wrap on them (review finding r2f)."""
    import numpy as np

    from monocator_ray.stages.dedup import (
        banded_levenshtein,
        byte_histogram_l1_bound,
        hist_l1_filter,
    )

    a = b"x" * 40000
    b = a + b"yyyy"
    c = b"z" * 40000
    assert banded_levenshtein([a, a, a], [b, c, a], 32).tolist() == [4, 33, 0]
    h = byte_histogram_l1_bound([a, b, c])
    assert h.dtype == np.int32 and h[0, ord("x")] == 40000
    keep = hist_l1_filter(h, np.array([0, 0]), np.array([1, 2]), 64)
    assert keep.tolist() == [True, False]
