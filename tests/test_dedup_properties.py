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


# ---- content-defined chunking (stages/dedup.cdc_chunks) ----
def _cdc_reference(data: bytes, window=48, min_size=256, avg_size=1024,
                   max_size=4096):
    """Independent pure-Python CDC: byte-at-a-time polynomial rolling hash
    (Horner form), same cut rule — pins the vectorized wraparound math."""
    import hashlib

    from monocator_ray.stages.dedup import _CDC_P

    P, M = int(_CDC_P), (1 << 64) - 1
    n = len(data)
    if n <= min_size:
        return [data[:]] if n else []
    wlen = min(window, n)
    pw_top = pow(P, wlen, 1 << 64)
    # rolling hash of window ending at q (bytes [q-wlen, q)), Horner-style
    h = 0
    cand = []
    for q in range(n):
        h = (h * P + (data[q] + 1)) & M
        if q >= wlen:
            h = (h - (data[q - wlen] + 1) * pw_top) & M
        if q + 1 >= wlen and h & (avg_size - 1) == 0:
            cand.append(q + 1)
    cuts, start, idx = [], 0, 0
    while n - start > min_size:
        limit = min(start + max_size, n)
        while idx < len(cand) and cand[idx] < start + min_size:
            idx += 1
        if idx < len(cand) and cand[idx] < limit:
            cut = cand[idx]
            idx += 1
        elif n - start > max_size:
            cut = start + max_size
        else:
            break
        cuts.append(cut)
        start = cut
    cuts.append(n)
    out, s = [], 0
    for e in cuts:
        out.append(data[s:e])
        s = e
    return out


def test_cdc_chunks_match_bytewise_reference_and_cover():
    from monocator_ray.stages.dedup import cdc_chunks

    rng = np.random.RandomState(7)
    for size in (0, 100, 257, 5000, 40000):
        data = rng.bytes(size)
        starts, lens, hashes = cdc_chunks(data)
        ref = _cdc_reference(data)
        got = [data[s:s + l] for s, l in zip(starts, lens)]
        assert got == ref  # identical boundaries -> identical chunks
        assert int(lens.sum()) == size  # exact cover
        if len(lens) > 1:
            assert lens[:-1].min() >= 256 and lens.max() <= 4096


def test_cdc_shift_resistance_beats_fixed_chunking():
    """THE property CDC exists for: inserting bytes near the front leaves
    most later chunk hashes identical (fixed-size chunking shares none)."""
    from monocator_ray.stages.dedup import cdc_chunks

    rng = np.random.RandomState(11)
    doc = rng.bytes(30000)
    shifted = b"inserted!" + doc
    _s1, _l1, h1 = cdc_chunks(doc)
    _s2, _l2, h2 = cdc_chunks(shifted)
    shared = len(np.intersect1d(h1, h2))
    assert shared >= int(0.8 * len(h1))
    # fixed-size chunking under the same shift shares nothing
    fixed1 = {doc[i:i + 1024] for i in range(0, len(doc), 1024)}
    fixed2 = {shifted[i:i + 1024] for i in range(0, len(shifted), 1024)}
    assert not (fixed1 & fixed2)


def test_cdc_chunk_stats_pipeline_matches_reference(tmp_path, ray_session):
    """q_cdc_chunk_stats == a pure-Python chunk-store simulation, on a
    corpus with a planted shared block across two documents."""
    import hashlib

    import ray.data as rd

    from monocator_ray.pipelines.docs import q_cdc_chunk_stats
    from monocator_ray.stages.dedup import cdc_chunks

    rng = np.random.RandomState(3)
    shared_block = "".join(chr(97 + b % 26) for b in rng.bytes(6000))
    texts = []
    for i in range(20):
        filler = "".join(chr(97 + b % 26) for b in rng.bytes(3000 + 137 * i))
        texts.append(filler + (shared_block if i % 3 == 0 else "") + f" tail {i}")
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    sf = tmp_path / "sf"
    sf.mkdir()
    import pyarrow.parquet as pq
    pq.write_table(tbl, str(sf / "documents.parquet"))

    out = q_cdc_chunk_stats(str(sf)).to_pylist()[0]

    store = {}
    total_chunks = total_bytes = 0
    for s in texts:
        raw = s.encode("utf-8")
        starts, lens, hashes = cdc_chunks(raw)
        total_chunks += len(lens)
        total_bytes += int(lens.sum())
        for h, l in zip(hashes.tolist(), lens.tolist()):
            store[h] = l
    assert out["total_chunks"] == total_chunks
    assert out["distinct_chunks"] == len(store)
    assert out["total_bytes"] == total_bytes
    assert out["dup_bytes"] == total_bytes - sum(store.values())
    # the planted shared block actually deduplicates something
    assert out["dup_bytes"] >= 4000
