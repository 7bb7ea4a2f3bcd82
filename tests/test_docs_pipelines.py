"""Dataset-native dedup/ANN pipelines vs their driver-side oracles.

Round-1 shipped these operators with correct sketching but driver-side
candidate verification (to_pandas + dicts / O(n^2) matrices).  Round 2 made
them Dataset-native end to end; each test here re-implements the ORIGINAL
driver-side algorithm inline as the oracle and asserts the distributed
pipeline produces the identical result on the driver tables.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"


def _pdf(res) -> pd.DataFrame:
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.usefixtures("ray_session")
def test_minhash_pairs_match_driver_side_oracle():
    """Banding + Jaccard verify, distributed == the old driver-dict verify."""
    from monocator_ray.pipelines.docs import q_minhash_pairs
    from monocator_ray.stages.dedup import (
        MinHasher,
        explode_bands,
        jaccard,
        shingle_hashes,
    )

    got = _pdf(q_minhash_pairs(SF_DIR))

    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    banded = explode_bands(MinHasher(num_perm=64)(docs.copy()), 16)
    cands = set()
    for (_b, _h), g in banded.groupby(["band_id", "band_hash"]):
        ids = sorted(g["doc_id"].unique().tolist())
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    tmap = dict(zip(docs["doc_id"], docs["text"]))
    want = []
    for a, b in sorted(cands):
        jj = jaccard(shingle_hashes(tmap[a]), shingle_hashes(tmap[b]))
        if jj >= 0.6:
            want.append((a, b, int(round(jj * 100))))
    assert list(map(tuple, got[["doc_a", "doc_b", "jaccard_pct"]].to_numpy())) == want
    assert len(want) > 0  # the fixture actually exercises the verify path


@pytest.mark.usefixtures("ray_session")
def test_simhash_pairs_match_driver_side_oracle():
    from monocator_ray.pipelines.docs import q_simhash_pairs
    from monocator_ray.stages.dedup import SimHasher, hamming64

    got = _pdf(q_simhash_pairs(SF_DIR))

    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    pdf = SimHasher()(docs.copy()).sort_values("doc_id")
    ids = pdf["doc_id"].to_numpy()
    hs = pdf["simhash"].to_numpy().astype(np.uint64)
    cands = set()
    for shift in (0, 16, 32, 48):
        band = ((hs >> np.uint64(shift)) & np.uint64(0xFFFF)).astype(np.int64)
        for v in np.unique(band):
            grp = np.nonzero(band == v)[0]
            for x in range(len(grp)):
                for y in range(x + 1, len(grp)):
                    cands.add((int(grp[x]), int(grp[y])))
    want = []
    for i, j in sorted(cands):
        d = int(hamming64(hs[i : i + 1], hs[j : j + 1])[0])
        if d <= 8:
            want.append((int(ids[i]), int(ids[j]), d))
    want.sort()
    assert list(map(tuple, got[["doc_a", "doc_b", "hamming"]].to_numpy())) == want
    assert len(want) > 0


@pytest.mark.usefixtures("ray_session")
def test_ann_ivf_topk_matches_full_probe_scan():
    """Per-list worker top-k + tiny merge == the old full masked scan."""
    from monocator_ray.pipelines.docs import q_ann_ivf_topk
    from monocator_ray.stages.ann import IvfIndex, _normalize, table_to_matrix

    n_queries, k, nlist, nprobe = 8, 5, 16, 4
    got = _pdf(q_ann_ivf_topk(SF_DIR, n_queries, k, nlist, nprobe))

    full = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    sample = table_to_matrix(full.slice(0, min(2048, full.num_rows)))
    index = IvfIndex.train(sample, nlist=nlist)
    qm = table_to_matrix(full.slice(0, n_queries))
    probes = index.probe_lists(qm, nprobe)
    m = _normalize(table_to_matrix(full))
    lists = index.assign(table_to_matrix(full))
    qn = _normalize(qm)
    ids = full["vec_id"].to_numpy(zero_copy_only=False)
    want = []
    for qi in range(n_queries):
        mask = np.isin(lists, probes[qi])
        sims = m[mask] @ qn[qi]
        cand_ids = ids[mask]
        order = np.lexsort((cand_ids, -sims))[:k]
        for rank, j in enumerate(order):
            want.append((qi, int(cand_ids[j]), rank))
    assert list(map(tuple, got[["query_id", "vec_id", "rank"]].to_numpy())) == want


@pytest.mark.usefixtures("ray_session")
def test_embedding_neardup_matches_all_pairs_matrix():
    """Block-distributed exact pairs == the old O(n^2) driver matrix."""
    from monocator_ray.pipelines.docs import q_embedding_neardup
    from monocator_ray.stages.ann import table_to_matrix

    got = _pdf(q_embedding_neardup(SF_DIR))

    # driver recompute with the SAME quantized-integer bridge the engine
    # (and the DuckDB oracle) use — bit-identical sims by construction
    from monocator_ray.stages.ann import quantize_ints

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    Q = quantize_ints(table_to_matrix(tbl))
    qq = np.einsum("ij,ij->i", Q, Q).astype(np.float64)
    sims = (Q @ Q.T).astype(np.float64) / np.sqrt(qq[:, None] * qq[None, :])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    ii, jj = np.nonzero(np.triu(sims >= 0.45, k=1))
    want = sorted(
        (int(ids[i]), int(ids[j]), int(np.int64(sims[i, j] * 100))) for i, j in zip(ii, jj)
    )
    assert list(map(tuple, got[["vec_a", "vec_b", "sim_pct"]].to_numpy())) == want
    assert len(want) > 0


@pytest.mark.usefixtures("ray_session")
def test_neardup_clusters_match_union_find_over_pairs():
    """Distributed label propagation over the verified pairs == union-find."""
    from monocator_ray.pipelines.docs import q_minhash_pairs, q_neardup_clusters
    from monocator_ray.stages.dedup import connected_components

    pairs = _pdf(q_minhash_pairs(SF_DIR))
    want = connected_components(list(zip(pairs["doc_a"], pairs["doc_b"])))
    got = _pdf(q_neardup_clusters(SF_DIR))
    assert dict(zip(got["doc_id"], got["cluster"])) == want
    assert len(want) > 0


@pytest.mark.usefixtures("ray_session")
def test_ngram_jaccard_matches_brute_force():
    """Inverted-index exact Jaccard == all-pairs set arithmetic over the
    same pinned tokenization (incl. the integer floor-div percentage)."""
    from monocator_ray.pipelines.docs import q_ngram_jaccard_pairs
    from monocator_ray.stages.dedup import ngram_hashes

    got = _pdf(q_ngram_jaccard_pairs(SF_DIR))

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    sets = [set(ngram_hashes(x or "").tolist()) for x in t["text"].to_pylist()]
    rows = []
    for i in range(len(ids)):
        if not sets[i]:
            continue
        for j in range(i + 1, len(ids)):
            c = len(sets[i] & sets[j])
            if c == 0:
                continue
            union = len(sets[i]) + len(sets[j]) - c
            if 2 * c >= union:
                a, b = sorted((ids[i], ids[j]))
                rows.append((a, b, (100 * c) // union))
    want = pd.DataFrame(sorted(rows), columns=["doc_a", "doc_b", "jaccard_pct"])
    assert len(got) > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=False)


def test_ngram_hashes_edges():
    """Tokenization pinned to the DuckDB oracle: ASCII-only trim/split (NBSP
    is NOT whitespace), <n tokens -> empty set, distinct grams only."""
    from monocator_ray.stages.dedup import ngram_hashes

    assert ngram_hashes("").size == 0
    assert ngram_hashes("a b").size == 0  # < 3 tokens
    assert ngram_hashes("  a  b   c  ").size == 1
    # NBSP binds tokens together under RE2 \s semantics (ADVICE r1 class)
    assert ngram_hashes("a\xa0b c d").size == 1  # tokens: 'a\xa0b','c','d'
    assert ngram_hashes("a b c d").size == 2
    # repeated gram counted once
    rep = ngram_hashes("x y z x y z x y z")
    assert rep.size == len(np.unique(rep)) and rep.size == 3  # xyz, yzx, zxy


@pytest.mark.usefixtures("ray_session")
def test_large_path_matches_small_path():
    """The adaptive plans (single-task verify / driver dedup under
    _SMALL_PAIRS candidates vs distributed join + aggregate above it) must
    produce identical rows.  Forcing the threshold to 0 routes the driver
    tables through the 100-TB path."""
    import monocator_ray.pipelines.docs as docs

    small = {
        "minhash": _pdf(docs.q_minhash_pairs(SF_DIR)),
        "simhash": _pdf(docs.q_simhash_pairs(SF_DIR)),
        "emb_lsh": _pdf(docs.q_embedding_neardup_lsh(SF_DIR)),
        "ngram": _pdf(docs.q_ngram_jaccard_pairs(SF_DIR)),
    }
    old = docs._SMALL_PAIRS
    docs._SMALL_PAIRS = 0
    try:
        large = {
            "minhash": _pdf(docs.q_minhash_pairs(SF_DIR)),
            "simhash": _pdf(docs.q_simhash_pairs(SF_DIR)),
            "emb_lsh": _pdf(docs.q_embedding_neardup_lsh(SF_DIR)),
            "ngram": _pdf(docs.q_ngram_jaccard_pairs(SF_DIR)),
        }
    finally:
        docs._SMALL_PAIRS = old
    for name in small:
        pd.testing.assert_frame_equal(
            small[name].reset_index(drop=True), large[name].reset_index(drop=True)
        )
        assert len(small[name]) > 0


@pytest.mark.usefixtures("ray_session")
def test_embedding_neardup_lsh_recall_on_planted_dups(tmp_path):
    """The LSH-bucketed scale path finds every planted high-cosine near-dup
    (recall ~1 at sim>=0.9 with the default bands/bits) and never reports a
    pair the exact method wouldn't (precision 1 by construction: buckets
    only gate candidates; verification is exact cosine)."""
    from monocator_ray.pipelines.docs import q_embedding_neardup_lsh

    rng = np.random.RandomState(3)
    base = rng.normal(size=(120, 32)).astype(np.float32)
    # plant 20 near-dup rows: tiny perturbations of the first 20 vectors
    dups = base[:20] + rng.normal(scale=0.02, size=(20, 32)).astype(np.float32)
    m = np.vstack([base, dups])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(m)), pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = _pdf(q_embedding_neardup_lsh(str(tmp_path), threshold=0.9))

    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = mn @ mn.T
    ii, jj = np.nonzero(np.triu(sims >= 0.9, k=1))
    want = {(int(i), int(j)) for i, j in zip(ii, jj)}
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))
    assert got_pairs <= want  # exact verify: no false positives
    assert len(got_pairs & want) / len(want) >= 0.95  # near-total recall
    assert len(want) >= 20  # the planted dups are in the oracle set


def test_prefix_filtered_jaccard_equals_unfiltered():
    """Prefix filtering is exact at threshold 1/2: the pruned plan must
    produce the identical pair set and percentages on both small tables."""
    from monocator_ray.pipelines.docs import (
        q_ngram_jaccard_pairs,
        q_ngram_jaccard_pairs_prefix,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        full = q_ngram_jaccard_pairs(sf).to_pandas().sort_values(
            ["doc_a", "doc_b"]).reset_index(drop=True)
        pref = q_ngram_jaccard_pairs_prefix(sf).to_pandas().sort_values(
            ["doc_a", "doc_b"]).reset_index(drop=True)
        assert full.values.tolist() == pref.values.tolist(), sf


def test_pack_sequences_oversize_and_budget(tmp_path, ray_session):
    """Planted packing fixture: an oversized doc gets a bin alone, every
    other bin's token sum respects the budget, bins never cross the
    id-space chunk boundary, and the result matches the registry's
    recursive-CTE oracle on the same parquet."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import q_pack_sequences
    from monocator_ray.pipelines.registry import REGISTRY

    texts = {}
    for i in range(60):
        texts[i] = "tok " * (200 if i % 7 else 900)  # mixed sizes
    texts[13] = "tok " * 2000          # oversized: alone in its bin
    texts[300] = "tok " * 100          # second chunk (id 300 // 256 = 1)
    texts[301] = "tok " * 100
    ids = sorted(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i].strip() for i in ids], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = q_pack_sequences(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    _fn, sql = REGISTRY["pack_sequences"]
    want = con.execute(sql).df()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True).astype("int64"),
        want.sort_values("doc_id").reset_index(drop=True).astype("int64"),
    )
    sums = got.groupby("bin_id").agg(tok=("n_tokens", "sum"), n=("doc_id", "count"))
    over = sums[sums.tok > 1024]
    assert (over.n == 1).all(), "multi-doc bin exceeded the budget"
    assert (got[got.doc_id == 13].n_tokens > 1024).all()
    # bins never cross the chunk boundary
    assert (got.bin_id // 2**20 == got.doc_id // 256).all()


def test_knn_graph_full_probe_is_exact(ray_session):
    """knn_graph with nprobe == nlist probes every list, so it must equal
    the brute-force k-NN graph (numpy, same tie rule) exactly."""
    import numpy as np
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import q_knn_graph
    from monocator_ray.stages.ann import _normalize, table_to_matrix

    sf = "/root/testdata/sf0.001"
    k, nlist = 5, 8
    got = (
        q_knn_graph(sf, k=k, nlist=nlist, nprobe=nlist)
        .to_pandas()
        .sort_values(["vec_id", "neighbor_id"])
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = _normalize(table_to_matrix(t)).astype(np.float64)
    sims = m @ m.T
    np.fill_diagonal(sims, -2.0)
    want_rows = []
    for i in range(len(ids)):
        order = np.lexsort((ids, -sims[i]))[:k]
        for j in order:
            want_rows.append((int(ids[i]), int(ids[j])))
    want = sorted(want_rows)
    got_pairs = sorted(zip(got["vec_id"].astype(int), got["neighbor_id"].astype(int)))
    assert got_pairs == want


def test_image_dupes_matches_bruteforce_oracle():
    """max_hamming=3 < 4 bands => the band plan is exact (pigeonhole), so
    the full O(n^2) hamming scan is the oracle; planted exact copies must
    appear at hamming 0 and perturbed copies within the threshold."""
    import numpy as np

    from monocator_ray.pipelines.docs import q_image_dupes
    from monocator_ray.stages.dedup import hamming64
    from monocator_ray.stages.media import ImageDHasher, synth_image_dup_table

    got = (
        q_image_dupes("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values(["media_a", "media_b"])
        .reset_index(drop=True)
    )
    hs = ImageDHasher()(synth_image_dup_table(96))
    h = hs["dhash"].to_numpy().astype(np.int64).view(np.uint64)
    ids = hs["media_id"].to_numpy()
    want = []
    for a in range(len(ids)):
        d = hamming64(np.full(len(ids) - a - 1, h[a]), h[a + 1:])
        for off in np.nonzero(d <= 3)[0]:
            want.append((int(ids[a]), int(ids[a + 1 + off]), int(d[off])))
    want.sort()
    got_pairs = list(map(tuple, got.to_numpy()))
    assert got_pairs == want
    # planted structure: every base (i%4==0) pairs its exact copy at 0
    zero = {(a, b) for a, b, d in want if d == 0}
    for base in range(0, 96, 4):
        assert (base, base + 1) in zero


def test_embedding_pca_matches_numpy_oracle(ray_session):
    """The distributed exact-int64 covariance partials must reproduce the
    single-pass numpy PCA on the whole table bit-for-bit: same 2^20
    fixed-point scaling, same covariance formula, same eigh + sign fix —
    parallelism cannot move the result because the partial sums are exact
    integers (order-independent)."""
    import numpy as np
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import q_embedding_pca

    sf = "/root/testdata/sf0.001"
    got = q_embedding_pca(sf).to_pandas()

    emb = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
    m = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    x = np.rint(m * float(1 << 20)).astype(object)
    n = x.shape[0]
    s = x.sum(axis=0)
    xtx = x.T @ x
    num = n * xtx - np.outer(s, s)
    cov = num.astype(np.float64) / (float(1 << 40) * n * max(n - 1, 1))
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    d = m.shape[1]
    want_load, want_ev = [], []
    for j in order:
        v = evecs[:, j]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        want_load.extend(np.round(v, 9).tolist())
        want_ev.extend([round(float(evals[j]), 9)] * d)
    assert len(got) == 4 * d
    assert got["loading"].tolist() == want_load
    assert got["eigenvalue"].tolist() == want_ev
    # variance must be concentrated in descending eigenvalue order
    ev = got.groupby("component")["eigenvalue"].first()
    assert list(ev) == sorted(ev, reverse=True)


def test_dedup_jaccard_large_path_matches_small(ray_session, monkeypatch):
    """The broadcast-filter and left_anti-join removal paths must agree
    (the MONOCATOR_FORCE_ANTIJOIN pin mirrors test_large_path_matches_small_path
    for clusters)."""
    from monocator_ray.pipelines.docs import q_dedup_jaccard
    from monocator_ray.stages.grouped import collect_arrow

    sf = "/root/testdata/sf0.001"
    small = collect_arrow(q_dedup_jaccard(sf)).to_pandas()
    monkeypatch.setenv("MONOCATOR_FORCE_ANTIJOIN", "1")
    large = collect_arrow(q_dedup_jaccard(sf)).to_pandas()
    assert small["doc_id"].tolist() == large["doc_id"].tolist()
    # survivors must be a strict subset of documents with every cluster's
    # min representative retained (the SQL oracle pins exact membership at
    # sf0.01; this pins path equality at sf0.001)
    assert len(small) >= 1


def test_dedup_minhash_matches_union_find(ray_session):
    """Survivors from the shared removal tail must equal a driver
    union-find recompute over the SAME minhash pair set: every doc except
    those whose component's min doc_id is smaller."""
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import q_dedup_minhash, q_minhash_pairs
    from monocator_ray.stages.dedup import connected_components
    from monocator_ray.stages.grouped import collect_arrow

    sf = "/root/testdata/sf0.001"
    got = collect_arrow(q_dedup_minhash(sf)).to_pandas()

    pairs = collect_arrow(q_minhash_pairs(sf)).to_pandas()
    labels = connected_components(list(zip(pairs["doc_a"], pairs["doc_b"])))
    removed = {d for d, c in labels.items() if c < d}
    all_ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])[
        "doc_id"].to_pylist()
    want = sorted(set(all_ids) - removed)
    assert got["doc_id"].tolist() == want
    # the pair set on this fixture is non-empty, so removal must bite
    assert len(want) < len(all_ids)


def test_hll_user_counts_accuracy_and_determinism(ray_session):
    """The merged HLL estimate must (a) equal a single-process driver
    recompute exactly (register-max merging is order-independent, so
    parallelism cannot move it) and (b) land within 5% of the true
    distinct count at p=12."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.relational import q_hll_user_counts
    from monocator_ray.state.hll import HLL

    sf = "/root/testdata/sf0.001"
    got = q_hll_user_counts(sf).to_pandas().set_index("event_type")

    t = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "user_id"])
    df = t.to_pandas()
    for ty, grp in df.groupby("event_type"):
        h = HLL(p=12)
        h.add_hashes(pd.util.hash_array(grp["user_id"].to_numpy(np.int64)))
        assert got.loc[ty, "approx_users"] == int(round(h.estimate()))
        exact = grp["user_id"].nunique()
        assert abs(got.loc[ty, "approx_users"] - exact) <= max(0.05 * exact, 2)
