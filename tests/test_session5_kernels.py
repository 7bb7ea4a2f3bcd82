"""Property pins for the round-5 session-2 kernels: KMV sketch algebra,
skew-profile partial merges, the recrawl policy function, the Q4 pack
trick, and the exact frexp log2 binning.  All driver-side math — the
distributed plumbing is pinned separately by the oracle/golden gates."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

K = 128


def _kmv(hashes: np.ndarray, k: int = K) -> np.ndarray:
    return np.unique(hashes)[:k]


def _est(s: np.ndarray, k: int = K) -> int:
    if len(s) < k:
        return len(s)
    return (k - 1) * 2**32 // int(s[k - 1])


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 2**32 - 1), min_size=0, max_size=600),
       st.integers(1, 7))
def test_kmv_batched_merge_equals_global(vals, n_batches):
    """k smallest of the union of per-batch k-smallest sets == the global
    k smallest — the property that makes per-batch O(k) partials exact."""
    arr = np.array(vals, np.int64)
    parts = np.array_split(arr, n_batches)
    merged = _kmv(np.concatenate([_kmv(p) for p in parts]
                                 or [np.empty(0, np.int64)]))
    assert np.array_equal(merged, _kmv(arr))


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(0, 2**32 - 1), min_size=0, max_size=K - 1))
def test_kmv_exact_below_capacity(hset):
    """With fewer than k distinct hashes, the estimator IS the exact
    distinct count (the sketch degrades to an exact set)."""
    s = _kmv(np.array(sorted(hset), np.int64))
    assert _est(s) == len(hset)


def test_kmv_estimator_formula_at_capacity():
    # k-th smallest of 0..2k-1 is k-1 -> est = (k-1)*2^32 // (k-1)
    s = _kmv(np.arange(2 * K, dtype=np.int64))
    assert _est(s) == (K - 1) * 2**32 // (K - 1) == 2**32


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=1, max_size=400),
       st.integers(1, 5))
def test_skew_top10_partial_merge_equals_global(keys, n_parts):
    """Per-partition top-10 by (count desc, key asc), merged and re-picked,
    equals the global top-10 — needs every key's FULL count inside one
    partition, which the key-hash partitioning guarantees."""
    k = np.array(keys, np.int64)
    uk, counts = np.unique(k, return_counts=True)
    glob_order = np.lexsort((uk, -counts))[:10]
    # partition BY KEY (hash % n_parts), never splitting a key
    cand_n, cand_k = [], []
    for p in range(n_parts):
        m = (uk % n_parts) == p
        if not m.any():
            continue
        o = np.lexsort((uk[m], -counts[m]))[:10]
        cand_n.append(counts[m][o])
        cand_k.append(uk[m][o])
    cn = np.concatenate(cand_n or [np.empty(0, np.int64)])
    ck = np.concatenate(cand_k or [np.empty(0, np.int64)])
    o = np.lexsort((ck, -cn))[:10]
    assert int(cn[o].sum()) == int(counts[glob_order].sum())


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 7))
def test_recrawl_interval_formula(x):
    iv = 30 if x == 0 else min(30, max(1, 7 // x))
    # vectorized form used in the query
    got = np.where(np.array([x]) == 0, 30,
                   np.clip(7 // np.maximum(np.array([x]), 1), 1, 30))[0]
    assert int(got) == iv


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 30000), st.integers(0, 7))
def test_q4_pack_roundtrip(days, idx):
    packed = days * 8 + idx
    assert packed >> 3 == days
    assert packed & 7 == idx


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 2**50))
def test_frexp_binning_equals_bit_length(d):
    arr = np.array([d], np.int64)
    got = int((np.frexp(arr.astype(np.float64))[1] - 1)[0])
    assert got == d.bit_length() - 1
