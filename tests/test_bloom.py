"""Bloom filter (state/bloom.py): one-sided error, fpp bound, mergeability.
Pure numpy — no Ray session needed."""

import numpy as np

from monocator_ray.state.bloom import BloomFilter


def _rng_keys(seed: int, n: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_no_false_negatives():
    keys = _rng_keys(1, 20_000)
    bf = BloomFilter(1 << 18, 7)
    bf.add(keys)
    assert bf.contains(keys).all()


def test_false_positive_rate_bounded():
    keys = _rng_keys(2, 10_000)
    probe = _rng_keys(3, 100_000)
    probe = probe[~np.isin(probe, keys)]
    bf = BloomFilter(1 << 17, 7)  # ~13 bits/key -> fpp well under 1%
    bf.add(keys)
    fpp = bf.contains(probe).mean()
    assert fpp < 0.01, fpp


def test_merge_equals_single_pass():
    a, b = _rng_keys(4, 5_000), _rng_keys(5, 5_000)
    one = BloomFilter(1 << 16, 5)
    one.add(np.concatenate([a, b]))
    fa, fb = BloomFilter(1 << 16, 5), BloomFilter(1 << 16, 5)
    fa.add(a)
    fb.add(b)
    fa.merge(fb)
    assert np.array_equal(fa.words, one.words)
    rt = BloomFilter.from_bytes(fa.to_bytes(), 1 << 16, 5)
    assert np.array_equal(rt.words, one.words)


def test_empty_and_tiny():
    bf = BloomFilter(64, 3)
    assert bf.contains(np.empty(0, np.uint64)).shape == (0,)
    bf.add(np.array([7], np.uint64))
    assert bf.contains(np.array([7], np.uint64)).all()
