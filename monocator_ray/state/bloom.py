"""Vectorized, mergeable Bloom filter over uint64 keys.

The scale pattern it enables (pipelines/relational.py:q_bloom_semi_join):
a semi-join whose build side is too big to broadcast EXACTLY but whose
*bitset* is small — per-batch partial filters are fixed O(bits) blobs
OR-merged on the driver (the CMS/HLL register-merge shape, reduce traffic
independent of build-side row count), then the merged filter broadcasts
into the probe-side ``map_batches`` and drops the vast majority of rows
before the exact verification join runs over the few survivors.  One-sided
error: ``contains`` never misses an added key (no false negatives — the
prefilter can only admit extra rows, which the verify join then removes),
false-positive probability ~``(1 - e^(-k*n/m))^k``.

Hashing: double hashing ``pos_i = h1 + i*h2 (mod m)`` from two SplitMix64
finalizer mixes of the key — index derivation is pure uint64 arithmetic
(wrapping multiplies), no per-element Python.
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_M3 = np.uint64(0xFF51AFD7ED558CCD)


def _mix(x: np.ndarray, mul: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= mul
    x ^= x >> np.uint64(27)
    x *= _M2
    x ^= x >> np.uint64(31)
    return x


class BloomFilter:
    """``num_bits`` must be a multiple of 64.  ``k`` hash functions.

    Sizing rule: ``num_bits ~ 10 x expected keys`` gives ~0.8% fpp at
    k=7; the filter ships as one ``num_bits/8``-byte blob regardless of
    how many keys went in.
    """

    def __init__(self, num_bits: int = 1 << 17, k: int = 7):
        assert num_bits % 64 == 0
        self.num_bits = num_bits
        self.k = k
        self.words = np.zeros(num_bits // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing (h2 forced odd)."""
        keys = np.asarray(keys, dtype=np.uint64)
        h1 = _mix(keys, _M1)
        h2 = _mix(keys, _M3) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.num_bits)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """bool mask; True for every added key (one-sided), occasionally
        True for an absent one."""
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        bits = (self.words[(pos >> np.uint64(6)).astype(np.int64)]
                >> (pos & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=0)

    def merge(self, other: "BloomFilter") -> None:
        assert other.num_bits == self.num_bits and other.k == self.k
        self.words |= other.words

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, num_bits: int = 1 << 17, k: int = 7) -> "BloomFilter":
        bf = cls(num_bits, k)
        bf.words = np.frombuffer(blob, dtype=np.uint64).copy()
        assert len(bf.words) == num_bits // 64
        return bf
