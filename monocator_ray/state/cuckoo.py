"""Vectorized cuckoo filter (SURVEY.md §2.3 A1).

Fast-path membership structure for the URL-seen set, per the SPEC ("sharded
cuckoo-filter URL-seen set").  Numpy table of 16-bit fingerprints, 4 slots per
bucket, partial-key cuckoo hashing (Fan et al., CoNEXT'14 — public paper; see
PAPERS.md).  Batch ``contains`` is fully vectorized; inserts are per-item
(amortized once per unique URL ever discovered).

Correctness posture (SURVEY.md §4.3 hazard 2): the filter may false-positive
and may overflow under adversarial load, so the owning shard always backs it
with an exact uint64 set — the filter only short-circuits *negative* lookups
(no false negatives while ``healthy``).  If an insert fails after MAX_KICKS,
``healthy`` flips False and callers must fall back to the exact set for
everything; correctness never depends on the filter.
"""

from __future__ import annotations

import numpy as np

MAX_KICKS = 500
_FP_MULT = np.uint64(0x5BD1E995)


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 0):
        # 4 slots/bucket at ~95% load; round buckets up to a power of two
        nbuckets = max(8, int(1 << int(np.ceil(np.log2(max(1, capacity) / 3.2)))))
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.table = np.zeros((nbuckets, 4), dtype=np.uint16)
        self.count = 0
        self.healthy = True
        self._rng = np.random.RandomState(seed)  # eviction slot choice only

    # fingerprint in [1, 65535] (0 = empty slot)
    @staticmethod
    def _fingerprint(h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) ^ (h & np.uint64(0xFFFF))).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _buckets(self, h: np.ndarray, fp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        b1 = (h & self.mask).astype(np.uint64)
        b2 = (b1 ^ (fp.astype(np.uint64) * _FP_MULT)) & self.mask
        return b1, b2

    def _alt(self, b: int, fp: int) -> int:
        return int((np.uint64(b) ^ (np.uint64(fp) * _FP_MULT)) & self.mask)

    def contains_batch(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized may-contain mask. No false negatives while healthy."""
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fingerprint(h)
        b1, b2 = self._buckets(h, fp)
        fpc = fp[:, None]
        return (self.table[b1] == fpc).any(axis=1) | (self.table[b2] == fpc).any(axis=1)

    def insert_batch(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return
        fp = self._fingerprint(h)
        b1, b2 = self._buckets(h, fp)
        tab = self.table
        for i in range(h.size):
            f = int(fp[i])
            placed = False
            for b in (int(b1[i]), int(b2[i])):
                row = tab[b]
                empty = np.nonzero(row == 0)[0]
                if empty.size:
                    row[empty[0]] = f
                    placed = True
                    break
            if placed:
                self.count += 1
                continue
            # evict
            b = int(b1[i])
            cur = f
            ok = False
            for _ in range(MAX_KICKS):
                slot = self._rng.randint(4)
                cur, tab[b][slot] = int(tab[b][slot]), cur
                b = self._alt(b, cur)
                row = tab[b]
                empty = np.nonzero(row == 0)[0]
                if empty.size:
                    row[empty[0]] = cur
                    ok = True
                    break
            if ok:
                self.count += 1
            else:
                self.healthy = False  # exact-set fallback takes over
                return
