"""Vectorized exact seen-set over uint64 url hashes (A1 scale path).

The round-1 shard kept a Python ``set[int]``: ~60 B/entry (set slot + boxed
int) and a per-element Python loop on every flush (~10 s per 1M offers per
shard measured).  At the 10^10-URL design point that is ~20 GB and hours of
pure interpreter time per shard.  This structure stores hashes as numpy
``uint64`` (8 B/entry) in two sorted runs:

* ``big``   — the bulk, merged geometrically;
* ``small`` — recent inserts, kept sorted (cheap: new batches are merged
  with ``union1d``, C speed).

Membership is two vectorized ``searchsorted`` probes; inserts merge into
``small`` and fold into ``big`` only when ``small`` outgrows ``big >> 3``
(amortized O(log) merges, like an LSM memtable).  All operations are
batch-vectorized — no per-element Python in any path.
"""

from __future__ import annotations

import numpy as np

_MIN_FOLD = 1 << 16


def _merge_disjoint(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """O(n) merge of two sorted, mutually-disjoint uint64 arrays (union1d
    re-sorts the concatenation — 5x slower at fold sizes)."""
    if not a.size:
        return b
    if not b.size:
        return a
    out = np.empty(a.size + b.size, np.uint64)
    pos = np.searchsorted(a, b) + np.arange(b.size)
    mask = np.zeros(out.size, dtype=bool)
    mask[pos] = True
    out[mask] = b
    out[~mask] = a
    return out


class SeenSet:
    def __init__(self) -> None:
        self.big = np.empty(0, np.uint64)
        self.small = np.empty(0, np.uint64)

    def __len__(self) -> int:
        return len(self.big) + len(self.small)

    @property
    def nbytes(self) -> int:
        return self.big.nbytes + self.small.nbytes

    def _contains_sorted(self, sorted_vals: np.ndarray) -> np.ndarray:
        """Membership for an already-sorted query array."""
        out = np.zeros(len(sorted_vals), dtype=bool)
        for run in (self.big, self.small):
            if run.size:
                pos = np.searchsorted(run, sorted_vals)
                pos = np.clip(pos, 0, run.size - 1)
                out |= run[pos] == sorted_vals
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        hashes = hashes.astype(np.uint64, copy=False)
        uniq, inverse = np.unique(hashes, return_inverse=True)
        return self._contains_sorted(uniq)[inverse]

    def add_new(self, hashes: np.ndarray, prefilter=None) -> np.ndarray:
        """True where the hash was never seen before, counting in-batch
        duplicates as seen after their FIRST occurrence (first-wins, matching
        the scalar-loop semantics).  Adds the fresh hashes.

        ``prefilter`` is the SPEC's sharded cuckoo filter
        (state/cuckoo.py): while healthy it has no false negatives, so a
        filter MISS is definitely-new and skips the sorted-run probes — only
        may-contain hashes touch the exact store.  Fresh hashes are inserted
        into both; on overflow (``healthy`` False) the exact store silently
        takes over everything."""
        hashes = hashes.astype(np.uint64, copy=False)
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        uniq, first_idx = np.unique(hashes, return_index=True)
        if prefilter is not None and prefilter.healthy:
            maybe = prefilter.contains_batch(uniq)
            fresh_mask = ~maybe
            if maybe.any():
                fresh_mask[maybe] = ~self._contains_sorted(uniq[maybe])
        else:
            fresh_mask = ~self._contains_sorted(uniq)
        new = np.zeros(len(hashes), dtype=bool)
        new[first_idx[fresh_mask]] = True
        fresh = uniq[fresh_mask]
        if prefilter is not None and prefilter.healthy and fresh.size:
            prefilter.insert_batch(fresh)
        if fresh.size:
            # fresh is sorted and disjoint from both runs by construction
            self.small = _merge_disjoint(self.small, fresh)
            if self.small.size > max(_MIN_FOLD, self.big.size >> 3):
                self.big = _merge_disjoint(self.big, self.small)
                self.small = np.empty(0, np.uint64)
        return new

    def to_sorted(self) -> np.ndarray:
        """All hashes, sorted ascending (checkpoint format)."""
        return _merge_disjoint(self.big, self.small).copy()

    @classmethod
    def from_sorted(cls, hashes: np.ndarray) -> "SeenSet":
        s = cls()
        s.big = np.unique(hashes.astype(np.uint64, copy=False))
        return s
