"""Vectorized exact seen-set over uint64 url hashes (A1 scale path).

The round-1 shard kept a Python ``set[int]``: ~60 B/entry (set slot + boxed
int) and a per-element Python loop on every flush (~10 s per 1M offers per
shard measured).  At the 10^10-URL design point that is ~20 GB and hours of
pure interpreter time per shard.  This structure stores hashes as numpy
``uint64`` (8 B/entry) in a LIST of sorted runs with geometrically
descending sizes — a true in-memory LSM:

* a fresh batch becomes its own run after the (already vectorized) in-batch
  dedup, so an insert never rewrites the bulk;
* whenever the newest run reaches 1/_RATIO of its predecessor the two merge
  (O(n) disjoint merge) — amortized O(_RATIO * log_RATIO(N/batch)) copies
  per element.  The round-2 two-run layout instead rewrote the whole
  memtable run on EVERY batch: fine at bench scale, but at a 10^9-entry
  shard the memtable is big/8 = 10^8 entries rewritten per 4k-row batch
  (~15,000 copies/element) — the LSM keeps it ~50;
* membership is one vectorized ``searchsorted`` probe per run.  _RATIO
  trades probe count against write amplification; measured on this box at
  10M keys / 4k batches (no prefilter): ratio 2 = 0.85M offers/s cold /
  1.16M dup (5 runs), ratio 8 = 1.16 / 1.64 (4 runs) vs the old two-run
  layout's 1.05 / 1.78 — ratio 8 beats old on cold ingest, gives up ~8% on
  dup-heavy, and removes the scale cliff.  The cuckoo prefilter screens
  definite-negatives before any exact probe in the crawl path.

All operations are batch-vectorized — no per-element Python in any path.
"""

from __future__ import annotations

import numpy as np


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


_RATIO = 8


class SeenSet:
    def __init__(self) -> None:
        # sorted, mutually-disjoint runs; sizes descending by >_RATIO
        self.runs: list[np.ndarray] = []

    def __len__(self) -> int:
        return sum(r.size for r in self.runs)

    @property
    def nbytes(self) -> int:
        return sum(r.nbytes for r in self.runs)

    def _contains_sorted(self, sorted_vals: np.ndarray) -> np.ndarray:
        """Membership for an already-sorted query array."""
        out = np.zeros(len(sorted_vals), dtype=bool)
        for run in self.runs:
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
            # fresh is sorted and disjoint from every run by construction;
            # append as its own run, then restore the geometric invariant
            self.runs.append(fresh)
            while len(self.runs) >= 2 and self.runs[-1].size * _RATIO >= self.runs[-2].size:
                b = self.runs.pop()
                a = self.runs.pop()
                self.runs.append(_merge_disjoint(a, b))
        return new

    def to_sorted(self) -> np.ndarray:
        """All hashes, sorted ascending (checkpoint format)."""
        out = np.empty(0, np.uint64)
        for run in reversed(self.runs):  # smallest-first fold: O(N) total
            # for geometric run sizes (partial sums stay a constant factor)
            out = _merge_disjoint(run, out)
        return out.copy()

    @classmethod
    def from_sorted(cls, hashes: np.ndarray) -> "SeenSet":
        s = cls()
        arr = np.unique(hashes.astype(np.uint64, copy=False))
        if arr.size:
            s.runs = [arr]
        return s
