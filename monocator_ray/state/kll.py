"""Mergeable approximate-quantile sketch (KLL/MRL compactor family).

Completes the sketch shelf (HLL count-distinct, CMS frequencies, Bloom
membership, MinHash similarity): per-batch LOCAL sketches stream over the
data once and ship as small blobs; the driver (or a reduce task) merges
them — reduce traffic is O(k x levels), independent of row count, the same
register-merge shape as state/hll.py / state/cms.py.

Structure: a ladder of levels; level ``i`` holds values with weight
``2**i``.  When a level exceeds its capacity it is sorted and every other
element (even ranks — DETERMINISTIC compaction, no RNG state, so re-runs
are stable) is promoted to the next level with doubled weight.  The
classic randomized-offset KLL trades the deterministic variant's slightly
larger constant for unbiasedness; for an engine whose contract is
reproducibility the deterministic compactor is the right default, and the
measured rank error stays well inside the test bound (~1% at k=256 over
10^6 values, tests/test_kll.py).

Estimation: a quantile ``q`` is the smallest value whose cumulative weight
reaches ``ceil(q * W)`` over the weighted union of all levels.
"""

from __future__ import annotations

import pickle

import numpy as np


class KLLSketch:
    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        # per-level compaction offset flag, toggled each compaction: keeping
        # always-even ranks biases every estimate low (one-sided pair
        # representatives); alternating even/odd cancels the bias across
        # compactions while staying RNG-free (deterministic-alternating KLL)
        self.flips: list[bool] = [False]

    # -- build ----------------------------------------------------------
    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()

    def _cap(self, level: int) -> int:
        # higher levels keep more (their items carry more weight); the
        # 2/3 decay per level below the top is the standard KLL schedule
        depth = len(self.levels) - 1 - level
        return max(8, int(self.k * (2.0 / 3.0) ** depth))

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > max(self._cap(i), 2):
                srt = np.sort(self.levels[i])
                if len(srt) % 2:  # keep the max behind: weight conserved exactly
                    keep, srt = srt[-1:], srt[:-1]
                else:
                    keep = srt[:0]
                off = 1 if self.flips[i] else 0
                self.flips[i] = not self.flips[i]
                promoted = srt[off::2]  # weight doubles; the other parity drops
                self.levels[i] = keep
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                    self.flips.append(False)
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    # -- merge ----------------------------------------------------------
    def merge(self, other: "KLLSketch") -> None:
        assert other.k == self.k
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
            self.flips.append(False)
        for i, lv in enumerate(other.levels):
            if lv.size:
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self._compact()

    # -- query ----------------------------------------------------------
    def weight(self) -> int:
        return int(sum(len(lv) * (1 << i) for i, lv in enumerate(self.levels)))

    def quantiles(self, qs) -> np.ndarray:
        vals = np.concatenate([lv for lv in self.levels if lv.size]) if self.weight() else np.empty(0)
        if vals.size == 0:
            return np.full(len(list(qs)), np.nan)
        wts = np.concatenate(
            [np.full(len(lv), 1 << i, np.int64) for i, lv in enumerate(self.levels) if lv.size]
        )
        order = np.argsort(vals, kind="mergesort")
        vals, wts = vals[order], wts[order]
        cum = np.cumsum(wts)
        total = cum[-1]
        out = []
        for q in qs:
            rank = max(1, int(np.ceil(float(q) * total)))
            out.append(vals[np.searchsorted(cum, rank)])
        return np.array(out, np.float64)

    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])

    # -- shipping -------------------------------------------------------
    def to_bytes(self) -> bytes:
        return pickle.dumps((self.k, [lv for lv in self.levels], self.flips), protocol=4)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLLSketch":
        k, levels, flips = pickle.loads(blob)
        sk = cls(k)
        sk.levels = [np.asarray(lv, np.float64) for lv in levels]
        sk.flips = list(flips)
        return sk
