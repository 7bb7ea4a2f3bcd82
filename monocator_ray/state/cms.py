"""Count-Min Sketch over 64-bit-hashed items (G6 companion to state/hll.py).

Public algorithm (Cormode & Muthukrishnan 2005): a depth x width int64
matrix; each item increments one cell per row (row-specific universal
hash); the estimate is the MIN over rows — always >= the true count, and
<= true + eps*N with probability 1-delta for width = e/eps, depth =
ln(1/delta).  Everything here is vectorized over numpy arrays and the
sketch MERGES by elementwise addition, which is what makes it a
map_batches partial: every batch builds a local sketch, the driver (or a
tree reduce) sums the O(depth*width) matrices — corpus-size-independent
reduce traffic, the same shape as the HLL register merge.
"""

from __future__ import annotations

import numpy as np

# row-specific odd multipliers (any fixed odd 64-bit constants work for the
# multiply-shift universal family); depth 4 = delta ~ e^-4 < 2%
_ROW_MULT = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0x27D4EB2F165667C5],
    dtype=np.uint64,
)


class CountMinSketch:
    def __init__(self, width_log2: int = 14, depth: int = 4):
        assert depth <= len(_ROW_MULT)
        self.width_log2 = width_log2
        self.depth = depth
        self.table = np.zeros((depth, 1 << width_log2), dtype=np.int64)

    def _cells(self, hashes: np.ndarray) -> np.ndarray:
        """(depth, n) cell indices via multiply-shift."""
        h = hashes.astype(np.uint64, copy=False)
        shift = np.uint64(64 - self.width_log2)
        return ((h[None, :] * _ROW_MULT[: self.depth, None]) >> shift).astype(np.int64)

    def add(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        if hashes.size == 0:
            return
        if counts is None:
            counts = np.ones(len(hashes), dtype=np.int64)
        cells = self._cells(hashes)
        for d in range(self.depth):
            np.add.at(self.table[d], cells[d], counts)

    def estimate(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.zeros(0, dtype=np.int64)
        cells = self._cells(hashes)
        est = self.table[0][cells[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.table[d][cells[d]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width_log2, self.depth) == (other.width_log2, other.depth)
        self.table += other.table
        return self
