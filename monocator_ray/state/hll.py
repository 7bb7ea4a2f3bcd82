"""HyperLogLog sketch (SURVEY.md §2.5 G6) — approximate frontier/URL
cardinality for sizing & telemetry only (never feeds correctness paths).

Standard HLL (Flajolet et al., public algorithm): ``p``-bit register index,
leading-zero rank on the remaining bits, harmonic-mean estimate with the
usual small/large-range corrections.  Registers are a numpy uint8 array, so
per-block sketches are mergeable with an elementwise max — the map_batches
partial-aggregation pattern.
"""

from __future__ import annotations

import numpy as np


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 12:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        elif p >= 7:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = 0.673

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Vectorized add of pre-hashed uint64 values."""
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return
        # register index from the LOW p bits; rank from the remaining bits
        # (robust to inputs whose top bits carry little entropy)
        idx = (h & np.uint64(self.m - 1)).astype(np.int64)
        w = h >> np.uint64(self.p)
        width = 64 - self.p
        lz = np.full(h.size, width, dtype=np.int64)
        nz = w != 0
        # leading zeros within `width` bits via float64 log2; ±1 at float
        # rounding boundaries is acceptable for an advisory sketch (G6)
        lz[nz] = width - 1 - np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
        np.clip(lz, 0, width, out=lz)
        ranks = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HLL") -> "HLL":
        assert other.p == self.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        est = self.alpha * m * m / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def dumps(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def loads(cls, b: bytes) -> "HLL":
        h = cls(b[0])
        h.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return h
