"""Misra-Gries / frequent-items heavy-hitter summary (G6 companion to
state/cms.py — the DETERMINISTIC-bound counterpart: CMS overestimates
probabilistically, MG underestimates with a hard bound).

Public algorithm (Misra & Gries 1982; merge rule from Agarwal, Cormode,
Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS 2012): keep at most
``k`` (item, counter) pairs; fold a batch by adding its exact counts, then
restore the k-slot invariant by subtracting the (k+1)-th largest counter
from every counter and dropping the non-positives.  Each subtraction of
``d`` removes >= (k+1)*d of total counter mass, and mass never exceeds the
stream weight N, so the cumulative decrement D obeys (k+1)*D <= N, giving
the classic deterministic guarantee after ANY merge tree:

    true(x) - N/(k+1)  <=  estimate(x)  <=  true(x)

and every x with true(x) > N/(k+1) is IN the summary.  Two summaries merge
by summing counters pairwise then applying the same subtraction — the
bound holds over the union stream, so a map_batches partial per block +
one driver fold keeps it over the whole corpus with O(k) reduce traffic
per block (corpus-size-independent, the same shape as the HLL/CMS merges).

Keys are arbitrary hashables (term strings, int64 hashes); per batch the
distinct-item count is small, so the O(distinct) dict pass is the whole
cost and the k-th-largest selection uses numpy partition.
"""

from __future__ import annotations

from typing import Hashable, Iterable

import numpy as np


class MisraGries:
    def __init__(self, k: int = 64):
        assert k >= 1
        self.k = int(k)
        self.counts: dict[Hashable, int] = {}
        self.n_items = 0  # total stream weight folded in (for the bound)

    def add(self, items: Iterable[Hashable],
            counts: Iterable[int] | None = None) -> None:
        """Fold a batch (optionally pre-aggregated (items, counts))."""
        c = self.counts
        if counts is None:
            for item in items:
                c[item] = c.get(item, 0) + 1
                self.n_items += 1
        else:
            for item, n in zip(items, counts):
                c[item] = c.get(item, 0) + int(n)
                self.n_items += int(n)
        self._shrink()

    def merge(self, other: "MisraGries") -> "MisraGries":
        """Mergeable-summaries rule: pairwise counter sum, then one
        (k+1)-th-largest subtraction.  Returns self."""
        assert other.k == self.k
        c = self.counts
        for item, n in other.counts.items():
            c[item] = c.get(item, 0) + n
        self.n_items += other.n_items
        self._shrink()
        return self

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64,
                           count=len(self.counts))
        # (k+1)-th largest counter = the decrement that restores <= k slots
        # (at most k counters can exceed it, ties included)
        dec = int(np.partition(vals, -(self.k + 1))[-(self.k + 1)])
        self.counts = {i: n - dec for i, n in self.counts.items() if n > dec}

    def estimate(self, item: Hashable) -> int:
        """Lower-bound estimate (0 if untracked); the true count is within
        +n_items/(k+1) of this."""
        return self.counts.get(item, 0)

    def heavy_hitters(self, min_estimate: int = 1) -> dict[Hashable, int]:
        return {i: n for i, n in self.counts.items() if n >= min_estimate}
