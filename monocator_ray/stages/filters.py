"""Crawlability predicate stack (SURVEY.md §2 M10 / J5 / S5).

Applied to exploded child-link rows BEFORE dedup, so the seen-set only ever
contains crawlable URLs: scheme filtering already happened in
canonicalization (non-http(s) resolve to ""), here we enforce depth cap,
host blacklist (the reference's BlacklistEntry, /root/reference/src/
TODO.MD:11-13), and robots.txt disallow rules.

The blacklist and robots rule-map are small sides: ship them once per stage
(closure / ``fn_constructor_kwargs``; for multi-GB rule sets use ``ray.put``
and fetch in ``__init__``) — never a shuffle join (SURVEY.md §2.4 J3/J5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from monocator_ray.state.robots import RobotsRules


class LinkFilter:
    """map_batches callable: keeps rows passing depth/blacklist/robots."""

    def __init__(
        self,
        max_depth: int,
        blacklist: frozenset[str] = frozenset(),
        robots: dict[str, RobotsRules] | None = None,
    ):
        self.max_depth = max_depth
        self.blacklist = blacklist
        # only hosts with actual restrictions need checking (fast path)
        self.disallow_hosts = {
            h: r for h, r in (robots or {}).items() if r.disallow or r.allow
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        keep = batch["depth"].to_numpy(zero_copy_only=False) <= self.max_depth
        hosts = batch["host"].to_pylist()
        if self.blacklist:
            bl = self.blacklist
            for i in range(n):
                if keep[i] and hosts[i] in bl:
                    keep[i] = False
        if self.disallow_hosts:
            urls = batch["url"].to_pylist()
            dh = self.disallow_hosts
            for i in range(n):
                if not keep[i]:
                    continue
                rules = dh.get(hosts[i])
                if rules is not None:
                    path = urls[i][urls[i].find("/", 8):]
                    if not rules.allowed(path):
                        keep[i] = False
        if bool(keep.all()):
            return batch
        return batch.filter(pa.array(keep))


def first_wins_dedup(table: pa.Table) -> pa.Table:
    """J1 in-epoch exact dedup: one row per url_hash, winner = smallest
    (depth, host_hash, discovery_time, url_hash) — the same priority key the
    frontier uses, so ties resolve identically at any parallelism
    (SURVEY.md §4.3 hazard 3).  Vectorized numpy lexsort."""
    if table.num_rows == 0:
        return table
    depth = table["depth"].to_numpy(zero_copy_only=False)
    hh = table["host_hash"].to_numpy(zero_copy_only=False)
    dt = table["discovery_time"].to_numpy(zero_copy_only=False)
    uh = table["url_hash"].to_numpy(zero_copy_only=False)
    # group by url_hash (primary), order within group by priority key
    order = np.lexsort((dt, hh, depth, uh))
    uh_sorted = uh[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = uh_sorted[1:] != uh_sorted[:-1]
    winners = order[first]
    # re-sort winners into global priority order for deterministic offers
    w_order = np.lexsort((uh[winners], dt[winners], hh[winners], depth[winners]))
    return table.take(pa.array(winners[w_order]))
