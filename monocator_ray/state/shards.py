"""FrontierShard — co-located seen-set + priority frontier + politeness state
for one host-hash partition (SURVEY.md §2.3 A1+A2+A3).

Sharding: ``shard_id = host_hash % num_shards`` — every URL of a host lives on
exactly one shard, so per-host politeness tokens and page caps are never
split (the reference kept all this in one JVM heap; /root/reference/src/
TODO.MD:41 shows the keyed-cache pattern `fullScanCache.find(ip)`).

CRAWL ORDER CONTRACT (must match tests/oracle/crawl_sim.py exactly):

* Priority key: ``(depth, host_hash, discovery_time, url_hash)`` ascending.
* A URL enters the seen-set at the moment it is accepted into the frontier.
* Token buckets run on virtual epoch time (SURVEY.md §4.3 hazard 4):
  ``burst_ms = max(epoch_ms, delay_ms)``; tokens advance lazily by
  ``epoch_ms`` per elapsed epoch, capped at burst; a host with
  ``delay_ms == 0`` gets ``default_host_cap`` fetches per epoch; otherwise
  ``allowance = tokens_ms // delay_ms``.  A fetch consumes ``delay_ms``.
* Per epoch each shard stages, in priority order, at most
  ``min(allowance_h, max_pages_h - fetched_h)`` URLs per host and at most
  ``budget`` URLs total; over-quota URLs are deferred (stay in frontier);
  URLs of hosts already at their page cap are dropped permanently.
* The driver merges all shards' staged keys, computes the global top-K
  cutoff, and each shard then pops exactly its staged entries with
  key <= cutoff; only those consume tokens and count toward page caps.

Everything is decided by keys and epoch numbers — never wall clocks — so the
global visit order is identical at any parallelism (SPEC exact-order match).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

from monocator_ray.stages.filters import first_wins_dedup
from monocator_ray.state.cuckoo import CuckooFilter

FRONTIER_COLS = ["url", "url_hash", "host", "host_hash", "depth", "discovery_time", "parent_url_hash"]


def _empty_frontier_table() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "url_hash": pa.array([], pa.uint64()),
            "host": pa.array([], pa.string()),
            "host_hash": pa.array([], pa.uint64()),
            "depth": pa.array([], pa.int32()),
            "discovery_time": pa.array([], pa.int64()),
            "parent_url_hash": pa.array([], pa.uint64()),
        }
    )


class FrontierShard:
    """Plain class; wrap with ``ray.remote`` at pool construction."""

    def __init__(
        self,
        shard_id: int,
        num_shards: int,
        epoch_ms: int = 1000,
        default_host_cap: int = 1_000_000_000,
        max_pages_per_host: int = 0,  # 0 = unlimited
        host_delays: dict[str, int] | None = None,
        default_delay_ms: int = 0,
        seen_capacity: int = 1 << 20,
        host_caps: dict[str, int] | None = None,
    ):
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.epoch_ms = epoch_ms
        self.default_host_cap = default_host_cap
        self.max_pages = max_pages_per_host
        self.host_delays = host_delays or {}
        self.default_delay_ms = default_delay_ms
        # per-host web.max_pages overrides (VisitRequest, TODO.MD:61); falls
        # back to the global max_pages when a host has no entry
        self.host_caps = host_caps or {}
        # seen set: exact uint64 set is ground truth; cuckoo filter fast path
        self.seen: set[int] = set()
        self.filter = CuckooFilter(seen_capacity)
        # frontier: heap of (depth, host_hash, discovery_time, url_hash, url, parent)
        self.heap: list[tuple] = []
        # host_hash -> [tokens_ms, delay_ms, fetched, last_epoch, cap]
        self.hosts: dict[int, list] = {}
        self._staged: list[tuple] = []
        # epoch-pending offer tables.  Offers only append (O(1) per RPC);
        # min-key-wins resolution happens vectorized at flush, so offer
        # ARRIVAL ORDER is irrelevant (workers offer concurrently) — the
        # deterministic equivalent of global per-epoch first-wins dedup (J1).
        self._pending_tables: list[pa.Table] = []
        self.counters = {"offered": 0, "new": 0, "dup_dropped": 0, "capped_dropped": 0, "fetched": 0}

    # ---- seen-set (A1) ----
    def _check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """True = new (never seen).  Adds new hashes to the set."""
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        if self.filter.healthy:
            maybe = self.filter.contains_batch(hashes)
        else:
            maybe = np.ones(len(hashes), dtype=bool)
        new = np.ones(len(hashes), dtype=bool)
        seen = self.seen
        for i in np.nonzero(maybe)[0]:
            if int(hashes[i]) in seen:
                new[i] = False
        # in-batch duplicates: first occurrence wins
        idx_new = np.nonzero(new)[0]
        for i in idx_new:
            h = int(hashes[i])
            if h in seen:
                new[i] = False
            else:
                seen.add(h)
        fresh = hashes[new]
        if self.filter.healthy and fresh.size:
            self.filter.insert_batch(fresh)
        return new

    def seen_contains(self, hashes: np.ndarray) -> np.ndarray:
        return np.fromiter((int(h) in self.seen for h in hashes), dtype=bool, count=len(hashes))

    # ---- frontier (A2) ----
    def offer(self, table: pa.Table) -> dict:
        """Append candidate links to the epoch-pending buffer.  O(1): all
        resolution is deferred to flush_pending (vectorized)."""
        n = table.num_rows
        self.counters["offered"] += n
        if n:
            self._pending_tables.append(table)
        return {"offered": n}

    def flush_pending(self) -> None:
        """Resolve the epoch's pending offers: vectorized min-key-wins per
        url_hash, seen-set dedup, enqueue.  Runs at the next peek() (and
        before checkpoint dumps) — the epoch barrier makes this the J1
        global first-wins point."""
        if not self._pending_tables:
            return
        table = (
            pa.concat_tables(self._pending_tables, promote_options="default")
            if len(self._pending_tables) > 1
            else self._pending_tables[0]
        )
        self._pending_tables = []
        table = first_wins_dedup(table)
        hashes = table["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        new = self._check_and_add(hashes)
        n_new = int(new.sum())
        self.counters["new"] += n_new
        self.counters["dup_dropped"] += table.num_rows - n_new
        if not n_new:
            return
        sub = table.filter(pa.array(new))
        urls = sub["url"].to_pylist()
        uh = sub["url_hash"].to_numpy(zero_copy_only=False)
        hosts = sub["host"].to_pylist()
        hh = sub["host_hash"].to_numpy(zero_copy_only=False)
        dep = sub["depth"].to_numpy(zero_copy_only=False)
        dt = sub["discovery_time"].to_numpy(zero_copy_only=False)
        ph = sub["parent_url_hash"].to_numpy(zero_copy_only=False)
        heap = self.heap
        for i in range(n_new):
            hhi = int(hh[i])
            if hhi not in self.hosts:
                delay = self.host_delays.get(hosts[i], self.default_delay_ms)
                cap = self.host_caps.get(hosts[i], self.max_pages)
                self.hosts[hhi] = [float(max(self.epoch_ms, delay)), delay, 0, 0, cap]
            heapq.heappush(heap, (int(dep[i]), hhi, int(dt[i]), int(uh[i]), urls[i], int(ph[i])))

    def _advance_tokens(self, st: list, epoch: int) -> None:
        tokens, delay, _fetched, last = st[0], st[1], st[2], st[3]
        if delay > 0 and epoch > last:
            burst = float(max(self.epoch_ms, delay))
            st[0] = min(burst, tokens + (epoch - last) * self.epoch_ms)
        st[3] = epoch

    def peek(self, epoch: int, budget: int) -> pa.Table:
        """Stage up to `budget` politeness-feasible URLs in priority order;
        return their keys (not yet consumed)."""
        assert not self._staged, "peek called twice without pop_upto"
        self.flush_pending()
        staged: list[tuple] = []
        deferred: list[tuple] = []
        per_host: dict[int, int] = {}
        heap = self.heap
        while heap and len(staged) < budget:
            entry = heapq.heappop(heap)
            hh = entry[1]
            st = self.hosts[hh]
            self._advance_tokens(st, epoch)
            tokens, delay, fetched, cap = st[0], st[1], st[2], st[4]
            if cap and fetched >= cap:
                self.counters["capped_dropped"] += 1
                continue
            allowance = int(tokens // delay) if delay > 0 else self.default_host_cap
            if cap:
                allowance = min(allowance, cap - fetched)
            if per_host.get(hh, 0) < allowance:
                per_host[hh] = per_host.get(hh, 0) + 1
                staged.append(entry)
            else:
                deferred.append(entry)
        for e in deferred:
            heapq.heappush(heap, e)
        self._staged = staged
        return pa.table(
            {
                "depth": pa.array([e[0] for e in staged], pa.int32()),
                "host_hash": pa.array([e[1] for e in staged], pa.uint64()),
                "discovery_time": pa.array([e[2] for e in staged], pa.int64()),
                "url_hash": pa.array([e[3] for e in staged], pa.uint64()),
            }
        )

    def pop_upto(self, cutoff: tuple | None) -> pa.Table:
        """Consume staged entries with key <= cutoff (None = all staged);
        push the rest back.  Consumes tokens/page-cap for taken entries."""
        taken, back = [], []
        for e in self._staged:
            key = (e[0], e[1], e[2], e[3])
            if cutoff is None or key <= cutoff:
                taken.append(e)
            else:
                back.append(e)
        self._staged = []
        for e in back:
            heapq.heappush(self.heap, e)
        for e in taken:
            st = self.hosts[e[1]]
            st[2] += 1
            if st[1] > 0:
                st[0] -= st[1]
        self.counters["fetched"] += len(taken)
        if not taken:
            return _empty_frontier_table()
        return pa.table(
            {
                "url": pa.array([e[4] for e in taken], pa.string()),
                "url_hash": pa.array([e[3] for e in taken], pa.uint64()),
                "host": pa.array([e[4].split("://", 1)[1].split("/", 1)[0].split(":", 1)[0] for e in taken], pa.string()),
                "host_hash": pa.array([e[1] for e in taken], pa.uint64()),
                "depth": pa.array([e[0] for e in taken], pa.int32()),
                "discovery_time": pa.array([e[2] for e in taken], pa.int64()),
                "parent_url_hash": pa.array([e[5] for e in taken], pa.uint64()),
            }
        )

    def frontier_size(self) -> int:
        return len(self.heap) + sum(t.num_rows for t in self._pending_tables)

    def stats(self) -> dict:
        return dict(self.counters, shard_id=self.shard_id, frontier=len(self.heap), seen=len(self.seen))

    # ---- checkpoint (S4) ----
    def dump(self) -> dict:
        """Checkpointable state as arrow tables (driver writes them)."""
        self.flush_pending()  # identical to flushing at next peek
        frontier = pa.table(
            {
                "depth": pa.array([e[0] for e in self.heap], pa.int32()),
                "host_hash": pa.array([e[1] for e in self.heap], pa.uint64()),
                "discovery_time": pa.array([e[2] for e in self.heap], pa.int64()),
                "url_hash": pa.array([e[3] for e in self.heap], pa.uint64()),
                "url": pa.array([e[4] for e in self.heap], pa.string()),
                "parent_url_hash": pa.array([e[5] for e in self.heap], pa.uint64()),
            }
        )
        seen = pa.table({"url_hash": pa.array(sorted(self.seen), pa.uint64())})
        hh = list(self.hosts.keys())
        hosts = pa.table(
            {
                "host_hash": pa.array(hh, pa.uint64()),
                "tokens_ms": pa.array([self.hosts[k][0] for k in hh], pa.float64()),
                "delay_ms": pa.array([self.hosts[k][1] for k in hh], pa.int64()),
                "fetched": pa.array([self.hosts[k][2] for k in hh], pa.int64()),
                "last_epoch": pa.array([self.hosts[k][3] for k in hh], pa.int64()),
                "cap": pa.array([self.hosts[k][4] for k in hh], pa.int64()),
            }
        )
        return {"frontier": frontier, "seen": seen, "hosts": hosts, "counters": dict(self.counters)}

    def restore(self, state: dict) -> None:
        f = state["frontier"]
        self.heap = [
            (int(d), int(hh), int(dt), int(uh), u, int(ph))
            for d, hh, dt, uh, u, ph in zip(
                f["depth"].to_pylist(),
                f["host_hash"].to_pylist(),
                f["discovery_time"].to_pylist(),
                f["url_hash"].to_pylist(),
                f["url"].to_pylist(),
                f["parent_url_hash"].to_pylist(),
            )
        ]
        heapq.heapify(self.heap)
        hashes = state["seen"]["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        self.seen = set(int(x) for x in hashes)
        self.filter = CuckooFilter(max(1 << 20, 2 * len(self.seen)))
        if hashes.size:
            self.filter.insert_batch(hashes)
        h = state["hosts"]
        self.hosts = {
            int(k): [float(t), int(d), int(fc), int(le), int(cp)]
            for k, t, d, fc, le, cp in zip(
                h["host_hash"].to_pylist(),
                h["tokens_ms"].to_pylist(),
                h["delay_ms"].to_pylist(),
                h["fetched"].to_pylist(),
                h["last_epoch"].to_pylist(),
                h["cap"].to_pylist(),
            )
        }
        self.counters = dict(state["counters"])
