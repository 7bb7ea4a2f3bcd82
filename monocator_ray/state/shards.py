"""FrontierShard — co-located seen-set + priority frontier + politeness state
for one host-hash partition (SURVEY.md §2.3 A1+A2+A3).

Sharding: ``shard_id = host_hash % num_shards`` — every URL of a host lives on
exactly one shard, so per-host politeness tokens and page caps are never
split (the reference kept all this in one JVM heap; /root/reference/src/
TODO.MD:41 shows the keyed-cache pattern `fullScanCache.find(ip)`).

CRAWL ORDER CONTRACT (must match tests/oracle/crawl_sim.py exactly):

* Priority key: ``(depth, host_hash, discovery_time, url_hash)`` ascending.
* Frontier storage is COLUMNAR (struct-of-numpy-arrays kept sorted by the
  priority key) — a Python-tuple heap costs ~150 B/entry of object overhead,
  which at the 10^10-URL design point is terabytes of actor heap; the
  columnar layout is 36 B/entry + the url strings and lets the no-politeness
  fast path stage a whole epoch with one slice (ROUND_NOTES r1 item 4).
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

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from monocator_ray.stages.filters import first_wins_dedup
from monocator_ray.urlnorm import host_of
from monocator_ray.state.cuckoo import CuckooFilter
from monocator_ray.state.seen import SeenSet

FRONTIER_COLS = ["url", "url_hash", "host", "host_hash", "depth", "discovery_time", "parent_url_hash"]


def _empty_cols() -> dict:
    """Columnar frontier: parallel numpy arrays (urls as an Arrow string
    array — Python str objects cost ~50 B each of pure overhead) sorted by
    the priority key."""
    return {
        "depth": np.empty(0, np.int32),
        "host_hash": np.empty(0, np.uint64),
        "discovery_time": np.empty(0, np.int64),
        "url_hash": np.empty(0, np.uint64),
        "parent_url_hash": np.empty(0, np.uint64),
        "url": pa.array([], pa.string()),
    }


def _key_order(c: dict) -> np.ndarray:
    """argsort by (depth, host_hash, discovery_time, url_hash) ascending."""
    return np.lexsort((c["url_hash"], c["discovery_time"], c["host_hash"], c["depth"]))


def _pack_keys(c: dict) -> np.ndarray:
    """Order-preserving byte encoding of the priority key: big-endian
    (depth, host_hash, discovery_time, url_hash) packed into one ``|S28``
    per row, signed fields offset so unsigned byte order == numeric order.
    Lexicographic comparison of these keys is EXACTLY the _key_order
    comparison — lets the frontier keep ONE cached sorted key column and
    merge new offers as a sorted run instead of re-lexsorting everything."""
    n = len(c["depth"])
    buf = np.empty((n, 28), np.uint8)
    buf[:, 0:4] = (
        (c["depth"].astype(np.int64) + 2**31).astype(">u4").view(np.uint8).reshape(n, 4)
    )
    buf[:, 4:12] = c["host_hash"].astype(">u8").view(np.uint8).reshape(n, 8)
    buf[:, 12:20] = (
        (c["discovery_time"].astype(np.uint64) ^ np.uint64(1 << 63))
        .astype(">u8").view(np.uint8).reshape(n, 8)
    )
    buf[:, 20:28] = c["url_hash"].astype(">u8").view(np.uint8).reshape(n, 8)
    return buf.reshape(-1).view("|S28")


def _take(c: dict, idx: np.ndarray) -> dict:
    return {
        k: (v.take(pa.array(idx)) if isinstance(v, pa.Array) else v[idx])
        for k, v in c.items()
    }


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


def _frontier_table(cols: dict) -> pa.Table:
    """Columnar frontier state -> the checkpoint frontier schema."""
    return pa.table(
        {
            "depth": pa.array(cols["depth"], pa.int32()),
            "host_hash": pa.array(cols["host_hash"], pa.uint64()),
            "discovery_time": pa.array(cols["discovery_time"], pa.int64()),
            "url_hash": pa.array(cols["url_hash"], pa.uint64()),
            "url": cols["url"],
            "parent_url_hash": pa.array(cols["parent_url_hash"], pa.uint64()),
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
        track_deltas: bool = True,
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
        # seen set (A1, SPEC "sharded cuckoo-filter URL-seen set"): the
        # cuckoo filter screens definite-negatives (no false negatives
        # while healthy), the exact store is two sorted uint64 runs at
        # 8 B/entry with batched searchsorted probes (state/seen.py — the
        # round-1 Python set cost ~60 B/entry and a per-element loop).
        self.seen = SeenSet()
        self.filter = CuckooFilter(seen_capacity)
        # frontier: columnar struct-of-arrays, SORTED by the priority key
        # (depth, host_hash, discovery_time, url_hash) at all times; _fkey
        # caches the packed byte key of every row (same order) so a flush
        # is a sorted-run MERGE, not a full lexsort (ROUND_NOTES r2 idea 4)
        self._f = _empty_cols()
        self._fkey = np.empty(0, "|S28")
        # host_hash -> [tokens_ms, delay_ms, fetched, last_epoch, cap]
        self.hosts: dict[int, list] = {}
        # peek/pop handshake: indices into self._f arrays, priority order
        self._staged_idx: np.ndarray | None = None
        self._drop_idx: list[int] = []
        # epoch-pending offer tables.  Offers only append (O(1) per RPC);
        # min-key-wins resolution happens vectorized at flush, so offer
        # ARRIVAL ORDER is irrelevant (workers offer concurrently) — the
        # deterministic equivalent of global per-epoch first-wins dedup (J1).
        self._pending_tables: list[pa.Table] = []
        self.counters = {"offered": 0, "new": 0, "dup_dropped": 0, "capped_dropped": 0, "fetched": 0}
        # incremental-checkpoint deltas (S4): everything that changed since
        # the last checkpoint, so a delta checkpoint writes O(changes) —
        # NOT O(total state).  At the 10^10-URL design point the full seen
        # set is ~80 GB across shards; re-dumping it every epoch (the
        # round-3 scheme) is the dominant checkpoint cost and a driver
        # funnel.  Pushes double as the seen-set delta: a URL enters seen
        # exactly when it enters the frontier (contract above).
        # track_deltas=False (driver sets it when checkpointing is OFF)
        # keeps the buffers from growing unboundedly over an uncheckpointed
        # crawl's lifetime.
        self._track_deltas = track_deltas
        self._delta_push: list[pa.Table] = []
        self._delta_pop: list[np.ndarray] = []
        self._dirty_hosts: set[int] = set()

    # ---- seen-set (A1) ----
    def _check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        """True = new (never seen; in-batch duplicates: first wins).  Adds
        new hashes — fully vectorized (state/seen.py), cuckoo-prefiltered."""
        return self.seen.add_new(hashes, prefilter=self.filter)

    def seen_contains(self, hashes: np.ndarray) -> np.ndarray:
        return self.seen.contains(hashes)

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
        hosts = sub["host"].to_pylist()
        hh = sub["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        for i in range(len(hosts)):
            hhi = int(hh[i])
            if hhi not in self.hosts:
                delay = self.host_delays.get(hosts[i], self.default_delay_ms)
                cap = self.host_caps.get(hosts[i], self.max_pages)
                self.hosts[hhi] = [float(max(self.epoch_ms, delay)), delay, 0, 0, cap]
                if self._track_deltas:
                    self._dirty_hosts.add(hhi)
        fresh = {
            "depth": sub["depth"].to_numpy(zero_copy_only=False).astype(np.int32),
            "host_hash": hh,
            "discovery_time": sub["discovery_time"].to_numpy(zero_copy_only=False).astype(np.int64),
            "url_hash": sub["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64),
            "parent_url_hash": sub["parent_url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64),
            "url": sub["url"].combine_chunks().cast(pa.string()),
        }
        # sorted-run merge: sort only the n fresh rows, then place both runs
        # by rank (two searchsorted probes + one O(F+n) permutation) — the
        # epoch's flush cost is O(F) data movement instead of a 4-key
        # lexsort of old+new.  Tie order matches the old stable lexsort of
        # [old; fresh]: equal keys keep old rows first ('left'/'right'
        # sides), fresh rows in arrival order (stable argsort).
        new_keys = _pack_keys(fresh)
        order_new = np.argsort(new_keys, kind="stable")
        new_keys = new_keys[order_new]
        fresh = _take(fresh, order_new)
        # delta log for incremental checkpoints: the fresh rows ARE both
        # the frontier-push delta and the seen-set delta
        if self._track_deltas:
            self._delta_push.append(_frontier_table(fresh))
        nf = len(self._fkey)
        merged = {
            k: (
                pa.concat_arrays([self._f[k], fresh[k]])
                if isinstance(fresh[k], pa.Array)
                else np.concatenate([self._f[k], fresh[k]])
            )
            for k in self._f
        }
        # one searchsorted in the CHEAP direction only (many probes into the
        # small fresh run stays cache-resident; probing the big run was
        # measured ~20x slower per probe); the fresh rows' positions are
        # the complement, in order, since both runs are sorted
        pos_old = np.arange(nf, dtype=np.int64) + np.searchsorted(new_keys, self._fkey, side="left")
        perm = np.empty(nf + n_new, dtype=np.int64)
        mask = np.ones(nf + n_new, dtype=bool)
        mask[pos_old] = False
        perm[pos_old] = np.arange(nf, dtype=np.int64)
        perm[mask] = nf + np.arange(n_new, dtype=np.int64)
        self._f = _take(merged, perm)
        self._fkey = np.concatenate([self._fkey, new_keys])[perm]

    def _advance_tokens(self, st: list, epoch: int) -> None:
        tokens, delay, _fetched, last = st[0], st[1], st[2], st[3]
        if delay > 0 and epoch > last:
            burst = float(max(self.epoch_ms, delay))
            st[0] = min(burst, tokens + (epoch - last) * self.epoch_ms)
        st[3] = epoch

    def peek(self, epoch: int, budget: int) -> pa.Table:
        """Stage up to `budget` politeness-feasible URLs in priority order;
        return their keys (not yet consumed).  The frontier is key-sorted,
        so staging is a front-slice (fast path: no politeness constraints at
        all -> one vectorized slice) or a single index walk (general path) —
        never a heap pop per URL."""
        assert self._staged_idx is None, "peek called twice without pop_upto"
        self.flush_pending()
        f = self._f
        n = len(f["depth"])
        if n == 0:
            self._staged_idx = np.empty(0, np.int64)
            return self._staged_keys()
        if budget <= 0:
            # The sequential walk examines nothing at budget 0; the
            # truncation branch below would index staged_pos[-1] and
            # over-count capped drops (ADVICE r2 #2).
            self._staged_idx = np.empty(0, np.int64)
            return self._staged_keys()
        unconstrained = (
            not self.host_delays
            and self.default_delay_ms == 0
            and self.max_pages == 0
            and not self.host_caps
            # budget must not exceed the uniform per-host allowance, or the
            # front-slice could stage more rows of one host than the general
            # walk would (ADVICE r2 #1: reachable when a caller lowers
            # default_host_cap below the epoch budget).
            and budget <= self.default_host_cap
        )
        if unconstrained:
            # allowance is default_host_cap for every host and no page caps:
            # the first `budget` sorted rows are exactly what the general
            # walk would stage (token state untouched when delay == 0)
            self._staged_idx = np.arange(min(budget, n), dtype=np.int64)
            return self._staged_keys()
        # Vectorized staging walk (review r2e: the old per-row Python loop
        # cost O(frontier) interpreter time per epoch whenever ANY
        # politeness constraint existed — the politeness TAIL is exactly
        # where the frontier is large and the budget tiny).  Per-host
        # allowance is FIXED during one walk (tokens are consumed at pop,
        # not stage), so row i stages iff its within-host occurrence rank
        # < allowance — computable with one stable argsort.  The budget
        # stop truncates staging AND the capped-drop accounting at the
        # budget-th staged row, exactly like the sequential walk's break.
        # Advancing tokens for every frontier host (not just visited ones)
        # is equivalent: the saturating update min(burst, t + dt*rate)
        # composes to the same value whether applied per epoch or once.
        hh_arr = f["host_hash"]
        uniq, inv = np.unique(hh_arr, return_inverse=True)
        # the token-advance below mutates every frontier host's state —
        # the constrained walk is already O(hosts) Python, so the dirty
        # marking adds a constant factor, not a new asymptotic cost
        if self._track_deltas:
            self._dirty_hosts.update(int(x) for x in uniq.tolist())
        allow = np.empty(len(uniq), dtype=np.int64)
        drop_host = np.zeros(len(uniq), dtype=bool)
        for j, hh in enumerate(uniq.tolist()):
            st = self.hosts[hh]
            self._advance_tokens(st, epoch)
            tokens, delay, fetched, cap = st[0], st[1], st[2], st[4]
            if cap and fetched >= cap:
                drop_host[j] = True
                allow[j] = 0
            else:
                a = int(tokens // delay) if delay > 0 else self.default_host_cap
                allow[j] = min(a, cap - fetched) if cap else a
        counts = np.bincount(inv, minlength=len(uniq))
        group_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        order = np.argsort(inv, kind="stable")
        occ = np.empty(n, dtype=np.int64)
        occ[order] = np.arange(n, dtype=np.int64) - np.repeat(group_starts, counts)
        drop_mask = drop_host[inv]
        stage_mask = ~drop_mask & (occ < allow[inv])
        staged_pos = np.nonzero(stage_mask)[0]
        if staged_pos.size > budget:
            stop = staged_pos[budget - 1]
            staged_pos = staged_pos[:budget]
            drop_mask = drop_mask & (np.arange(n) <= stop)
        n_drop = int(drop_mask.sum())
        if n_drop:
            self.counters["capped_dropped"] += n_drop
            self._drop_idx.extend(np.nonzero(drop_mask)[0].tolist())
        self._staged_idx = staged_pos.astype(np.int64)
        return self._staged_keys()

    def _staged_keys(self) -> pa.Table:
        s = _take(self._f, self._staged_idx)
        return pa.table(
            {
                "depth": pa.array(s["depth"], pa.int32()),
                "host_hash": pa.array(s["host_hash"], pa.uint64()),
                "discovery_time": pa.array(s["discovery_time"], pa.int64()),
                "url_hash": pa.array(s["url_hash"], pa.uint64()),
            }
        )

    def pop_upto(self, cutoff: tuple | None) -> pa.Table:
        """Consume staged entries with key <= cutoff (None = all staged);
        the rest simply remain in the frontier.  Consumes tokens/page-cap
        for taken entries; removes taken + capped-dropped rows."""
        idx = self._staged_idx if self._staged_idx is not None else np.empty(0, np.int64)
        f = self._f
        if cutoff is None or idx.size == 0:
            taken_idx = idx
        else:
            cd, ch, ct, cu = cutoff
            d = f["depth"][idx].astype(np.int64)
            h = f["host_hash"][idx]
            t = f["discovery_time"][idx]
            u = f["url_hash"][idx]
            # lexicographic key <= cutoff, vectorized
            le = (d < cd) | (
                (d == cd)
                & ((h < np.uint64(ch)) | ((h == np.uint64(ch)) & ((t < ct) | ((t == ct) & (u <= np.uint64(cu))))))
            )
            taken_idx = idx[le]
        # consume politeness tokens / page caps, grouped per host
        if taken_idx.size:
            th, counts = np.unique(f["host_hash"][taken_idx], return_counts=True)
            for hh, c in zip(th.tolist(), counts.tolist()):
                st = self.hosts[int(hh)]
                st[2] += c
                if st[1] > 0:
                    st[0] -= st[1] * c
                if self._track_deltas:
                    self._dirty_hosts.add(int(hh))
        self.counters["fetched"] += int(taken_idx.size)
        out = _take(f, taken_idx) if taken_idx.size else None
        # drop taken + permanently-capped rows from the frontier
        remove = taken_idx
        if self._drop_idx:
            remove = np.concatenate([remove, np.array(self._drop_idx, dtype=np.int64)])
        if remove.size:
            # delta log: removed rows (taken + permanently capped-dropped)
            # leave the frontier; a url_hash is unique in the frontier's
            # whole lifetime (seen-gated), so hashes identify rows exactly
            if self._track_deltas:
                self._delta_pop.append(f["url_hash"][remove].copy())
            keep = np.ones(len(f["depth"]), dtype=bool)
            keep[remove] = False
            self._f = {
                k: (v.filter(pa.array(keep)) if isinstance(v, pa.Array) else v[keep])
                for k, v in f.items()
            }
            self._fkey = self._fkey[keep]
        self._staged_idx = None
        self._drop_idx = []
        if out is None:
            return _empty_frontier_table()
        urls = out["url"].to_pylist()
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "url_hash": pa.array(out["url_hash"], pa.uint64()),
                # ONE host-extraction definition engine-wide (urlnorm.host_of
                # — the function that produced host_hash); frontier urls are
                # canonical, so this is drift-proof rather than a re-split
                "host": pa.array([host_of(u) for u in urls], pa.string()),
                "host_hash": pa.array(out["host_hash"], pa.uint64()),
                "depth": pa.array(out["depth"], pa.int32()),
                "discovery_time": pa.array(out["discovery_time"], pa.int64()),
                "parent_url_hash": pa.array(out["parent_url_hash"], pa.uint64()),
            }
        )

    def frontier_size(self) -> int:
        return len(self._f["depth"]) + sum(t.num_rows for t in self._pending_tables)

    def next_ready_epoch(self, epoch: int) -> int | None:
        """Smallest virtual epoch > ``epoch`` at which some frontier URL can
        become politeness-feasible (None = frontier empty / all capped).

        The saturating token update ``min(burst, t + dt*rate)`` composes
        across epochs, so the driver jumping straight to this epoch yields
        bit-identical state to stepping one epoch at a time — it just skips
        the per-epoch peek/pop RPC rounds of the politeness tail (the 16x
        scale tier spends ~60 mostly-empty epochs there).  Token state is
        NOT mutated here; peek at the target epoch advances it."""
        self.flush_pending()
        f = self._f
        if len(f["depth"]) == 0:
            return None
        best: int | None = None
        for hh in np.unique(f["host_hash"]).tolist():
            st = self.hosts[int(hh)]
            tokens, delay, fetched, last, cap = st[0], st[1], st[2], st[3], st[4]
            if cap and fetched >= cap:
                continue  # capped hosts never become ready
            if delay <= 0:
                return epoch + 1  # ready immediately (budget deferral)
            # advance tokens to `epoch` the same way peek would, read-only
            if epoch > last:
                burst = float(max(self.epoch_ms, delay))
                tokens = min(burst, tokens + (epoch - last) * self.epoch_ms)
            if tokens >= delay:
                return epoch + 1
            k = int(-(-(delay - tokens) // self.epoch_ms))  # ceil
            cand = epoch + max(1, k)
            if best is None or cand < best:
                best = cand
        return best

    def stats(self) -> dict:
        # resolve pending offers first so the counters reflect every offer
        # made up to this call: lineage rows then attribute an epoch's link
        # resolution to THAT epoch, and the in-memory deltas equal the
        # checkpoint manifest's counters — which is what makes lineage
        # accounting identical across kill/resume (review finding r2e)
        self.flush_pending()
        return dict(
            self.counters, shard_id=self.shard_id, frontier=len(self._f["depth"]), seen=len(self.seen)
        )

    def frontier_nbytes(self) -> int:
        """Resident frontier bytes (numeric columns + url string payloads) —
        the BASELINE.md memory-per-entry measurement hook."""
        f = self._f
        numeric = sum(v.nbytes for k, v in f.items() if k != "url")
        return numeric + int(f["url"].nbytes)

    # ---- checkpoint (S4) ----
    def _hosts_table(self, keys: list[int]) -> pa.Table:
        return pa.table(
            {
                "host_hash": pa.array(keys, pa.uint64()),
                "tokens_ms": pa.array([self.hosts[k][0] for k in keys], pa.float64()),
                "delay_ms": pa.array([self.hosts[k][1] for k in keys], pa.int64()),
                "fetched": pa.array([self.hosts[k][2] for k in keys], pa.int64()),
                "last_epoch": pa.array([self.hosts[k][3] for k in keys], pa.int64()),
                "cap": pa.array([self.hosts[k][4] for k in keys], pa.int64()),
            }
        )

    def dump(self) -> dict:
        """FULL checkpointable state as arrow tables (kept for tests and
        small crawls; the crawl driver uses :meth:`dump_checkpoint`)."""
        self.flush_pending()  # identical to flushing at next peek
        frontier = _frontier_table(self._f)
        seen = pa.table({"url_hash": pa.array(self.seen.to_sorted(), pa.uint64())})
        hosts = self._hosts_table(list(self.hosts.keys()))
        return {"frontier": frontier, "seen": seen, "hosts": hosts, "counters": dict(self.counters)}

    def dump_checkpoint(self, ckpt_dir: str, full: bool) -> dict:
        """Write this shard's checkpoint files directly into ``ckpt_dir``
        (shard-side parallel I/O: the driver never funnels state through
        ``ray.get`` — on a multi-node cluster ``ckpt_dir`` is shared
        storage, the standard checkpoint-store assumption).  Returns the
        counters for the driver's manifest.

        ``full=True`` writes the whole state (frontier/seen/hosts) and
        resets the delta chain.  ``full=False`` writes only what changed
        since the previous checkpoint: ``fpush`` (frontier rows added —
        these double as the seen-set delta, written separately as
        ``seen-delta`` so every seen consumer sees one file family),
        ``fpop`` (url_hashes of rows that left the frontier) and
        ``hosts-delta`` (politeness rows touched).  Cost is O(changes per
        span), not O(total state) — at 10^10 URLs re-dumping the ~80 GB
        seen set every epoch is the difference between a usable and an
        unusable checkpoint cadence."""
        self.flush_pending()
        i = self.shard_id
        if full:
            st = self.dump()
            pq.write_table(st["frontier"], os.path.join(ckpt_dir, f"frontier-{i}.parquet"))
            pq.write_table(st["seen"], os.path.join(ckpt_dir, f"seen-{i}.parquet"))
            pq.write_table(st["hosts"], os.path.join(ckpt_dir, f"hosts-{i}.parquet"))
        else:
            push = (
                pa.concat_tables(self._delta_push)
                if self._delta_push
                else _frontier_table(_empty_cols())
            )
            pq.write_table(push, os.path.join(ckpt_dir, f"fpush-{i}.parquet"))
            # seen delta = pushed url_hashes, sorted so each file is a
            # probe-ready run for the seen audits (report.py)
            sd = np.sort(push["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64))
            pq.write_table(
                pa.table({"url_hash": pa.array(sd, pa.uint64())}),
                os.path.join(ckpt_dir, f"seen-delta-{i}.parquet"),
            )
            pops = (
                np.concatenate(self._delta_pop).astype(np.uint64)
                if self._delta_pop
                else np.empty(0, np.uint64)
            )
            pq.write_table(
                pa.table({"url_hash": pa.array(pops, pa.uint64())}),
                os.path.join(ckpt_dir, f"fpop-{i}.parquet"),
            )
            dirty = [k for k in self._dirty_hosts if k in self.hosts]
            pq.write_table(
                self._hosts_table(dirty), os.path.join(ckpt_dir, f"hosts-delta-{i}.parquet")
            )
        self._delta_push = []
        self._delta_pop = []
        self._dirty_hosts = set()
        return dict(self.counters)

    def restore_checkpoint(
        self,
        ckpt_dirs: list[str],
        counters: dict,
        src_shards: list[int] | None = None,
    ) -> None:
        """Rebuild state from a checkpoint CHAIN: ``ckpt_dirs[0]`` holds a
        full snapshot, each later dir a delta span (in commit order).
        frontier = full ∪ pushes \\ pops; seen = full ∪ seen-deltas;
        hosts = full upserted by each span's dirty rows, last wins.

        RESHARDING (``src_shards`` != [self.shard_id]): a checkpoint taken
        at N shards can restore onto M shards when one count divides the
        other — the driver passes each new shard the list of OLD shard ids
        whose partitions cover it.  Frontier and politeness rows re-filter
        exactly to ``host_hash % M == shard_id`` (they carry host_hash).
        The SEEN set is inherited WHOLE from the source shards: its file
        is url_hash-only (8 B/entry — by design), so entries cannot be
        split by host; but because N | M implies
        ``h % N == (h % M) % N``, the source shard's set is a correct
        SUPERSET of this shard's partition, and membership probes only
        ever arrive for hosts routed here — extra entries are dead weight
        (per-shard seen memory stays at the OLD shard's size after an
        upscale instead of shrinking k-fold; the cluster is k× bigger, so
        per-node memory still drops), never wrong answers.  Downscaling
        merges k source shards exactly.  This is the N -> 4N resume story
        of the north rule: carry a crawl's checkpoint onto a larger
        cluster without re-crawling."""
        # src_shards is passed ONLY on a reshard (even when a new shard's
        # source list happens to be its own id — its partition is then a
        # strict subset of the source's rows and MUST still be filtered,
        # or sibling shards would duplicate them)
        reshard = src_shards is not None
        srcs = src_shards if reshard else [self.shard_id]
        base = ckpt_dirs[0]
        frontier_parts = [
            pq.read_table(os.path.join(base, f"frontier-{i}.parquet")) for i in srcs
        ]
        seen_parts = [
            pq.read_table(os.path.join(base, f"seen-{i}.parquet"))["url_hash"]
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
            for i in srcs
        ]
        # chain order outer, sources inner: per-dir source tables are
        # host-disjoint, so the hosts last-wins upsert order is preserved
        hosts_tables = [
            pq.read_table(os.path.join(base, f"hosts-{i}.parquet")) for i in srcs
        ]
        pop_parts = []
        for d in ckpt_dirs[1:]:
            for i in srcs:
                frontier_parts.append(pq.read_table(os.path.join(d, f"fpush-{i}.parquet")))
                seen_parts.append(
                    pq.read_table(os.path.join(d, f"seen-delta-{i}.parquet"))["url_hash"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                pop_parts.append(
                    pq.read_table(os.path.join(d, f"fpop-{i}.parquet"))["url_hash"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.uint64)
                )
                hosts_tables.append(pq.read_table(os.path.join(d, f"hosts-delta-{i}.parquet")))
        frontier = (
            pa.concat_tables(frontier_parts) if len(frontier_parts) > 1 else frontier_parts[0]
        )
        if pop_parts:
            pops = np.unique(np.concatenate(pop_parts))
            if pops.size and frontier.num_rows:
                fh = frontier["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
                pos = np.minimum(np.searchsorted(pops, fh), pops.size - 1)
                frontier = frontier.filter(pa.array(pops[pos] != fh))
        hosts = (
            pa.concat_tables(hosts_tables) if len(hosts_tables) > 1 else hosts_tables[0]
        )
        if reshard:
            if frontier.num_rows:
                fh = frontier["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
                frontier = frontier.filter(pa.array(fh % self.num_shards == self.shard_id))
            if hosts.num_rows:
                hh = hosts["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
                hosts = hosts.filter(pa.array(hh % self.num_shards == self.shard_id))
        seen = pa.table(
            {"url_hash": pa.array(np.unique(np.concatenate(seen_parts)), pa.uint64())}
        )
        self.restore({"frontier": frontier, "seen": seen, "hosts": hosts, "counters": counters})

    def restore(self, state: dict) -> None:
        f = state["frontier"]
        cols = {
            "depth": f["depth"].to_numpy(zero_copy_only=False).astype(np.int32),
            "host_hash": f["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64),
            "discovery_time": f["discovery_time"].to_numpy(zero_copy_only=False).astype(np.int64),
            "url_hash": f["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64),
            "parent_url_hash": f["parent_url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64),
            "url": f["url"].combine_chunks().cast(pa.string()),
        }
        self._f = _take(cols, _key_order(cols))
        self._fkey = _pack_keys(self._f)
        hashes = state["seen"]["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        self.seen = SeenSet.from_sorted(hashes)
        self.filter = CuckooFilter(max(1 << 20, 2 * len(self.seen)))
        if hashes.size:
            self.filter.insert_batch(hashes)
        h = state["hosts"]
        # duplicate host_hash rows are allowed (a restore_checkpoint chain
        # concatenates base + delta spans in commit order): LAST one wins
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
        # the restored state IS the checkpoint — the next delta span
        # starts empty
        self._pending_tables = []
        self._delta_push = []
        self._delta_pop = []
        self._dirty_hosts = set()
