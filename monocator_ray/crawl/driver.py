"""Epoch-based crawl driver (SURVEY.md §3.1) — the flagship pipeline.

The reference runs one continuous virtual-thread loop in a single JVM
(/root/reference/pom.xml:22-23); our Ray-native rendering is BSP frontier
*epochs*: each epoch is a bounded Dataset pipeline

    pop (actor RPC, politeness-ordered) -> synthetic fetch (actor pool)
    -> fused extract (actor pool) -> write artifacts (epoch-partitioned)
    -> explode links -> filter -> first-wins dedup -> offer to shards

with an epoch barrier as the watermark (SURVEY.md §2.9).  The driver holds
only orchestration state (seq counter, epoch number) — never page data.

Determinism: the global visit order is fully decided by the priority key
``(depth, host_hash, discovery_time, url_hash)`` plus epoch numbers, so it is
identical at any parallelism / shard count — validated against the
sequential oracle at tests/oracle/crawl_sim.py.

Checkpoint/resume (S4): per-epoch shard dumps + manifest + ``_SUCCESS``
marker; ``resume=True`` rehydrates shards from the last complete epoch and
continues without re-fetching (lineage fetch counts prove it).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from monocator_ray.hashing import hash_host64, hash_url64
from monocator_ray.shipping import ensure_shipped
from monocator_ray.stages.extract import ExtractStage, explode_links
from monocator_ray.stages.fetch import SyntheticFetcher
from monocator_ray.crawl.workers import EpochWorker
from monocator_ray.stages.filters import LinkFilter, first_wins_dedup
from monocator_ray.state.robots import RobotsRules
from monocator_ray.state.shards import FrontierShard
from monocator_ray.urlnorm import canonicalize_url, host_of

PAGES_COLS = ["url", "warc_ts", "html", "text", "lang"]
VISIT_COLS = ["seq", "url", "url_hash", "depth", "host_hash", "discovery_time", "fetch_status", "epoch", "shard_id"]
FEATURE_COLS = ["url", "url_hash", "title", "meta_description", "links_internal", "links_external", "vat_numbers", "html_sha256", "noindex", "canonical_url"]


@dataclass
class CrawlConfig:
    num_shards: int = 8
    budget_per_epoch: int = 4096
    epoch_ms: int = 1000
    default_host_cap: int = 1_000_000_000  # per-epoch fetches for delay-free hosts
    default_delay_ms: int = 0
    max_pages_per_host: int = 0  # 0 = unlimited (web.max_pages, TODO.MD:61)
    max_depth: int = 6
    link_cap: int = 64
    max_epochs: int = 10_000
    total_page_budget: int = 0  # 0 = unlimited
    num_buckets: int = 16
    fetch_concurrency: int = 4
    extract_concurrency: int = 4
    fetch_batch_size: int = 1024
    # per-WORKER decoded-row-group LRU budget (MB).  Sizing rule: in async
    # mode every worker fetches, so the aggregate is workers x this value —
    # keep it under (RAM - object store) or the OOM killer takes a worker
    # (measured at 4096 MB x 23 workers, BASELINE r5).  Raising it past the
    # default did NOT reduce the 16x fetch-cost growth (two null
    # experiments recorded there) — tune only with lineage evidence.
    rg_cache_mb: int = 1536
    extract_batch_size: int = 512
    checkpoint_every: int = 1
    # checkpoints per FULL state snapshot: the first checkpoint of a chain
    # writes frontier/seen/hosts in full, the next (full_checkpoint_every-1)
    # write only deltas (pushes/pops/dirty hosts) — O(changes) per epoch
    # instead of O(total state).  1 = every checkpoint full (round-3
    # behavior); at the 10^10-URL design point the seen set alone is
    # ~80 GB, so delta checkpoints are what makes a per-epoch cadence
    # affordable.  Restore reads the last full snapshot + its delta spans.
    full_checkpoint_every: int = 4
    # after a new FULL snapshot commits, earlier checkpoints can never be
    # needed again (resume always restores the LATEST chain, which now
    # starts at the new full) — drop their payloads, keep the crawl
    # artifacts.  Without GC a 10^10-URL crawl accumulates a full O(seen)
    # snapshot every full_checkpoint_every epochs forever.
    gc_checkpoints: bool = True
    blacklist: frozenset = frozenset()
    host_caps: dict | None = None  # host -> web_max_pages override (VisitRequest)
    with_vat: bool = True
    shard_cpus: float = 0.25
    # epochs smaller than this run inline on the driver (identical functions,
    # identical results) instead of paying Dataset/actor-pool startup — the
    # politeness tail of a crawl is hundreds of tiny epochs.
    inline_threshold: int = 256
    # "workers": persistent actor pool, bucket caches warm across epochs
    # (default — see crawl/workers.py); "dataset": per-epoch map_batches
    # pipeline (reference implementation of the same chain).
    epoch_engine: str = "workers"
    num_workers: int = 0  # 0 = auto (cluster CPUs - shards - driver)
    # ASYNC FRONTIER MODE (bounded staleness): >0 allows that many rounds
    # in flight — shards keep serving politeness-ready URLs while earlier
    # rounds' extract/offer work finishes; the driver only barriers on the
    # OLDEST round.  Relaxes the exact BSP visit ORDER (epoch/seq values
    # differ) but preserves the fetched-page SET whenever reachability is
    # order-independent (no per-host page caps and max_depth not binding —
    # first-discovery depth can differ between modes).  Politeness rates
    # and caps are still enforced at pop time by the shards, identically
    # to BSP.  0 = exact-order BSP (the correctness artifact, default).
    async_rounds: int = 0


@dataclass
class CrawlResult:
    out_dir: str
    epochs: int = 0
    fetched: int = 0
    errors: int = 0
    seen: int = 0
    wall_s: float = 0.0
    lineage: list = field(default_factory=list)


def _key_sort(tbl: pa.Table) -> pa.Table:
    order = np.lexsort(
        (
            tbl["url_hash"].to_numpy(zero_copy_only=False),
            tbl["discovery_time"].to_numpy(zero_copy_only=False),
            tbl["host_hash"].to_numpy(zero_copy_only=False),
            tbl["depth"].to_numpy(zero_copy_only=False),
        )
    )
    return tbl.take(pa.array(order))


def seeds_to_frontier(seeds: list[str]) -> pa.Table:
    """S2: seed URLs -> canonical frontier rows, discovery_time = seed index
    (first occurrence wins for duplicate seeds)."""
    rows: dict[str, int] = {}
    for i, s in enumerate(seeds):
        c = canonicalize_url(s)
        if c and c not in rows:
            rows[c] = i
    urls = list(rows)
    idx = [rows[u] for u in urls]
    hosts = [host_of(u) for u in urls]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "url_hash": pa.array(hash_url64(urls) if urls else [], pa.uint64()),
            "host": pa.array(hosts, pa.string()),
            "host_hash": pa.array(hash_host64(hosts) if hosts else [], pa.uint64()),
            "depth": pa.array([0] * len(urls), pa.int32()),
            "discovery_time": pa.array(idx, pa.int64()),
            "parent_url_hash": pa.array([0] * len(urls), pa.uint64()),
        }
    )


class CrawlDriver:
    def __init__(
        self,
        pages_dir: str,
        out_dir: str,
        config: CrawlConfig,
        robots: dict[str, RobotsRules] | None = None,
    ):
        ensure_shipped()
        self.pages_dir = pages_dir
        self.out_dir = out_dir
        self.cfg = config
        self.robots = robots or {}
        host_delays = {h: r.crawl_delay_ms for h, r in self.robots.items() if r.crawl_delay_ms}
        Shard = ray.remote(num_cpus=config.shard_cpus)(FrontierShard)
        self.shards = [
            Shard.remote(
                shard_id=i,
                num_shards=config.num_shards,
                epoch_ms=config.epoch_ms,
                default_host_cap=config.default_host_cap,
                max_pages_per_host=config.max_pages_per_host,
                host_delays=host_delays,
                default_delay_ms=config.default_delay_ms,
                host_caps=config.host_caps,
                # no checkpoints -> no delta logs (they would otherwise
                # accumulate for the crawl's whole lifetime)
                track_deltas=config.checkpoint_every > 0,
            )
            for i in range(config.num_shards)
        ]
        self.link_filter = LinkFilter(config.max_depth, config.blacklist, self.robots)
        self.seq = 0
        self.epoch = 0
        # checkpoint chain: the epoch dirs since (and including) the last
        # FULL snapshot, commit order — the next delta's restore set
        self._ckpt_chain: list[str] = []
        self.lineage_rows: list[dict] = []
        self._prev_stats = [
            {"offered": 0, "fetched": 0, "new": 0, "dup_dropped": 0} for _ in range(config.num_shards)
        ]
        self._inline_fetch: SyntheticFetcher | None = None
        self._inline_extract: ExtractStage | None = None
        self._workers: list | None = None
        self._fetchers: list | None = None

    # ---- routing ----
    def _offer_all(self, tbl: pa.Table) -> list[dict]:
        if tbl.num_rows == 0:
            return []
        hh = tbl["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sid = (hh % np.uint64(self.cfg.num_shards)).astype(np.int64)
        refs = []
        for s in range(self.cfg.num_shards):
            mask = sid == s
            if mask.any():
                refs.append(self.shards[s].offer.remote(tbl.filter(pa.array(mask))))
        return ray.get(refs)

    def push_seeds(self, seeds: list[str]) -> None:
        tbl = seeds_to_frontier(seeds)
        tbl = self.link_filter(tbl)  # blacklist/robots apply to seeds too
        self._offer_all(tbl)

    # ---- one epoch ----
    def run_epoch(self) -> int:
        """Returns number of pages fetched this epoch (-1 = frontier empty)."""
        cfg = self.cfg
        t0 = time.monotonic()
        budget = cfg.budget_per_epoch
        if cfg.total_page_budget:
            budget = min(budget, cfg.total_page_budget - self.seq)
            if budget <= 0:
                return -1
        trace = os.environ.get("MONOCATOR_TRACE")
        tm = time.monotonic
        t_peek = tm()
        peeks = ray.get([s.peek.remote(self.epoch, budget) for s in self.shards])
        keys = pa.concat_tables(peeks)
        t_pop = tm()
        if keys.num_rows == 0:
            sizes = ray.get([s.pop_upto.remote(None) for s in self.shards])  # clear staging
            del sizes
            if sum(ray.get([s.frontier_size.remote() for s in self.shards])) == 0:
                return -1
            # politeness deferral: jump virtual time straight to the first
            # epoch at which ANY shard can stage a URL — identical state to
            # stepping (the saturating token update composes), but the tail's
            # empty epochs cost one RPC round total instead of one each
            nexts = ray.get([s.next_ready_epoch.remote(self.epoch) for s in self.shards])
            ready = [x for x in nexts if x is not None]
            nxt = max(self.epoch + 1, min(ready)) if ready else self.epoch + 1
            # clamp so CrawlResult.epochs matches the stepping engine's stop
            self.epoch = min(nxt, self.cfg.max_epochs)
            return 0
        if keys.num_rows > budget:
            ks = _key_sort(keys)
            cutoff = (
                int(ks["depth"][budget - 1].as_py()),
                int(ks["host_hash"][budget - 1].as_py()),
                int(ks["discovery_time"][budget - 1].as_py()),
                int(ks["url_hash"][budget - 1].as_py()),
            )
        else:
            cutoff = None
        pops = ray.get([s.pop_upto.remote(cutoff) for s in self.shards])
        taken = _key_sort(pa.concat_tables(pops))
        n = taken.num_rows
        if n == 0:
            self.epoch += 1
            return 0
        seqs = np.arange(self.seq, self.seq + n, dtype=np.int64)
        self.seq += n
        hh = taken["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        taken = (
            taken.append_column("seq", pa.array(seqs, pa.int64()))
            .append_column("epoch", pa.array(np.full(n, self.epoch, dtype=np.int32), pa.int32()))
            .append_column(
                "shard_id",
                pa.array((hh % np.uint64(cfg.num_shards)).astype(np.int32), pa.int32()),
            )
        )

        edir = os.path.join(self.out_dir, f"epoch={self.epoch}")
        os.makedirs(edir, exist_ok=True)
        t_proc = tm()
        # inline only while no worker pool exists (politeness-tail crawls);
        # once workers are up their caches are warm — routing a tiny epoch
        # through them beats a cold driver-local fetch by ~100x
        if n <= cfg.inline_threshold and self._workers is None and cfg.epoch_engine == "workers":
            links, errors = self._process_inline(taken, edir)
        elif cfg.epoch_engine == "workers":
            links, errors = self._process_workers(taken, edir)
        elif n <= cfg.inline_threshold:
            links, errors = self._process_inline(taken, edir)
        else:
            links, errors = self._process_distributed(taken, edir)
        t_dedup = tm()
        if links is not None and links.num_rows:
            links = first_wins_dedup(links)
            self._offer_all(links)
        t_end = tm()
        if trace:
            print(
                f"[epoch {self.epoch}] n={n} peek={t_pop - t_peek:.2f}s "
                f"pop+sort={t_proc - t_pop:.2f}s process={t_dedup - t_proc:.2f}s "
                f"dedup+offer={t_end - t_dedup:.2f}s total={t_end - t0:.2f}s"
            )

        wall_ms = int((time.monotonic() - t0) * 1000)
        stats = ray.get([s.stats.remote() for s in self.shards])
        # per-epoch phase decomposition (BASELINE.md scale-ladder evidence):
        # driver-side phases are timed directly; worker-pool fetch/extract/
        # write/link seconds are drained from the actors (sum over the pool,
        # so e.g. fetch_s > wall means the phase ran on several actors)
        phases = {
            "peek_ms": int((t_pop - t_peek) * 1000),
            "pop_ms": int((t_proc - t_pop) * 1000),
            "process_ms": int((t_dedup - t_proc) * 1000),
            "offer_ms": int((t_end - t_dedup) * 1000),
            "fetch_ms": 0, "extract_ms": 0, "write_ms": 0, "link_ms": 0,
        }
        if self._workers is not None:
            pool = (self._workers or []) + (self._fetchers or [])
            for p in ray.get([w.take_phase_stats.remote() for w in pool]):
                phases["fetch_ms"] += int(p["fetch_s"] * 1000)
                phases["extract_ms"] += int(p["extract_s"] * 1000)
                phases["write_ms"] += int(p["write_s"] * 1000)
                phases["link_ms"] += int(p["link_s"] * 1000)
        self._record_lineage(edir, stats, wall_ms, errors, phases)
        if cfg.checkpoint_every and (self.epoch % cfg.checkpoint_every == 0):
            self._checkpoint(edir)
        self.epoch += 1
        return n

    def _process_distributed(self, taken: pa.Table, edir: str):
        """Epoch body as a Ray Data pipeline (the scale path)."""
        import ray.data as rd

        cfg = self.cfg
        n = taken.num_rows
        # bucket-locality: sort the epoch's rows by host_hash so each fetch
        # batch touches few page-store buckets (seq is already assigned, so
        # physical order is free to change)
        hh_sort = np.argsort(
            taken["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64), kind="stable"
        )
        taken = taken.take(pa.array(hh_sort))
        nblocks = max(
            1,
            min(
                int(ray.cluster_resources().get("CPU", 4)),
                (n + cfg.fetch_batch_size - 1) // cfg.fetch_batch_size,
            ),
        )
        ds = rd.from_arrow(taken)
        if nblocks > 1:
            ds = ds.repartition(nblocks)
        ds = ds.map_batches(
            SyntheticFetcher,
            fn_constructor_kwargs={"pages_dir": self.pages_dir, "num_buckets": cfg.num_buckets},
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size,
            concurrency=cfg.fetch_concurrency,
        )
        ds = ds.map_batches(
            ExtractStage,
            fn_constructor_kwargs={"link_cap": cfg.link_cap, "with_vat": cfg.with_vat},
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            concurrency=cfg.extract_concurrency,
        )
        mat = ds.materialize()
        # ONE combined columnar write per epoch; the visit_log/pages/features
        # artifacts are column projections of it at read time (parquet is
        # columnar, so each view reads only its columns)
        mat.write_parquet(os.path.join(edir, "crawl"))
        links_parts = (
            mat.select_columns(["links", "seq", "depth", "url_hash"])
            .map_batches(explode_links, batch_format="pyarrow")
            .map_batches(self.link_filter, batch_format="pyarrow")
            .to_arrow_refs()
        )
        link_tables = [t for t in ray.get(links_parts) if t.num_rows] if links_parts else []
        links = pa.concat_tables(link_tables, promote_options="default") if link_tables else None
        import pyarrow.compute as pc

        errors = int(pc.sum(pc.not_equal(_concat_col(mat, "fetch_status"), 200)).as_py() or 0)
        return links, errors

    def _worker_pool(self):
        """Two dedicated pools: IO fetchers (bucket-owned, queues never block
        on compute) and CPU extractors (fed in fetch-completion order) —
        mixing them in one pool head-of-line-blocks actor FIFO queues."""
        if self._workers is None:
            cfg = self.cfg
            total_cpu = float(ray.cluster_resources().get("CPU", 4))
            avail = total_cpu - cfg.num_shards * cfg.shard_cpus - 0.5
            n = cfg.num_workers or max(2, int(avail))
            n_fetch = max(2, n // 3)
            n_extract = max(1, n - n_fetch)
            # shrink until the pools actually fit the session's CPU budget —
            # over-subscribed actors pend forever (no preemption in Ray);
            # the floor is ONE fetcher + ONE extractor
            fetch_cpu, extract_cpu = 0.5, 1.0
            while (n_fetch > 1 or n_extract > 1) and (
                n_fetch * fetch_cpu + n_extract * extract_cpu
            ) > avail:
                if n_extract > 1 and (n_extract >= n_fetch * 2 or n_fetch == 1):
                    n_extract -= 1
                else:
                    n_fetch -= 1
            # tiny sessions (shards already reserve most CPUs): scale the
            # per-actor request down so the minimum pool still schedules
            # instead of pending forever
            min_demand = n_fetch * fetch_cpu + n_extract * extract_cpu
            if min_demand > max(avail, 0.2):
                scale = max(avail, 0.2) / min_demand
                fetch_cpu = max(0.1, fetch_cpu * scale)
                extract_cpu = max(0.1, extract_cpu * scale)
            kwargs = dict(
                pages_dir=self.pages_dir,
                num_buckets=cfg.num_buckets,
                link_cap=cfg.link_cap,
                with_vat=cfg.with_vat,
                max_depth=cfg.max_depth,
                blacklist=cfg.blacklist,
                robots_rules=self.robots,
                shards=self.shards,
                rg_cache_mb=cfg.rg_cache_mb,
            )
            # fetchers are mostly cache hits after warmup: half a CPU each
            Fetcher = ray.remote(num_cpus=fetch_cpu)(EpochWorker)
            Extractor = ray.remote(num_cpus=extract_cpu)(EpochWorker)
            self._fetchers = [Fetcher.remote(**kwargs) for _ in range(n_fetch)]
            self._workers = [Extractor.remote(**kwargs) for _ in range(n_extract)]
        return self._workers

    def _process_workers(self, taken: pa.Table, edir: str):
        """Persistent-pool epoch body (crawl/workers.py): one RPC round,
        warm bucket caches, workers write their own parts."""
        workers = self._worker_pool()
        nw = len(workers)
        # bucket -> worker affinity: each page-store bucket is loaded by one
        # worker for the whole crawl (cold bucket builds dominate otherwise);
        # buckets hash-mix hosts so groups are roughly even
        hh = taken["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (hh % np.uint64(self.cfg.num_buckets)).astype(np.int64)
        # (bucket, host_hash) sort -> chunks are host-contiguous, so the
        # fetcher's row-group pruning reads a tight host range per chunk
        order = np.lexsort((hh, bucket))
        taken = taken.take(pa.array(order))
        bucket = bucket[order]
        # two-phase epoch: (1) fetch on the chunk's bucket OWNER (strict
        # b % nw routing -> each store row group decodes once per crawl,
        # then cache-hits), (2) extract round-robin over the whole pool —
        # this is the hot-host salting (SPEC): a Zipf-hot host's chunks all
        # fetch from one owner's cache (cheap) but extract on every worker
        # (the CPU-bound phase is spread).  Politeness is unaffected — it
        # was already enforced at pop time, host-sharded.
        nf = len(self._fetchers)
        # small chunks bound the epoch-barrier tail (heavy-tailed task times
        # under full load): floor 64 keeps BFS ramp-up epochs spread over the
        # whole pool, ~6 waves amortize stragglers
        salt_chunk = min(1024, max(64, taken.num_rows // (6 * nw)))
        # tail epochs fetch SCATTERED Zipf-tail pages: each url decodes a
        # cold row group, so a 64-url owner-bound chunk serializes seconds
        # of decode on one fetcher while the pool idles.  Ownership only
        # pays off via warm caches — cold-anyway small epochs spread fine
        # chunks round-robin over every fetcher instead.
        tail_epoch = taken.num_rows <= 4 * salt_chunk * nf
        if tail_epoch:
            salt_chunk = max(8, salt_chunk // 8)
        fetch_refs = []
        rr_f = 0
        # hot-BUCKET salting (the mega-host case the SPEC's "salt hot hosts"
        # is about): a Zipf-head host can fill a whole epoch by itself, and
        # its pages all live in ONE bucket — strict owner affinity would
        # serialize the epoch on one fetcher's FIFO queue (measured: the
        # head-host depth cohorts of a 960k-page web ran 114-145 s vs 9-20 s
        # for balanced epochs).  Chunks are contiguous in (host_hash, url)
        # order, so their pruned row-groups are DISJOINT — non-owner
        # fetchers decode each group exactly once, no cache penalty — and
        # the visit order/artifacts are fixed before dispatch, so placement
        # cannot change results.  Buckets above the per-fetcher fair share
        # round-robin; balanced buckets keep warm-cache owner affinity.
        fair = -(-taken.num_rows // max(1, nf))
        for b in np.unique(bucket):
            lo = int(np.searchsorted(bucket, b, side="left"))
            hi = int(np.searchsorted(bucket, b, side="right"))
            owner = self._fetchers[int(b) % nf]
            hot_bucket = (hi - lo) > fair
            for s in range(lo, hi, salt_chunk):
                chunk = taken.slice(s, min(salt_chunk, hi - s))
                if tail_epoch or hot_bucket:
                    owner = self._fetchers[rr_f % nf]
                    rr_f += 1
                fetch_refs.append(owner.fetch_chunk.remote(chunk))
        # PULL-model extract dispatch: a chunk is assigned the moment a
        # worker frees up, never round-robin — with heavy-tailed chunk times
        # (max ~2-3x median under full load) round-robin lands several slow
        # chunks on one worker and the epoch barrier waits on it (measured
        # ~40% pool idle at 32 cpus); one-outstanding-task pull bounds the
        # tail to a single chunk.  Extracts still start in fetch-COMPLETION
        # order (actor FIFO queues would head-of-line block otherwise).
        from collections import deque

        trace = os.environ.get("MONOCATOR_TRACE")
        t_submit = time.monotonic()
        pending_fetch = {r: i for i, r in enumerate(fetch_refs)}
        ready: deque = deque()  # (fetched_ref, chunk_idx)
        idle: deque = deque(workers)
        running: dict = {}  # extract_ref -> worker
        results = []
        fetchers_released = False
        while pending_fetch or ready or running:
            if not pending_fetch and not fetchers_released:
                # fetch queues drained: fetchers join the extract pool (only
                # now — an extract enqueued earlier would head-of-line block
                # behind their remaining fetch_chunk tasks)
                idle.extend(self._fetchers)
                fetchers_released = True
            while idle and ready:
                w = idle.popleft()
                fref, i = ready.popleft()
                out_file = os.path.join(edir, "crawl", f"part-{i}.parquet")
                running[w.extract_write.remote(fref, out_file)] = w
            t_w = time.monotonic()
            done, _ = ray.wait(list(pending_fetch) + list(running), num_returns=1)
            d = done[0]
            if trace:
                gap = time.monotonic() - t_w
                if gap > 1.0:
                    kind = "fetch" if d in pending_fetch else "extract"
                    print(f"  [pw-gap] {gap:.2f}s waiting ({kind} done; "
                          f"pf={len(pending_fetch)} run={len(running)} ready={len(ready)} idle={len(idle)})")
            if d in pending_fetch:
                ready.append((d, pending_fetch.pop(d)))
            else:
                idle.append(running.pop(d))
                results.append(ray.get(d))
        if trace:
            print(f"  [pw] chunks={len(fetch_refs)} pull_loop={time.monotonic() - t_submit:.2f}s")
        # workers offered links directly to the shards and returned the
        # offer ObjectRefs; awaiting them here is the epoch barrier that
        # guarantees every offer landed before the next peek's flush
        offer_refs = []
        link_tables = []
        for lt, _err in results:
            if isinstance(lt, list):
                offer_refs.extend(lt)
            elif lt is not None and lt.num_rows:
                link_tables.append(lt)
        if offer_refs:
            ray.get(offer_refs)
        if trace:
            print(f"  [pw] offers={len(offer_refs)} done={time.monotonic() - t_submit:.2f}s")
        links = pa.concat_tables(link_tables, promote_options="default") if link_tables else None
        return links, sum(err for _lt, err in results)

    def _process_inline(self, taken: pa.Table, edir: str):
        """Small-epoch fast path: same stage functions, driver-local — the
        politeness tail is hundreds of tiny epochs and Dataset/actor-pool
        startup would dominate (identical output by construction)."""
        if self._inline_fetch is None:
            self._inline_fetch = SyntheticFetcher(self.pages_dir, self.cfg.num_buckets)
            self._inline_extract = ExtractStage(self.cfg.link_cap, self.cfg.with_vat)
        full = self._inline_extract(self._inline_fetch(taken))
        pq.write_table(full, os.path.join(_mk(edir, "crawl"), "part-0.parquet"))
        links = self.link_filter(explode_links(full.select(["links", "seq", "depth", "url_hash"])))
        import pyarrow.compute as pc

        errors = int(pc.sum(pc.not_equal(full["fetch_status"], 200)).as_py() or 0)
        return (links if links.num_rows else None), errors

    def _fused_dispatch(self, taken: pa.Table, edir: str) -> list:
        """Async-mode dispatch: the round's chunks as fused
        ``process_chunk`` tasks (fetch+extract+write+offer in one task)
        over the COMBINED pool — owner-affine for warm bucket caches, hot
        buckets salted round-robin exactly like the BSP fetch path."""
        self._worker_pool()
        pool = (self._fetchers or []) + (self._workers or [])
        npool = len(pool)
        hh = taken["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bucket = (hh % np.uint64(self.cfg.num_buckets)).astype(np.int64)
        order = np.lexsort((hh, bucket))
        taken = taken.take(pa.array(order))
        bucket = bucket[order]
        salt_chunk = min(1024, max(64, taken.num_rows // (6 * npool)))
        fair = -(-taken.num_rows // npool)
        refs = []
        rr = 0
        i = 0
        for b in np.unique(bucket):
            lo = int(np.searchsorted(bucket, b, side="left"))
            hi = int(np.searchsorted(bucket, b, side="right"))
            owner = pool[int(b) % npool]
            hot_bucket = (hi - lo) > fair
            for s in range(lo, hi, salt_chunk):
                chunk = taken.slice(s, min(salt_chunk, hi - s))
                w = owner
                if hot_bucket:
                    w = pool[rr % npool]
                    rr += 1
                out_file = os.path.join(edir, "crawl", f"part-{i}.parquet")
                i += 1
                refs.append(w.process_chunk.remote(chunk, out_file))
        return refs

    def _run_async(self) -> CrawlResult:
        """Bounded-staleness frontier loop (cfg.async_rounds > 0): shards
        keep serving politeness-ready URLs while up to ``async_rounds``
        earlier rounds' fetch/extract/offer work is still in flight; the
        driver barriers only on the OLDEST round.  Checkpoints quiesce
        (drain all in-flight rounds) before committing.  See the
        ``async_rounds`` config comment for the semantics contract."""
        from collections import deque

        cfg = self.cfg
        t0 = time.monotonic()
        fetched = 0
        idle = 0
        errors_total = 0
        inflight: deque = deque()  # (epoch_no, [process_chunk refs])

        def drain_oldest() -> None:
            nonlocal errors_total
            _e, refs = inflight.popleft()
            offer_refs: list = []
            link_tables: list[pa.Table] = []
            for lt, err in ray.get(refs):
                errors_total += err
                if isinstance(lt, list):
                    offer_refs.extend(lt)
                elif lt is not None and lt.num_rows:
                    link_tables.append(lt)
            if link_tables:
                self._offer_all(
                    first_wins_dedup(pa.concat_tables(link_tables,
                                                      promote_options="default")))
            if offer_refs:
                ray.get(offer_refs)

        while self.epoch < cfg.max_epochs:
            budget = cfg.budget_per_epoch
            if cfg.total_page_budget:
                budget = min(budget, cfg.total_page_budget - self.seq)
                if budget <= 0:
                    break
            while len(inflight) >= cfg.async_rounds:
                drain_oldest()
            tr0 = time.monotonic()
            peeks = ray.get([s.peek.remote(self.epoch, budget) for s in self.shards])
            keys = pa.concat_tables(peeks)
            if keys.num_rows == 0:
                ray.get([s.pop_upto.remote(None) for s in self.shards])
                if inflight:
                    # offers of in-flight rounds may still land — quiesce
                    # one round and retry at the SAME virtual epoch
                    drain_oldest()
                    continue
                if sum(ray.get([s.frontier_size.remote() for s in self.shards])) == 0:
                    break
                nexts = ray.get([s.next_ready_epoch.remote(self.epoch)
                                 for s in self.shards])
                ready = [x for x in nexts if x is not None]
                nxt = max(self.epoch + 1, min(ready)) if ready else self.epoch + 1
                self.epoch = min(nxt, cfg.max_epochs)
                idle += 1
                if idle > 10_000:
                    break
                continue
            idle = 0
            if keys.num_rows < budget // 2 and inflight:
                # partial-round top-up: the ready set is small only because
                # earlier rounds' offers haven't landed — quiesce ONE round
                # and re-peek at the same virtual epoch.  Fewer, fuller
                # rounds amortize dispatch + hot-bucket salting (measured:
                # the 1x async penalty was exactly this); when the backlog
                # is deep (the scale tiers) peek returns a full budget and
                # this branch never fires, so the overlap win is untouched.
                ray.get([s.pop_upto.remote((-1, 0, 0, 0)) for s in self.shards])
                drain_oldest()
                continue
            if keys.num_rows > budget:
                ks = _key_sort(keys)
                cutoff = (
                    int(ks["depth"][budget - 1].as_py()),
                    int(ks["host_hash"][budget - 1].as_py()),
                    int(ks["discovery_time"][budget - 1].as_py()),
                    int(ks["url_hash"][budget - 1].as_py()),
                )
            else:
                cutoff = None
            pops = ray.get([s.pop_upto.remote(cutoff) for s in self.shards])
            taken = _key_sort(pa.concat_tables(pops))
            n = taken.num_rows
            if n == 0:
                self.epoch += 1
                continue
            seqs = np.arange(self.seq, self.seq + n, dtype=np.int64)
            self.seq += n
            hh = taken["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            taken = (
                taken.append_column("seq", pa.array(seqs, pa.int64()))
                .append_column("epoch", pa.array(
                    np.full(n, self.epoch, dtype=np.int32), pa.int32()))
                .append_column("shard_id", pa.array(
                    (hh % np.uint64(cfg.num_shards)).astype(np.int32), pa.int32()))
            )
            edir = os.path.join(self.out_dir, f"epoch={self.epoch}")
            os.makedirs(edir, exist_ok=True)
            inflight.append((self.epoch, self._fused_dispatch(taken, edir)))
            fetched += n
            wall_ms = int((time.monotonic() - tr0) * 1000)
            stats = ray.get([s.stats.remote() for s in self.shards])
            # async lineage: offered/new deltas reflect offers landed so
            # far (in-flight rounds attribute to a later row); errors are
            # counted at drain time, reported in CrawlResult.errors; the
            # worker phase sums cover work COMPLETED since the last round
            # (in-flight chunks attribute forward, like the offers)
            phases = {"peek_ms": 0, "pop_ms": 0, "process_ms": wall_ms,
                      "offer_ms": 0, "fetch_ms": 0, "extract_ms": 0,
                      "write_ms": 0, "link_ms": 0}
            pool = (self._workers or []) + (self._fetchers or [])
            if pool:
                for p in ray.get([w.take_phase_stats.remote() for w in pool]):
                    phases["fetch_ms"] += int(p["fetch_s"] * 1000)
                    phases["extract_ms"] += int(p["extract_s"] * 1000)
                    phases["write_ms"] += int(p["write_s"] * 1000)
                    phases["link_ms"] += int(p["link_s"] * 1000)
            self._record_lineage(edir, stats, wall_ms, 0, phases)
            if cfg.checkpoint_every and (self.epoch % cfg.checkpoint_every == 0):
                while inflight:  # checkpoints are quiescent points
                    drain_oldest()
                self._checkpoint(edir)
            self.epoch += 1
            if cfg.total_page_budget and self.seq >= cfg.total_page_budget:
                break
        while inflight:
            drain_oldest()
        ray.get([w.flush_writes.remote()
                 for w in (self._workers or []) + (self._fetchers or [])])
        stats = ray.get([s.stats.remote() for s in self.shards])
        return CrawlResult(
            out_dir=self.out_dir,
            epochs=self.epoch,
            fetched=fetched,
            errors=errors_total,
            seen=sum(s["seen"] for s in stats),
            wall_s=time.monotonic() - t0,
            lineage=self.lineage_rows,
        )

    def _record_lineage(self, edir: str, stats: list[dict], wall_ms: int,
                        errors: int, phases: dict) -> None:
        for st in stats:
            prev = self._prev_stats[st["shard_id"]]
            self.lineage_rows.append(
                {
                    "epoch": self.epoch,
                    "shard_id": st["shard_id"],
                    "partition_id": st["shard_id"],
                    "urls_in": st["offered"] - prev["offered"],
                    "fetched": st["fetched"] - prev["fetched"],
                    # error counts are epoch-level (the fetch path doesn't
                    # attribute per-shard); record once on shard 0's row so
                    # summing lineage errors equals the true total (ADVICE r1)
                    "errors": errors if st["shard_id"] == 0 else 0,
                    "new_urls": st["new"] - prev["new"],
                    "dedup_dropped": st["dup_dropped"] - prev["dup_dropped"],
                    "wall_ms": wall_ms,
                    # phase columns are epoch-level; recorded once on shard
                    # 0's row (like errors) so sums over lineage are true
                    **(phases if st["shard_id"] == 0 else
                       {k: 0 for k in phases}),
                }
            )
            self._prev_stats[st["shard_id"]] = {
                k: st[k] for k in ("offered", "fetched", "new", "dup_dropped")
            }
        self._write_lineage(edir)

    def _write_lineage(self, edir: str) -> None:
        rows = [r for r in self.lineage_rows if r["epoch"] == self.epoch]
        if rows:
            pq.write_table(pa.Table.from_pylist(rows), os.path.join(edir, "lineage.parquet"))

    def _checkpoint(self, edir: str) -> None:
        """Shard-side parallel checkpoint: every shard writes its own files
        (no driver funnel), the driver only collects counters and commits
        the manifest LAST (manifest-last = the store-family crash rule).
        The first checkpoint of a chain is a full snapshot; the next
        cfg.full_checkpoint_every-1 are delta spans."""
        ckpt = os.path.join(edir, "checkpoint")
        os.makedirs(ckpt, exist_ok=True)
        full = (not self._ckpt_chain) or len(self._ckpt_chain) >= self.cfg.full_checkpoint_every
        # artifact writes of epochs <= this one must be durable before the
        # _SUCCESS marker commits (resume purges only epochs AFTER the
        # manifest's); flushing runs concurrently with the shard dumps
        flush_refs = [w.flush_writes.remote()
                      for w in (self._workers or []) + (self._fetchers or [])]
        dump_refs = [s.dump_checkpoint.remote(ckpt, full) for s in self.shards]
        counters = ray.get(dump_refs)
        ray.get(flush_refs)
        manifest = {
            "epoch": self.epoch,
            "seq": self.seq,
            "num_shards": self.cfg.num_shards,
            "mode": "full" if full else "delta",
            # for a delta span: the epoch of the PREVIOUS checkpoint in the
            # chain (restore walks these pointers back to the full snapshot)
            "base_epoch": None
            if full
            else int(os.path.basename(self._ckpt_chain[-1]).split("=")[1]),
            "counters": counters,
        }
        with open(os.path.join(ckpt, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        with open(os.path.join(edir, "_SUCCESS"), "w") as f:
            f.write("")
        self._ckpt_chain = [edir] if full else self._ckpt_chain + [edir]
        if full and self.cfg.gc_checkpoints:
            self._gc_checkpoints(edir)

    def _gc_checkpoints(self, current_edir: str) -> None:
        """Drop checkpoint payloads + _SUCCESS markers of epochs BEFORE the
        just-committed full snapshot (crawl artifacts stay).  Runs only
        AFTER the new full's _SUCCESS is on disk, so a crash at any point
        here leaves the latest restorable chain intact — partial GC just
        leaves some unreferenced old files."""
        cur = int(os.path.basename(current_edir).split("=")[1])
        for name in os.listdir(self.out_dir):
            if not name.startswith("epoch=") or int(name.split("=")[1]) >= cur:
                continue
            d = os.path.join(self.out_dir, name)
            ck = os.path.join(d, "checkpoint")
            marker = os.path.join(d, "_SUCCESS")
            if os.path.exists(marker):
                os.remove(marker)  # marker first: never a _SUCCESS without files
            if os.path.isdir(ck):
                shutil.rmtree(ck)

    def restore_from(self, edir: str) -> None:
        ckpt = os.path.join(edir, "checkpoint")
        with open(os.path.join(ckpt, "manifest.json")) as f:
            manifest = json.load(f)
        # purge artifacts of epochs AFTER the checkpointed one: a crashed
        # attempt at epoch N+1 may have written some crawl parts without a
        # checkpoint; the re-run can legitimately produce a different part
        # layout (inline vs worker-pool path), so stale parts would survive
        # and duplicate seq rows in the visit log (ADVICE r1).  Chain dirs
        # are all <= the checkpointed epoch, so the purge never eats them.
        for name in os.listdir(self.out_dir):
            if name.startswith("epoch=") and int(name.split("=")[1]) > manifest["epoch"]:
                shutil.rmtree(os.path.join(self.out_dir, name))
        chain = checkpoint_chain_from(self.out_dir, edir)
        ckpt_dirs = [os.path.join(d, "checkpoint") for d in chain]
        old_n, new_n = manifest["num_shards"], self.cfg.num_shards
        if old_n == new_n:
            counters = manifest["counters"]
            ray.get(
                [
                    s.restore_checkpoint.remote(ckpt_dirs, counters[i])
                    for i, s in enumerate(self.shards)
                ]
            )
        else:
            # RESHARD on resume (the north rule's N -> 4N story): the visit
            # order is shard-count-invariant by construction (pinned at
            # 1/3/4 shards in tests), so a checkpoint taken at N shards can
            # resume on M when one count divides the other — host_hash
            # partitions then split/merge exactly (h % N == (h % M) % N).
            assert max(old_n, new_n) % min(old_n, new_n) == 0, (
                f"reshard {old_n} -> {new_n}: counts must be k-multiples "
                "(host-hash partitions only split/merge exactly then)"
            )
            zero = {"offered": 0, "new": 0, "dup_dropped": 0,
                    "capped_dropped": 0, "fetched": 0}
            srcs_per_new: list[list[int]] = []
            counters = []
            for j in range(new_n):
                if new_n > old_n:  # upscale: one source covers k siblings
                    srcs_per_new.append([j % old_n])
                    # counters are lineage TOTALS: attribute each old
                    # shard's to its first sibling, zeros elsewhere —
                    # totals conserved, per-shard attribution restarts
                    counters.append(dict(manifest["counters"][j]) if j < old_n else dict(zero))
                else:  # downscale: merge the k sources exactly
                    srcs = [i for i in range(old_n) if i % new_n == j]
                    srcs_per_new.append(srcs)
                    merged = dict(zero)
                    for i in srcs:
                        for k in merged:
                            merged[k] += manifest["counters"][i][k]
                    counters.append(merged)
            ray.get(
                [
                    s.restore_checkpoint.remote(ckpt_dirs, counters[j], srcs_per_new[j])
                    for j, s in enumerate(self.shards)
                ]
            )
        self.seq = manifest["seq"]
        self.epoch = manifest["epoch"] + 1
        # after a reshard the old chain's files are per-OLD-shard; the next
        # checkpoint must start a fresh FULL chain at the new count (a
        # crash before it lands re-runs the same idempotent reshard)
        self._ckpt_chain = chain if old_n == new_n else []
        self._prev_stats = [
            {k: c[k] for k in ("offered", "fetched", "new", "dup_dropped")}
            for c in counters
        ]

    def run(self) -> CrawlResult:
        if self.cfg.async_rounds > 0:
            return self._run_async()
        t0 = time.monotonic()
        fetched = 0
        idle = 0
        errors_at_start = sum(r["errors"] for r in self.lineage_rows)
        while self.epoch < self.cfg.max_epochs:
            got = self.run_epoch()
            if got == -1:
                break
            if got == 0:
                idle += 1
                if idle > 10_000:
                    break
            else:
                idle = 0
                fetched += got
            if self.cfg.total_page_budget and self.seq >= self.cfg.total_page_budget:
                break
        # artifacts must be durable before the result is returned (callers
        # read visit_log/pages right after run())
        ray.get([w.flush_writes.remote()
                 for w in (self._workers or []) + (self._fetchers or [])])
        stats = ray.get([s.stats.remote() for s in self.shards])
        return CrawlResult(
            out_dir=self.out_dir,
            epochs=self.epoch,
            fetched=fetched,
            errors=sum(r["errors"] for r in self.lineage_rows) - errors_at_start,
            seen=sum(s["seen"] for s in stats),
            wall_s=time.monotonic() - t0,
            lineage=self.lineage_rows,
        )

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        for w in (self._workers or []) + (self._fetchers or []):
            ray.kill(w)


def _mk(edir: str, sub: str) -> str:
    d = os.path.join(edir, sub)
    os.makedirs(d, exist_ok=True)
    return d


def _concat_col(mat, col: str) -> pa.ChunkedArray:
    tables = ray.get(mat.select_columns([col]).to_arrow_refs())
    return pa.concat_tables(tables)[col]


def crawl(
    seeds: list[str],
    pages_dir: str,
    out_dir: str,
    config: CrawlConfig | None = None,
    robots: dict[str, RobotsRules] | None = None,
    resume: bool = False,
) -> CrawlResult:
    """Entry point 1 (full crawl) and 2 (single-domain visit = 1-row seed
    list; SURVEY.md §3.2 keeps one code path)."""
    cfg = config or CrawlConfig()
    drv = CrawlDriver(pages_dir, out_dir, cfg, robots)
    try:
        if resume:
            last = latest_checkpoint(out_dir)
            if last is not None:
                drv.restore_from(last)
            else:
                # crashed before the first checkpoint: stale partial epoch
                # dirs would duplicate seq rows — start clean (ADVICE r1)
                if os.path.isdir(out_dir):
                    shutil.rmtree(out_dir)
                os.makedirs(out_dir, exist_ok=True)
                drv.push_seeds(seeds)
        else:
            if os.path.isdir(out_dir):
                shutil.rmtree(out_dir)
            os.makedirs(out_dir, exist_ok=True)
            drv.push_seeds(seeds)
        return drv.run()
    finally:
        drv.shutdown()


def visit(
    domain: str,
    pages_dir: str,
    out_dir: str,
    config: CrawlConfig | None = None,
    robots: dict[str, RobotsRules] | None = None,
    max_pages: int = 10,
    vat: bool = True,
) -> CrawlResult:
    """Entry point 2 — single-domain visit (SURVEY.md §3.2): one VisitRequest
    through the same epoch loop (one code path), with the request's
    web.max_pages as the host cap (/root/reference/src/TODO.MD:56-77)."""
    from dataclasses import replace

    cfg = replace(config or CrawlConfig(), host_caps={domain: max_pages}, with_vat=vat)
    return crawl([f"http://{domain}/"], pages_dir, out_dir, cfg, robots=robots)


def checkpoint_chain_from(out_dir: str, edir: str) -> list[str]:
    """The restore set for checkpoint ``edir``: epoch dirs from its full
    snapshot through ``edir`` itself, commit order (walks the manifests'
    base_epoch pointers back until a ``mode == "full"`` snapshot)."""
    chain = [edir]
    while True:
        with open(os.path.join(chain[0], "checkpoint", "manifest.json")) as f:
            m = json.load(f)
        if m.get("mode", "full") == "full":
            return chain
        chain.insert(0, os.path.join(out_dir, f"epoch={m['base_epoch']}"))


def checkpoint_chain(out_dir: str) -> list[str]:
    """The latest checkpoint's restore chain ([] if no checkpoint)."""
    last = latest_checkpoint(out_dir)
    return checkpoint_chain_from(out_dir, last) if last else []


def latest_checkpoint(out_dir: str) -> str | None:
    if not os.path.isdir(out_dir):
        return None
    best = None
    best_e = -1
    for name in os.listdir(out_dir):
        if name.startswith("epoch=") and os.path.exists(os.path.join(out_dir, name, "_SUCCESS")):
            e = int(name.split("=")[1])
            if e > best_e:
                best_e, best = e, os.path.join(out_dir, name)
    return best


def artifact_files(out_dir: str) -> list[str]:
    """All combined crawl parquet files, epoch order."""
    files = []
    for name in sorted(os.listdir(out_dir), key=lambda n: int(n.split("=")[1]) if "=" in n else -1):
        p = os.path.join(out_dir, name, "crawl")
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
    return files


def read_visit_log(out_dir: str) -> pa.Table:
    """O1: the crawl-order artifact, totally ordered by seq (a column
    projection of the combined epoch files)."""
    parts = [pq.read_table(f, columns=VISIT_COLS) for f in artifact_files(out_dir)]
    if not parts:
        # typed empty (empty python lists infer null columns otherwise)
        from monocator_ray.schemas import VISIT_LOG

        return pa.table({c: pa.array([], VISIT_LOG.field(c).type) for c in VISIT_COLS})
    tbl = pa.concat_tables(parts)
    order = np.argsort(tbl["seq"].to_numpy(zero_copy_only=False))
    return tbl.take(pa.array(order))


def export_pages(out_dir: str, dest: str) -> None:
    """Final-artifact export: the SPEC-shape pages table
    (url, warc_ts, html, text, lang), epoch-partitioned."""
    import ray.data as rd

    from monocator_ray.schemas import PAGES, assert_schema

    files = artifact_files(out_dir)
    ds = rd.read_parquet(files, columns=PAGES_COLS)
    ds.map_batches(
        lambda t: assert_schema(t.select(PAGES_COLS), PAGES, "export_pages"),
        batch_format="pyarrow",
    ).write_parquet(dest)


def read_seen_set(out_dir: str) -> np.ndarray:
    """Final URL-seen set from the last checkpoint chain (sorted uint64):
    the full snapshot's ``seen-*`` files plus every later delta span's
    ``seen-delta-*`` files (disjoint by construction — a delta holds only
    NEW hashes)."""
    parts = []
    for d in checkpoint_chain(out_dir):
        ckpt = os.path.join(d, "checkpoint")
        parts.extend(
            pq.read_table(os.path.join(ckpt, f))["url_hash"].to_numpy(zero_copy_only=False)
            for f in sorted(os.listdir(ckpt))
            if f.startswith("seen-")
        )
    # unique, not just sort: after a reshard-on-resume, sibling shards
    # carry overlapping supersets (seen files are url_hash-only, so a
    # source's set can't be split — see FrontierShard.restore_checkpoint);
    # the SET is what callers mean.  Non-resharded runs are disjoint by
    # construction, where unique == sort.
    return np.unique(np.concatenate(parts).astype(np.uint64)) if parts else np.empty(0, dtype=np.uint64)
