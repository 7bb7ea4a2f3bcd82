"""Sequential spec-oracle crawl simulator (SURVEY.md §5.2 item 2).

A single-threaded, single-heap, obviously-correct implementation of the crawl
ORDER CONTRACT documented in monocator_ray/state/shards.py:

  * global priority key (depth, host_hash, discovery_time, url_hash)
  * seen-at-enqueue dedup, first-wins by priority key within an epoch
  * per-host token-bucket politeness on virtual epoch time
  * per-host page caps, robots disallow, depth cap, blacklist
  * budget-K epochs; logical discovery_time = parent_seq * LINK_STRIDE + i

It intentionally reuses the engine's *pure per-record helpers* (extract_page,
join_url, hashing) — those are pinned by their own golden/property tests —
while independently reimplementing everything the parallel machinery
distributes (frontier, politeness, dedup, epochs).  The engine's visit_log
and seen set must equal this simulator's EXACTLY, at any num_cpus/shard
count.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

from monocator_ray.hashing import hash_host64, hash_url64
from monocator_ray.html.textex import extract_page
from monocator_ray.stages.extract import LINK_STRIDE
from monocator_ray.state.robots import RobotsRules
from monocator_ray.urlnorm import canonicalize_url, host_of, join_url


@dataclass
class SimConfig:
    budget_per_epoch: int = 4096
    epoch_ms: int = 1000
    default_host_cap: int = 1_000_000_000
    default_delay_ms: int = 0
    max_pages_per_host: int = 0
    max_depth: int = 6
    link_cap: int = 64
    max_epochs: int = 10_000
    total_page_budget: int = 0
    blacklist: frozenset = frozenset()
    host_caps: dict | None = None  # host -> web_max_pages override


@dataclass
class SimResult:
    visit_log: list = field(default_factory=list)  # (seq, url, url_hash, depth, host_hash, discovery_time, status, epoch)
    seen: set = field(default_factory=set)


def _h64(s: str) -> int:
    return int(hash_url64([s])[0])


def simulate(
    seeds: list[str],
    web: dict[str, bytes],
    config: SimConfig,
    robots: dict[str, RobotsRules] | None = None,
) -> SimResult:
    cfg = config
    robots = robots or {}
    res = SimResult()
    heap: list[tuple] = []  # (depth, host_hash, discovery_time, url_hash, url)
    host_state: dict[int, list] = {}  # host_hash -> [tokens, delay, fetched, last_epoch]
    host_names: dict[int, str] = {}

    def allowed_by_robots(url: str, host: str) -> bool:
        r = robots.get(host)
        if r is None or not (r.disallow or r.allow):
            return True
        return r.allowed(url[url.find("/", 8):])

    def try_enqueue(url: str, depth: int, dt: int) -> None:
        if depth > cfg.max_depth:
            return
        host = host_of(url)
        if host in cfg.blacklist or not allowed_by_robots(url, host):
            return
        uh = _h64(url)
        if uh in res.seen:
            return
        res.seen.add(uh)
        hh = int(hash_host64([host])[0])
        if hh not in host_state:
            delay = robots.get(host, RobotsRules()).crawl_delay_ms or cfg.default_delay_ms
            cap = (cfg.host_caps or {}).get(host, cfg.max_pages_per_host)
            host_state[hh] = [float(max(cfg.epoch_ms, delay)), delay, 0, 0, cap]
            host_names[hh] = host
        heapq.heappush(heap, (depth, hh, dt, uh, url))

    # seeds: discovery_time = index, first occurrence wins
    enqueued = set()
    for i, s in enumerate(seeds):
        c = canonicalize_url(s)
        if c and c not in enqueued:
            enqueued.add(c)
            try_enqueue(c, 0, i)

    seq = 0
    epoch = 0
    while heap and epoch < cfg.max_epochs:
        if cfg.total_page_budget and seq >= cfg.total_page_budget:
            break
        budget = cfg.budget_per_epoch
        if cfg.total_page_budget:
            budget = min(budget, cfg.total_page_budget - seq)
        # stage this epoch, in global priority order
        staged: list[tuple] = []
        deferred: list[tuple] = []
        staged_per_host: dict[int, int] = {}
        while heap and len(staged) < budget:
            entry = heapq.heappop(heap)
            hh = entry[1]
            st = host_state[hh]
            # lazy token advance (identical formula to FrontierShard)
            tokens, delay, fetched, last = st[0], st[1], st[2], st[3]
            if delay > 0 and epoch > last:
                burst = float(max(cfg.epoch_ms, delay))
                st[0] = min(burst, tokens + (epoch - last) * cfg.epoch_ms)
            st[3] = epoch
            tokens, delay, fetched, cap = st[0], st[1], st[2], st[4]
            if cap and fetched >= cap:
                continue  # capped: dropped permanently
            allowance = int(tokens // delay) if delay > 0 else cfg.default_host_cap
            if cap:
                allowance = min(allowance, cap - fetched)
            if staged_per_host.get(hh, 0) < allowance:
                staged_per_host[hh] = staged_per_host.get(hh, 0) + 1
                staged.append(entry)
            else:
                deferred.append(entry)
        for e in deferred:
            heapq.heappush(heap, e)
        if not staged:
            epoch += 1
            continue
        # fetch + extract, in priority order (sequential ground truth)
        epoch_links: dict[int, tuple] = {}  # url_hash -> (key..., url, depth, dt)
        for depth, hh, dt, uh, url in staged:
            st = host_state[hh]
            st[2] += 1
            if st[1] > 0:
                st[0] -= st[1]
            html = web.get(url)
            status = 200 if html is not None else 404
            res.visit_log.append((seq, url, uh, depth, hh, dt, status, epoch))
            if html is not None:
                ex = extract_page(html)
                base = ex.base_href or url
                kept = []
                for href in ex.links:
                    child = join_url(base, href)
                    if child and len(kept) < cfg.link_cap:
                        kept.append(child)
                for i, child in enumerate(kept):
                    cd = depth + 1
                    cdt = seq * LINK_STRIDE + i
                    if cd > cfg.max_depth:
                        continue
                    chost = host_of(child)
                    if chost in cfg.blacklist or not allowed_by_robots(child, chost):
                        continue
                    cuh = _h64(child)
                    if cuh in res.seen:
                        continue
                    chh = int(hash_host64([chost])[0])
                    key = (cd, chh, cdt, cuh)
                    cur = epoch_links.get(cuh)
                    if cur is None or key < cur[0]:
                        epoch_links[cuh] = (key, child)
            seq += 1
        # first-wins in-epoch dedup resolved above; enqueue survivors
        for cuh, (key, child) in sorted(epoch_links.items(), key=lambda kv: kv[1][0]):
            try_enqueue(child, key[0], key[2])
        epoch += 1
    return res
