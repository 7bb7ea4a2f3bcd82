"""robots.txt parsing + rule evaluation (SURVEY.md §2 M11).

Google-REP-style semantics for user-agent '*': longest-prefix match wins;
Allow beats Disallow on equal length; `Crawl-delay` (non-standard but the
SPEC names crawl-delay token buckets) is honored in milliseconds.
Pure functions — invoked from the stateless link filter (disallow rules,
broadcast small-side) and from frontier shards (crawl delay).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class RobotsRules:
    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)
    crawl_delay_ms: int = 0
    # Sitemap: URLs are non-group records (sitemaps.org: "independent of
    # the user-agent line") — collected file-wide regardless of agent
    sitemaps: list[str] = field(default_factory=list)

    def allowed(self, path: str) -> bool:
        best_allow = -1
        best_dis = -1
        for p in self.allow:
            if p and path.startswith(p) and len(p) > best_allow:
                best_allow = len(p)
        for p in self.disallow:
            if p and path.startswith(p) and len(p) > best_dis:
                best_dis = len(p)
        if best_dis < 0:
            return True
        return best_allow >= best_dis


def parse_robots(text: str) -> RobotsRules:
    """Rules for user-agent '*'.

    REP grouping: consecutive ``User-agent`` lines form a group header; the
    directives that follow apply to every agent in the header.  A
    ``User-agent`` line appearing after directives starts a new group.
    """
    rules = RobotsRules()
    agents: list[str] = []
    in_header = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_header:
                agents = []
                in_header = True
            agents.append(val.lower())
            continue
        in_header = False
        if key == "sitemap":
            # non-group record: applies file-wide, but (like any other
            # directive — Google's parser behavior) it still ends a
            # User-agent header, so a following User-agent starts a group
            if val:
                rules.sitemaps.append(val)
            continue
        if "*" not in agents:
            continue
        if key == "disallow" and val:
            rules.disallow.append(val)
        elif key == "allow" and val:
            rules.allow.append(val)
        elif key == "crawl-delay":
            try:
                rules.crawl_delay_ms = int(float(val) * 1000)
            except ValueError:
                pass
    return rules


class KeyedCache:
    """A5 — generic find-or-compute memo for expensive per-key probes (the
    reference's `FullScanCache.find(ip)` pattern, /root/reference/src/
    TODO.MD:5,41).  Used for host-level metadata (robots, DNS-analog) inside
    shard/worker actors; plain dict + optional TTL on virtual epoch time."""

    def __init__(self, ttl_epochs: int = 0):
        self.ttl = ttl_epochs
        self._store: dict = {}  # key -> (value, epoch_added)
        self.hits = 0
        self.misses = 0

    def find_or_compute(self, key, compute, epoch: int = 0):
        hit = self._store.get(key)
        if hit is not None and (not self.ttl or epoch - hit[1] < self.ttl):
            self.hits += 1
            return hit[0]
        self.misses += 1
        val = compute(key)
        self._store[key] = (val, epoch)
        return val


def synth_robots(num_hosts: int) -> dict[str, RobotsRules]:
    """Deterministic per-host robots rules for the synthetic web (FIXTURES.md
    F6): every 11th host disallows /p3*, every 13th has Crawl-delay 2s,
    host0-family stays allow-all so seeds always crawl."""
    out: dict[str, RobotsRules] = {}
    for h in range(num_hosts):
        r = RobotsRules()
        if h % 11 == 7:
            r.disallow.append("/p3")
        if h % 13 == 9:
            r.crawl_delay_ms = 2000
        out[f"host{h}.example"] = r
    return out


def fetch_robots(hosts: list[str], fetcher, scheme: str = "http") -> dict[str, RobotsRules]:
    """Acquire per-host robots rules over the network — the real-deployment
    companion of ``synth_robots`` (the crawl driver takes the resulting
    dict either way).  ``fetcher`` is any batch fetch stage with the
    HttpFetcher contract (pa.Table[url] -> pa.Table[url, html,
    fetch_status, ...]).

    Availability semantics per RFC 9309 §2.3.1:
    * 2xx -> parse the body;
    * 4xx (incl. 404) -> "unavailable": crawling is ALLOWED (empty rules);
    * 5xx / transport error -> "unreachable": complete disallow (a
      conservative crawler must not assume permission it could not read).

    Scale shape: one fetcher batch per call — at a 10^10-URL frontier this
    runs inside the per-shard host-discovery pass (hosts are already
    sharded), never as a driver loop over every host."""
    import pyarrow as pa

    if not hosts:
        return {}
    batch = pa.table(
        {"url": pa.array([f"{scheme}://{h}/robots.txt" for h in hosts], pa.string())}
    )
    out = fetcher(batch)
    rules: dict[str, RobotsRules] = {}
    for host, body, status in zip(
        hosts, out["html"].to_pylist(), out["fetch_status"].to_pylist()
    ):
        if 200 <= status < 300 and body is not None:
            rules[host] = parse_robots(body.decode("utf-8", "replace"))
        elif 400 <= status < 500:
            rules[host] = RobotsRules()  # unavailable -> allow all
        else:  # 5xx or transport error: unreachable -> complete disallow
            rules[host] = RobotsRules(disallow=["/"])
    return rules
