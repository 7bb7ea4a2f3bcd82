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


class TrapFilter:
    """Spider-trap defense for frontier links (the crawl-ops layer every
    production crawler carries — Heritrix's PathologicalPathDecideRule /
    TooManyPathSegmentsDecideRule and Nutch's urlfilter-regex defaults are
    the public models): drops URLs whose SHAPE predicts an infinite or
    worthless subtree before they cost a fetch.

    Checks (each individually toggleable via the thresholds):

    * ``max_url_len`` — oversized URLs (calendar/query explosions).
    * ``max_path_depth`` — path-segment count cap.
    * ``max_query_params`` — ``&``-separated parameter cap.
    * session-id shapes — ``[?&;](jsessionid|phpsessid|sessionid|sid|
      cfid|cftoken)=`` and 32+-char hex runs (tracking tokens fork the
      URL space per visitor: classic dedup-defeating trap).
    * calendar traps — more than ``max_date_segments`` date-like path
      segments (``/2024/01/05/...`` recursions).
    * pathological repetition — the same path segment ``max_repeat+``
      times CONSECUTIVELY (``/a/a/a/``). RE2 (Arrow's regex engine) has
      no backreferences, so this is the one check that runs per-row
      Python — but only on the rows a vectorized depth screen already
      flagged as suspicious (deep paths), so the loop touches a sliver.

    Everything else is pyarrow-compute (RE2) kernels over the whole
    batch: zero per-row Python on the happy path.  Emits either a
    filtered table (default) or, with ``annotate=True``, the input plus a
    ``trap`` bool column (for diagnostics / oracle tests)."""

    _SESSION_RE = (r"(?i)[?&;](jsessionid|phpsessid|sessionid|sid|"
                   r"cfid|cftoken)=")
    _HEX_RE = r"[0-9a-fA-F]{32}"
    # digit-leading path segments (date/calendar shapes).  RE2 has no
    # lookahead, and a trailing (/|$) would CONSUME the separator and
    # undercount adjacent segments (/01/02/ -> 1 match), so match just
    # the /digits prefix — /123abc also counts, an acceptable widening
    _DATE_SEG_RE = r"/\d{1,4}"

    def __init__(self, max_url_len: int = 2048, max_path_depth: int = 12,
                 max_query_params: int = 8, max_date_segments: int = 4,
                 max_repeat: int = 2, annotate: bool = False):
        self.max_url_len = max_url_len
        self.max_path_depth = max_path_depth
        self.max_query_params = max_query_params
        self.max_date_segments = max_date_segments
        self.max_repeat = max_repeat
        self.annotate = annotate

    def _trap_mask(self, urls: pa.ChunkedArray | pa.Array) -> np.ndarray:
        import pyarrow.compute as pc

        # strip scheme+host so path heuristics don't count '//' of http://
        paths = pc.replace_substring_regex(
            urls, pattern=r"^[a-z][a-z0-9+.-]*://[^/]*", replacement="")
        trap = pc.greater(pc.binary_length(urls),
                          self.max_url_len).to_numpy(zero_copy_only=False)
        trap |= pc.greater(
            pc.count_substring(paths, "/"),
            self.max_path_depth).to_numpy(zero_copy_only=False)
        # query params: count '=' after the first '?'
        qpos = pc.find_substring(paths, "?")
        has_q = pc.greater_equal(qpos, 0)
        nparams = pc.count_substring(paths, "=")
        trap |= pc.and_(has_q, pc.greater(
            nparams, self.max_query_params)).to_numpy(zero_copy_only=False)
        trap |= pc.match_substring_regex(
            paths, self._SESSION_RE).to_numpy(zero_copy_only=False)
        trap |= pc.match_substring_regex(
            paths, self._HEX_RE).to_numpy(zero_copy_only=False)
        trap |= pc.greater(
            pc.count_substring_regex(paths, self._DATE_SEG_RE),
            self.max_date_segments).to_numpy(zero_copy_only=False)

        # consecutive-repeat check: only rows deep enough to repeat
        deep = pc.greater(pc.count_substring(paths, "/"),
                          self.max_repeat).to_numpy(zero_copy_only=False)
        suspects = np.flatnonzero(deep & ~trap)
        if len(suspects):
            plist = paths.take(pa.array(suspects)).to_pylist()
            cap = self.max_repeat
            for j, p in zip(suspects, plist):
                segs = p.split("?", 1)[0].split("/")
                run = 1
                for a, b in zip(segs, segs[1:]):
                    run = run + 1 if (a == b and a) else 1
                    if run > cap:
                        trap[j] = True
                        break
        return trap

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            if self.annotate and "trap" not in batch.column_names:
                return batch.append_column(
                    "trap", pa.array([], pa.bool_()))
            return batch
        trap = self._trap_mask(batch["url"].combine_chunks())
        if self.annotate:
            return batch.append_column("trap", pa.array(trap, pa.bool_()))
        return batch.filter(pa.array(~trap))
