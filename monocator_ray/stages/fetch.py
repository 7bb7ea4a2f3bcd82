"""Fetch stages (SURVEY.md §2 M3 / J2).

``SyntheticFetcher`` is the sandbox stand-in for HTTP: it resolves frontier
URLs against the bucket-partitioned synthetic Parquet web
(``sources/synth.py``), missing URLs -> 404.  It is an actor-pool
``map_batches`` class: bucket tables load once and are LRU-cached per actor
(the "connection pool" analog), so batches that are host-hash-clustered hit
the cache.

``HttpFetcher`` is the real-network variant the reference's PageFetcher test
surface describes (/root/reference/src/mock-servers.MD:1-4): bounded body
size enforced even when Content-Length is absent (stream + truncate),
timeout, redirect cap.  The sandbox has no network, so it is import-gated and
unit-tested only for its truncation logic.
"""

from __future__ import annotations

import glob
import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MISSING_TS = 0  # warc_ts for 404 rows


class SyntheticFetcher:
    """map_batches / EpochWorker fetch stage.

    Reads only the store row groups whose host-hash range intersects the
    batch's hosts (the store is sorted by host within each bucket and ships a
    sidecar range index — sources/synth.py:write_store_part).  Whole-bucket
    dict loads are the fallback for stores without a sidecar.  Row-group
    pruning keeps read amplification ~1-2x regardless of store size — the
    property that matters at 100 TB, where a bucket no longer fits in a
    worker's heap.
    """

    def __init__(
        self,
        pages_dir: str,
        num_buckets: int,
        max_cached_buckets: int = 8,
        rg_cache_bytes: int = 1536 << 20,
    ):
        self.pages_dir = pages_dir
        self.num_buckets = num_buckets
        self.max_cached = max_cached_buckets
        self._cache: OrderedDict[int, dict] = OrderedDict()  # fallback dicts
        self._handles: dict[int, list] = {}  # bucket -> [(stem, ParquetFile, mins, maxs)]
        # decoded row-group LRU: a big host's groups are re-hit every epoch
        # (depth waves); decoding them once per worker is the win
        self._rg_cache: OrderedDict[tuple, tuple] = OrderedDict()  # (stem,g) -> (dict, nbytes)
        self._rg_cache_bytes = 0
        self._rg_cache_max = rg_cache_bytes

    # ---- pruned path ----
    def _bucket_handles(self, b: int) -> list | None:
        h = self._handles.get(b)
        if h is not None:
            return h
        stems = sorted(
            f[: -len(".parquet")]
            for f in glob.glob(os.path.join(self.pages_dir, f"bucket={b}", "*.parquet"))
        )
        handles = []
        for stem in stems:
            idx = stem + ".hostidx.npz"
            if not os.path.exists(idx):
                return None  # no sidecar -> fallback dict path
            z = np.load(idx)
            umins = z["umins"] if "umins" in z.files else None
            umaxs = z["umaxs"] if "umaxs" in z.files else None
            handles.append(
                (stem, pq.ParquetFile(stem + ".parquet"), z["mins"], z["maxs"], umins, umaxs)
            )
        self._handles[b] = handles
        return handles

    def _row_group_dict(self, stem: str, pf, g: int) -> dict:
        key = (stem, g)
        hit = self._rg_cache.get(key)
        if hit is not None:
            self._rg_cache.move_to_end(key)
            return hit[0]
        t = pf.read_row_groups([g], columns=["url", "warc_ts", "html", "lang"])
        d = dict(
            zip(
                t["url"].to_pylist(),
                zip(
                    t["html"].to_pylist(),
                    t["warc_ts"].to_numpy(zero_copy_only=False),
                    t["lang"].to_pylist(),
                ),
            )
        )
        nbytes = int(t.nbytes)
        self._rg_cache[key] = (d, nbytes)
        self._rg_cache_bytes += nbytes
        while self._rg_cache_bytes > self._rg_cache_max and self._rg_cache:
            _, (_, nb) = self._rg_cache.popitem(last=False)
            self._rg_cache_bytes -= nb
        return d

    def _lookup_pruned(self, handles: list, urls: list[str], hh: np.ndarray) -> dict:
        """Locate + decode EXACTLY the row group each url can live in.

        Store rows are sorted by (host_hash, url) with per-group composite
        ranges in the sidecar, so a binary search on (h, u) yields one
        candidate group per url per part (disjoint composite ranges within a
        part; parts of a bucket are near-disjoint).  A hash-only index made
        every url of a HOT host decode all ~30 of its groups (VERDICT r1
        #10 + measured 9.4 decodes/url at the bench web's Zipf head)."""
        out: dict[str, tuple] = {}
        for i, u in enumerate(urls):
            h = hh[i]
            for stem, pf, mins, maxs, umins, umaxs in handles:
                g = int(np.searchsorted(maxs, h, side="left"))
                if umaxs is not None:
                    while g < len(maxs) and maxs[g] == h and umaxs[g] < u:
                        g += 1
                    if g >= len(mins) or mins[g] > h or (mins[g] == h and umins[g] > u):
                        continue  # url falls in a gap between groups
                    row = self._row_group_dict(stem, pf, g).get(u)
                else:
                    # legacy hash-only sidecar: probe the host's whole group
                    # span (url order within a host is not indexed there)
                    row = None
                    while g < len(mins) and mins[g] <= h:
                        row = self._row_group_dict(stem, pf, g).get(u)
                        if row is not None:
                            break
                        g += 1
                if row is not None:
                    out[u] = row
                    break
        return out

    # ---- fallback whole-bucket dict path ----
    def _bucket_index(self, b: int) -> dict:
        hit = self._cache.get(b)
        if hit is not None:
            self._cache.move_to_end(b)
            return hit
        files = sorted(glob.glob(os.path.join(self.pages_dir, f"bucket={b}", "*.parquet")))
        index: dict[str, tuple] = {}
        for f in files:
            t = pq.read_table(f, columns=["url", "warc_ts", "html", "lang"])
            index.update(
                zip(
                    t["url"].to_pylist(),
                    zip(
                        t["html"].to_pylist(),
                        t["warc_ts"].to_numpy(zero_copy_only=False),
                        t["lang"].to_pylist(),
                    ),
                )
            )
        self._cache[b] = index
        while len(self._cache) > self.max_cached:
            self._cache.popitem(last=False)
        return index

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        hh = batch["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        buckets = (hh % np.uint64(self.num_buckets)).astype(np.int64)
        n = len(urls)
        htmls: list = [None] * n
        ts = np.zeros(n, dtype="datetime64[us]")
        langs: list = [""] * n
        status = np.full(n, 404, dtype=np.int32)
        for b in np.unique(buckets):
            sel = np.nonzero(buckets == b)[0]
            handles = self._bucket_handles(int(b))
            if handles is not None:
                index = self._lookup_pruned(handles, [urls[i] for i in sel], hh[sel])
            else:
                index = self._bucket_index(int(b))
            for i in sel:
                row = index.get(urls[i])
                if row is not None:
                    htmls[i], ts[i], langs[i] = row
                    status[i] = 200
        return (
            batch.append_column("html", pa.array(htmls, pa.binary()))
            .append_column("warc_ts", pa.Array.from_pandas(ts, type=pa.timestamp("us")))
            .append_column("lang", pa.array(langs, pa.string()))
            .append_column("fetch_status", pa.array(status, pa.int32()))
        )


def truncate_body(chunks, max_bytes: int) -> tuple[bytes, bool]:
    """Max-body enforcement with NO Content-Length header: stream chunks and
    truncate (the reference's PageFetcherTest case
    `fetchPageWithoutContentLengthHeaderAndBodyLengthOverMax`,
    /root/reference/src/mock-servers.MD:4)."""
    out = bytearray()
    truncated = False
    for chunk in chunks:
        room = max_bytes - len(out)
        if room <= 0:
            truncated = True
            break
        if len(chunk) > room:
            out += chunk[:room]
            truncated = True
            break
        out += chunk
    return bytes(out), truncated


class HttpFetcher:
    """Real-network fetcher (actor pool) — the virtual-thread analog of the
    reference's fetch loop (/root/reference/pom.xml:22-23): each batch fans
    out over a per-actor thread pool with PER-HOST SERIALIZATION (one
    in-flight request per host; hosts run concurrently), so one slow host
    never serializes the whole batch.  Bounded body size is enforced even
    without a Content-Length header (stream + truncate), the redirect cap is
    enforced via a bounded HTTPRedirectHandler, and transport errors
    (timeout/DNS/conn) record status -1.

    The sandbox has no outbound network: constructing it raises unless the
    caller opts in with ``allow_network=True`` (local-socket tests do).
    The per-batch output contract matches SyntheticFetcher's columns.
    """

    def __init__(
        self,
        timeout_s: float = 10.0,
        max_body: int = 1 << 20,
        max_redirects: int = 5,
        max_concurrency: int = 32,
        allow_network: bool = False,
        ssl_context=None,
    ):
        if not allow_network:
            raise RuntimeError(
                "HttpFetcher needs outbound network; pass allow_network=True "
                "to opt in (the graft sandbox has none — use SyntheticFetcher)"
            )
        import urllib.request

        self.timeout_s = timeout_s
        self.max_body = max_body
        self.max_concurrency = max_concurrency

        class _CappedRedirect(urllib.request.HTTPRedirectHandler):
            max_redirections = max_redirects
            max_repeats = max_redirects

        handlers = [_CappedRedirect]
        if ssl_context is not None:
            # https with a caller-supplied trust store (CA pinning / test
            # CAs); default context otherwise — certificate verification
            # stays ON either way
            handlers.append(urllib.request.HTTPSHandler(context=ssl_context))
        self._opener = urllib.request.build_opener(*handlers)
        self._pool = None  # built lazily (ThreadPoolExecutor doesn't pickle)

    @staticmethod
    def _decompress_capped(body: bytes, enc: str, cap: int) -> bytes | None:
        """Decompress a gzip/deflate response body with the body cap applied
        to the DECOMPRESSED size (``max_length`` on a decompressobj), so a
        zip bomb can never expand past ``max_body`` in worker memory.  A
        truncated compressed stream still yields its decodable prefix (the
        CRC only checks at eof, which we never require).  Undecodable
        encoded bytes return None — the page is unparseable either way."""
        import zlib

        try:
            if enc == "gzip":
                d = zlib.decompressobj(16 + zlib.MAX_WBITS)
                return d.decompress(body, cap)
            # deflate: servers send both zlib-wrapped and raw streams
            try:
                return zlib.decompressobj(zlib.MAX_WBITS).decompress(body, cap)
            except zlib.error:
                return zlib.decompressobj(-zlib.MAX_WBITS).decompress(body, cap)
        except zlib.error:
            return None

    def _fetch_one(self, u: str) -> tuple[bytes | None, int]:
        import urllib.error
        import urllib.request

        try:
            # real-web servers compress; urllib sends identity by default
            req = urllib.request.Request(
                u, headers={"Accept-Encoding": "gzip, deflate"})
            with self._opener.open(req, timeout=self.timeout_s) as resp:  # noqa: S310
                body, _ = truncate_body(iter(lambda: resp.read(65536), b""), self.max_body)
                enc = (resp.headers.get("Content-Encoding") or "").lower().strip()
                # RFC 9110: x-gzip aliases gzip; 'identity' is a no-op
                # coding; anything else (multi-coding chains, br without a
                # decoder) must NOT flow downstream as html — compressed
                # bytes would poison sha256/dedup/extraction (code-review
                # r3-closing-2 finding #7)
                codings = [c.strip() for c in enc.split(",")
                           if c.strip() and c.strip() != "identity"]
                if body and codings:
                    if codings == ["gzip"] or codings == ["x-gzip"]:
                        body = self._decompress_capped(body, "gzip", self.max_body)
                    elif codings == ["deflate"]:
                        body = self._decompress_capped(body, "deflate", self.max_body)
                    else:
                        body = None  # undecodable encoding: status kept
                return body, int(resp.status)
        except urllib.error.HTTPError as e:
            return None, int(e.code)
        except Exception:
            return None, -1  # transport error (timeout/DNS/conn/redirect cap)

    def _fetch_host(self, idxs: list[int], urls: list[str], out: list) -> None:
        # strictly sequential within a host — the batch-level politeness
        # guarantee (the scheduler's token buckets bound cross-batch rate)
        for i in idxs:
            out[i] = self._fetch_one(urls[i])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from concurrent.futures import ThreadPoolExecutor
        from urllib.parse import urlsplit

        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.max_concurrency)
        urls = batch["url"].to_pylist()
        n = len(urls)
        by_host: dict[str, list[int]] = {}
        for i, u in enumerate(urls):
            by_host.setdefault(urlsplit(u).netloc, []).append(i)
        results: list = [None] * n
        futs = [
            self._pool.submit(self._fetch_host, idxs, urls, results)
            for idxs in by_host.values()
        ]
        for f in futs:
            f.result()
        htmls: list = [None] * n
        ts = np.zeros(n, dtype="datetime64[us]")
        status = np.full(n, 0, dtype=np.int32)
        now = np.datetime64("now", "us")
        for i, (body, code) in enumerate(results):
            htmls[i] = body
            status[i] = code
            if body is not None:
                ts[i] = now
        return (
            batch.append_column("html", pa.array(htmls, pa.binary()))
            .append_column("warc_ts", pa.Array.from_pandas(ts, type=pa.timestamp("us")))
            .append_column("lang", pa.array([""] * n, pa.string()))
            .append_column("fetch_status", pa.array(status, pa.int32()))
        )


class ConditionalFetcher(HttpFetcher):
    """HttpFetcher + RFC 9110 §13 conditional revisits — the recrawl stage
    every production crawler has (Heritrix's FetchHistoryProcessor, Nutch's
    protocol-httpclient If-Modified-Since): rows whose batch carries
    ``etag`` / ``last_modified`` validator columns refetch conditionally
    (``If-None-Match`` preferred, ``If-Modified-Since`` as fallback per
    §13.1.3's evaluation order), and a ``304 Not Modified`` comes back as
    status 304 with NO body — the revisit pipeline keeps the prior content
    and only changed pages pay transfer + parse + dedup cost.

    Scale design: validators travel IN THE BATCH (read straight from the
    previous crawl's validator artifact), never as a driver-broadcast
    url->etag map — a 10^10-URL recrawl cannot hold its validator set in
    any single process.  Output adds nullable ``etag`` / ``last_modified``
    response-validator columns (the NEXT recrawl's input), overwriting the
    input validator columns if present.
    """

    def _fetch_one_conditional(
        self, u: str, etag: str | None, last_mod: str | None
    ) -> tuple[bytes | None, int, str | None, str | None]:
        import urllib.error
        import urllib.request

        headers = {"Accept-Encoding": "gzip, deflate"}
        # §13.1.3: a recipient MUST ignore If-Modified-Since when
        # If-None-Match is present — send only the stronger validator
        if etag:
            headers["If-None-Match"] = etag
        elif last_mod:
            headers["If-Modified-Since"] = last_mod
        try:
            req = urllib.request.Request(u, headers=headers)
            with self._opener.open(req, timeout=self.timeout_s) as resp:  # noqa: S310
                body, _ = truncate_body(
                    iter(lambda: resp.read(65536), b""), self.max_body)
                enc = (resp.headers.get("Content-Encoding") or "").lower().strip()
                codings = [c.strip() for c in enc.split(",")
                           if c.strip() and c.strip() != "identity"]
                if body and codings:
                    if codings in (["gzip"], ["x-gzip"]):
                        body = self._decompress_capped(body, "gzip", self.max_body)
                    elif codings == ["deflate"]:
                        body = self._decompress_capped(body, "deflate", self.max_body)
                    else:
                        body = None
                return (body, int(resp.status), resp.headers.get("ETag"),
                        resp.headers.get("Last-Modified"))
        except urllib.error.HTTPError as e:
            if e.code == 304:
                # not modified: the PRIOR validators remain current (§13.1);
                # carry them forward so the next recrawl revalidates too
                return None, 304, e.headers.get("ETag") or etag, \
                    e.headers.get("Last-Modified") or last_mod
            return None, int(e.code), None, None
        except Exception:
            return None, -1, None, None

    def _fetch_host_conditional(self, idxs, urls, etags, lms, out) -> None:
        for i in idxs:  # sequential within a host (politeness, as base)
            out[i] = self._fetch_one_conditional(urls[i], etags[i], lms[i])

    def __call__(self, batch: pa.Table) -> pa.Table:
        from concurrent.futures import ThreadPoolExecutor
        from urllib.parse import urlsplit

        if self._pool is None:
            self._pool = ThreadPoolExecutor(max_workers=self.max_concurrency)
        urls = batch["url"].to_pylist()
        n = len(urls)
        etags = batch["etag"].to_pylist() if "etag" in batch.column_names \
            else [None] * n
        lms = batch["last_modified"].to_pylist() \
            if "last_modified" in batch.column_names else [None] * n
        by_host: dict[str, list[int]] = {}
        for i, u in enumerate(urls):
            by_host.setdefault(urlsplit(u).netloc, []).append(i)
        results: list = [None] * n
        futs = [
            self._pool.submit(self._fetch_host_conditional,
                              idxs, urls, etags, lms, results)
            for idxs in by_host.values()
        ]
        for f in futs:
            f.result()
        htmls: list = [None] * n
        new_etag: list = [None] * n
        new_lm: list = [None] * n
        ts = np.zeros(n, dtype="datetime64[us]")
        status = np.full(n, 0, dtype=np.int32)
        now = np.datetime64("now", "us")
        for i, (body, code, et, lm) in enumerate(results):
            htmls[i] = body
            status[i] = code
            new_etag[i] = et
            new_lm[i] = lm
            if body is not None:
                ts[i] = now
        base = batch.drop_columns(
            [c for c in ("etag", "last_modified") if c in batch.column_names])
        return (
            base.append_column("html", pa.array(htmls, pa.binary()))
            .append_column("warc_ts",
                           pa.Array.from_pandas(ts, type=pa.timestamp("us")))
            .append_column("lang", pa.array([""] * n, pa.string()))
            .append_column("fetch_status", pa.array(status, pa.int32()))
            .append_column("etag", pa.array(new_etag, pa.string()))
            .append_column("last_modified", pa.array(new_lm, pa.string()))
        )
