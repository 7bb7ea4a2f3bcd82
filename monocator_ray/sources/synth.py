"""S6 — deterministic synthetic Common-Crawl-style page table (SURVEY.md §2.1).

No external data exists in the sandbox, so "the web" is a seeded, generated
Parquet table in the exact SPEC shape (url, warc_ts, html, text, lang).  The
generated HTML embeds a deterministic link graph (relative/absolute/
dot-segment/fragment/off-site/mailto links), script/style blocks, whitespace
runs, NBSP entities, titles, meta descriptions and occasional VAT strings —
so the same table exercises extraction (M4-M8), canonicalization (M1) and the
crawl frontier end to end.

Determinism: every random-looking quantity derives from
``hash_str64(f"{seed}:{page_index}:{field}")`` — independent of generation
order, batch size and parallelism.  Hosts follow a Zipf(s) size distribution
so hot-host handling is exercised (FIXTURES.md F1).

Layout: Parquet partitioned by ``bucket = host_hash % num_buckets`` (one
directory per bucket) — the synthetic-fetch stage (J2) loads only the buckets
its frontier partition touches, which is the sandbox analog of per-host HTTP.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from monocator_ray.hashing import hash_host64, hash_str64
from monocator_ray.schemas import PAGES

BASE_TS_US = 1767312000_000000  # 2026-01-02T00:00:00Z in microseconds
LANGS = ("en", "nl", "fr")


def host_name(h: int) -> str:
    return f"host{h}.example"


def page_url(h: int, k: int) -> str:
    return f"http://host{h}.example/p{k}"


def zipf_host_sizes(num_hosts: int, total_pages: int, s: float = 1.2) -> np.ndarray:
    """Pages per host ~ Zipf(s), each host >= 1 page, sum == total_pages."""
    ranks = np.arange(1, num_hosts + 1, dtype=np.float64)
    w = ranks ** (-s)
    sizes = np.maximum(1, np.floor(w / w.sum() * total_pages)).astype(np.int64)
    # distribute the rounding remainder to the largest hosts, deterministically
    diff = total_pages - int(sizes.sum())
    i = 0
    while diff != 0:
        step = 1 if diff > 0 else -1
        if sizes[i % num_hosts] + step >= 1:
            sizes[i % num_hosts] += step
            diff -= step
        i += 1
    return sizes


def _vat_checksum(first8: int) -> int:
    return 97 - (first8 % 97)


def make_vat(seed_num: int, valid: bool = True) -> str:
    """Belgian-format VAT 'BE 0xxx.xxx.xcc' with mod-97 checksum (M8).

    Mirrors the reference's VatScraper cases (/root/reference/src/
    mock-servers.MD:14-20): valid, wrongCheckSum, wrongFormat are all
    generatable from here.
    """
    base7 = 1000000 + (seed_num % 8999999)  # 10 digits total: 0 + 7 + 2-check
    chk = _vat_checksum(base7)  # checksum over the 8-digit prefix 0xxxxxxx
    if not valid:
        chk = (chk + 1) % 100
    digits = f"0{base7:07d}{chk:02d}"
    return f"BE {digits[:4]}.{digits[4:7]}.{digits[7:]}"


def _rand_u64(seed: int, idx: np.ndarray, field: str) -> np.ndarray:
    return hash_str64([f"{seed}:{int(i)}:{field}" for i in idx])


_FILLER_WORDS = (
    "data crawl engine stream batch arrow parquet frontier politeness shard "
    "extract parse token index merge spill queue budget epoch lineage "
    "vector column schema block actor worker bucket salt hash depth"
).split()


def _filler_html(rand: int, target_bytes: int) -> str:
    """Deterministic filler paragraphs (hash-varied words, whitespace runs,
    occasional inline markup) so bench pages weigh like real web pages
    (Common-Crawl mean is tens of KB) and extraction does real work."""
    if target_bytes <= 0:
        return ""
    out = []
    size = 0
    i = 0
    nw = len(_FILLER_WORDS)
    while size < target_bytes:
        words = []
        for j in range(24):
            w = _FILLER_WORDS[(rand + i * 31 + j * 7) % nw]
            if (rand + i + j) % 11 == 3:
                w = f"<b>{w}</b>"
            elif (rand + i + j) % 13 == 5:
                w = w + "&nbsp;"
            words.append(w)
        para = "<p>" + " ".join(words) + f" {i}.</p>\n  "
        out.append(para)
        size += len(para)
        i += 1
    return "".join(out)


def build_pages_batch(
    page_idx: np.ndarray,
    host_of_page: np.ndarray,
    page_in_host: np.ndarray,
    host_sizes: np.ndarray,
    num_hosts: int,
    seed: int,
    links_per_page: int = 6,
    page_bytes: int = 0,
) -> pa.Table:
    """Generate PAGES rows for the given global page indices (vector in,
    per-row HTML assembly — generation only, not a crawl hot path)."""
    n = len(page_idx)
    r_link = _rand_u64(seed, page_idx, "link")
    r_vat = _rand_u64(seed, page_idx, "vat")
    urls, htmls, langs = [], [], []
    ts = (BASE_TS_US + page_idx.astype(np.int64) * 1_000_000).astype("datetime64[us]")
    for j in range(n):
        h = int(host_of_page[j])
        k = int(page_in_host[j])
        ph = int(host_sizes[h])
        url = page_url(h, k)
        parts = [
            "<!DOCTYPE html><html><head>",
            f"<meta charset=\"utf-8\"><title>Page {k} of {host_name(h)}</title>",
            f"<meta name=\"description\" content=\"Synthetic page {k} host {h}\">",
            "<style>body { color: black; }</style>",
            "</head><body>",
            f"<h1>Host {h} — page {k}</h1>",
            "<script>var x = '<a href=\"/not-a-link\">';</script>",
            "<!-- comment text never visible -->",
            f"<p>Lorem   ipsum\tdolor&nbsp;&nbsp;sit amet, page {k} of {ph}.</p>",
        ]
        # deterministic link mix
        rl = int(r_link[j])
        targets = []
        if ph > 1:
            targets.append(f"p{(k + 1) % ph}")                      # relative
            targets.append(f"./p{(k + 2) % ph}")                     # dot-relative
            targets.append(f"/p{(rl % ph)}")                         # absolute path
            targets.append(page_url(h, (rl >> 8) % ph))              # absolute URL
        # cross-host link (off-site)
        h2 = (rl >> 16) % num_hosts
        targets.append(page_url(h2, (rl >> 24) % max(1, int(host_sizes[h2]))))
        targets.append("#fragment-only")                             # dropped by M6
        targets.append("mailto:info@example.com")                    # dropped by M6
        for t_i, t in enumerate(targets[: links_per_page + 2]):
            parts.append(f"<p>see <a href=\"{t}\">link {t_i}</a>\n   here</p>")
        # VAT strings on a deterministic subset of pages (M8 test surface)
        if h % 7 == 3 and k == h % 3:
            parts.append(f"<div>VAT: {make_vat(int(r_vat[j]))}</div>")
        elif h % 7 == 5 and k == 0:
            parts.append(f"<div>VAT: {make_vat(int(r_vat[j]), valid=False)}</div>")
        if page_bytes:
            parts.append(_filler_html(rl & 0xFFFFFF, page_bytes))
        parts.append(f"<p>Tail content {rl & 0xFFFF}.</p></body></html>")
        urls.append(url)
        htmls.append("".join(parts).encode("utf-8"))
        langs.append(LANGS[h % 3])
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.Array.from_pandas(ts, type=pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array([""] * n, pa.string()),  # text filled by the engine
            pa.array(langs, pa.string()),
        ],
        schema=PAGES,
    )


class SynthSpec:
    """Precomputed host layout for a (total_pages, num_hosts, seed) config."""

    def __init__(
        self,
        total_pages: int,
        num_hosts: int,
        seed: int = 42,
        links_per_page: int = 6,
        page_bytes: int = 0,
    ):
        self.total_pages = total_pages
        self.num_hosts = num_hosts
        self.seed = seed
        self.links_per_page = links_per_page
        self.page_bytes = page_bytes
        self.host_sizes = zipf_host_sizes(num_hosts, total_pages)
        self.host_start = np.concatenate([[0], np.cumsum(self.host_sizes)])

    def locate(self, page_idx: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """global index -> (host id, page-in-host)."""
        host = np.searchsorted(self.host_start, page_idx, side="right") - 1
        return host, page_idx - self.host_start[host]

    def batch(self, page_idx: np.ndarray) -> pa.Table:
        host, k = self.locate(np.asarray(page_idx, dtype=np.int64))
        return build_pages_batch(
            np.asarray(page_idx), host, k, self.host_sizes,
            self.num_hosts, self.seed, self.links_per_page, self.page_bytes,
        )

    def seeds(self, n: int | None = None) -> list[str]:
        """Crawl seed list: root page of the first n hosts."""
        n = self.num_hosts if n is None else min(n, self.num_hosts)
        return [page_url(h, 0) for h in range(n)]

    def frontier_snapshot(self, stride: int = 8) -> list[str]:
        """Steady-state seed list: every stride-th page plus all host roots —
        the bench analog of resuming a 10^10-URL frontier mid-crawl (the
        SPEC's design point), where the ready frontier is always >> the
        per-epoch budget instead of ramping up from a handful of roots."""
        urls = self.seeds()
        host, k = self.locate(np.arange(0, self.total_pages, stride, dtype=np.int64))
        urls.extend(page_url(int(h), int(j)) for h, j in zip(host, k))
        return urls


def write_synth_pages(
    out_dir: str,
    total_pages: int,
    num_hosts: int,
    num_buckets: int = 16,
    seed: int = 42,
    use_ray: bool | None = None,
    page_bytes: int = 0,
) -> str:
    """Materialize the synthetic web under out_dir/bucket=N/part-*.parquet.

    Bucket = hash(host) % num_buckets, so every URL of a host lives in one
    bucket file set — the synthetic-fetch actors (J2) memory-map per bucket.
    Large scales generate distributed via ray.data.range -> map_batches.
    """
    spec = SynthSpec(total_pages, num_hosts, seed, page_bytes=page_bytes)
    os.makedirs(out_dir, exist_ok=True)
    if use_ray is None:
        use_ray = total_pages > 200_000 or total_pages * max(1, page_bytes) > 2e8

    def host_hashes(urls: pa.Array) -> np.ndarray:
        hosts = [u.split("://", 1)[1].split("/", 1)[0] for u in urls.to_pylist()]
        return hash_host64(hosts)

    if not use_ray:
        tbl = spec.batch(np.arange(total_pages, dtype=np.int64))
        hh = host_hashes(tbl["url"].combine_chunks())
        buckets = (hh % np.uint64(num_buckets)).astype(np.int32)
        for b in range(num_buckets):
            mask = buckets == b
            sub = tbl.filter(pa.array(mask))
            d = os.path.join(out_dir, f"bucket={b}")
            os.makedirs(d, exist_ok=True)
            write_store_part(sub, hh[mask], os.path.join(d, "part-0"))
    else:
        import ray.data as rd

        # one generation task per BUCKET, pages pre-sorted by host hash, so
        # a bucket's parts cover DISJOINT host-hash ranges.  The earlier
        # layout (one part set per generation batch) made every part span
        # the bucket's whole host range — a single tail-page lookup then
        # decoded a candidate row group in EVERY part (measured 10x read
        # amplification on scattered fetches).  Disjoint ranges restore the
        # ~1 candidate group per url the fetcher's pruning assumes.
        host_ids, _ = spec.locate(np.arange(total_pages, dtype=np.int64))
        hh_all = hash_host64([host_name(int(h)) for h in host_ids])
        buckets_all = (hh_all % np.uint64(num_buckets)).astype(np.int32)
        part_rows = 8192

        def gen_bucket(batch: pa.Table) -> pa.Table:
            for b in batch["id"].to_pylist():
                idx = np.nonzero(buckets_all == b)[0]
                if idx.size == 0:
                    continue
                # (host_hash, url)-sorted page order so the bucket's parts
                # cover disjoint COMPOSITE ranges (see write_store_part);
                # generate + write in bounded slices so one task never holds
                # the whole bucket
                h_b, k_b = spec.locate(idx)
                urls_b = np.array([page_url(int(h), int(k)) for h, k in zip(h_b, k_b)])
                order = np.lexsort((urls_b, hh_all[idx]))
                idx = idx[order]
                d = os.path.join(out_dir, f"bucket={int(b)}")
                os.makedirs(d, exist_ok=True)
                for j, s in enumerate(range(0, idx.size, part_rows)):
                    sl = idx[s : s + part_rows]
                    t = spec.batch(sl)
                    write_store_part(t, hh_all[sl], os.path.join(d, f"part-{j}"))
            return pa.table({"n": pa.array([len(batch)], pa.int64())})

        rd.range(num_buckets).map_batches(
            gen_bucket, batch_format="pyarrow", batch_size=1
        ).materialize()
    return out_dir


# 64-row groups: a crawl's Zipf-TAIL epochs fetch scattered single pages, so
# each cold hit decodes one whole row group — 64 x 24KB = 1.5MB instead of
# 6MB at 256 rows (measured: a 64-url tail chunk cost 2.2s at 256-row
# groups).  Hot hosts still stream contiguous groups via the LRU.
STORE_ROW_GROUP = 64


def write_store_part(tbl: pa.Table, hh: np.ndarray, path_stem: str) -> None:
    """Write one page-store part: rows sorted by (host_hash, url), small row
    groups, plus a sidecar per-row-group (host_hash, url) RANGE index.

    The composite key matters: a hot host spans many row groups whose
    host-hash ranges are all identical, so a hash-only index makes every
    lookup of that host's urls decode every one of its groups (measured
    9.4 decodes/url on a Zipf web).  With the url as tie-breaker the ranges
    are totally ordered and disjoint, so the fetcher locates EXACTLY one
    candidate group per url."""
    urls = np.array(tbl["url"].to_pylist())
    order = np.lexsort((urls, hh))
    tbl = tbl.take(pa.array(order))
    hh_sorted = hh[order]
    urls_sorted = urls[order]
    pq.write_table(tbl, path_stem + ".parquet", row_group_size=STORE_ROW_GROUP)
    n = len(hh_sorted)
    ngroups = (n + STORE_ROW_GROUP - 1) // STORE_ROW_GROUP
    starts = np.arange(ngroups) * STORE_ROW_GROUP
    ends = np.minimum(n, starts + STORE_ROW_GROUP) - 1
    np.savez(
        path_stem + ".hostidx.npz",
        mins=hh_sorted[starts].astype(np.uint64),
        maxs=hh_sorted[ends].astype(np.uint64),
        umins=urls_sorted[starts],
        umaxs=urls_sorted[ends],
    )
