"""Fused per-page extraction stage (SURVEY.md §2 M4-M9 fused) and the
vectorized link-explode stage (M6 emission + M12 priority assignment).

One ``map_batches`` pass per fetched page batch produces: extracted text
(byte-identity contract — monocator_ray/html/textex.py), title, meta
description, resolved canonical out-links, internal/external link counts,
valid VAT numbers, html sha256.  HTML parsing is inherently per-document;
everything around it (hashing, ts, explode) is vectorized Arrow/numpy.

Link priority (M12): a child discovered by visit #seq at kept-link index i
gets ``discovery_time = seq * LINK_STRIDE + i`` — a *logical* clock
(SURVEY.md §4.3 hazard 1), so crawl order is parallelism-invariant.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from monocator_ray.hashing import hash_host64, hash_url64
from monocator_ray.html.textex import extract_page
from monocator_ray.stages.vat import extract_vat_numbers
from monocator_ray.urlnorm import host_of, join_url, registrable_domain

LINK_STRIDE = 4096  # max kept links per page; discovery_time = seq*STRIDE + i


class ExtractStage:
    """Actor-pool map_batches class: per-batch fused parse/extract."""

    def __init__(self, link_cap: int = 64, with_vat: bool = True):
        self.link_cap = min(link_cap, LINK_STRIDE)
        self.with_vat = with_vat

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        status = batch["fetch_status"].to_numpy(zero_copy_only=False)
        n = len(urls)
        texts = [""] * n
        titles = [""] * n
        metas = [""] * n
        links_col: list[list[str]] = [[] for _ in range(n)]
        li = np.zeros(n, dtype=np.int32)
        le = np.zeros(n, dtype=np.int32)
        vats: list[list[str]] = [[] for _ in range(n)]
        sha: list[bytes | None] = [None] * n
        noindex = np.zeros(n, dtype=bool)
        canon = [""] * n
        for i in range(n):
            if status[i] != 200 or htmls[i] is None:
                continue
            ex = extract_page(htmls[i])
            texts[i] = ex.text
            titles[i] = ex.title
            metas[i] = ex.meta_description
            sha[i] = hashlib.sha256(htmls[i]).digest()
            # page-level robots directives (public meta-robots convention):
            # noindex -> flagged for corpus/report filtering; nofollow ->
            # NO links reach the frontier (counts still report what the
            # page contains)
            robots_toks = set(ex.meta_robots.replace(",", " ").split())
            noindex[i] = "noindex" in robots_toks or "none" in robots_toks
            page_nofollow = "nofollow" in robots_toks or "none" in robots_toks
            base = ex.base_href or urls[i]
            if ex.canonical:  # rel=canonical resolves like any href
                canon[i] = join_url(base, ex.canonical) or ""
            page_host = host_of(urls[i])
            page_dom = registrable_domain(page_host)
            kept: list[str] = []
            n_int = n_ext = 0
            # counts observe EVERY anchor (incl. rel=nofollow — same
            # treatment as the meta-robots nofollow path: reporting sees
            # what the page contains); only ex.links feed the frontier
            for followable, href in (
                [(True, h) for h in ex.links] + [(False, h) for h in ex.nofollow]
            ):
                child = join_url(base, href)
                if not child:
                    continue
                if followable and len(kept) < self.link_cap:
                    kept.append(child)
                if registrable_domain(host_of(child)) == page_dom:
                    n_int += 1
                else:
                    n_ext += 1
            links_col[i] = [] if page_nofollow else kept
            li[i] = n_int
            le[i] = n_ext
            if self.with_vat:
                vats[i] = extract_vat_numbers(ex.text)
        return (
            batch.append_column("text", pa.array(texts, pa.string()))
            .append_column("title", pa.array(titles, pa.string()))
            .append_column("meta_description", pa.array(metas, pa.string()))
            .append_column("links", pa.array(links_col, pa.list_(pa.string())))
            .append_column("links_internal", pa.array(li, pa.int32()))
            .append_column("links_external", pa.array(le, pa.int32()))
            .append_column("vat_numbers", pa.array(vats, pa.list_(pa.string())))
            .append_column("html_sha256", pa.array(sha, pa.binary()))
            .append_column("noindex", pa.array(noindex, pa.bool_()))
            .append_column("canonical_url", pa.array(canon, pa.string()))
        )


def explode_links(batch: pa.Table) -> pa.Table:
    """Vectorized M6 emission: one row per kept link, carrying parent depth,
    parent seq-derived discovery_time, parent url_hash (FRONTIER shape minus
    epoch).  Input needs: links(list<string>), seq, depth, url_hash."""
    links = batch["links"]
    if isinstance(links, pa.ChunkedArray):
        links = links.combine_chunks()
    flat = links.flatten()
    counts = np.diff(links.offsets.to_numpy(zero_copy_only=False))
    parent_idx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
    # index of each link within its parent page
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    link_idx = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, counts)
    seq = batch["seq"].to_numpy(zero_copy_only=False)[parent_idx]
    depth = batch["depth"].to_numpy(zero_copy_only=False)[parent_idx]
    parent_hash = batch["url_hash"].to_numpy(zero_copy_only=False)[parent_idx]
    child_urls = flat.to_pylist()
    hosts = [host_of(u) for u in child_urls]
    return pa.table(
        {
            "url": pa.array(child_urls, pa.string()),
            "url_hash": pa.array(hash_url64(child_urls) if child_urls else [], pa.uint64()),
            "host": pa.array(hosts, pa.string()),
            "host_hash": pa.array(hash_host64(hosts) if hosts else [], pa.uint64()),
            "depth": pa.array((depth + 1).astype(np.int32), pa.int32()),
            "discovery_time": pa.array(seq * LINK_STRIDE + link_idx, pa.int64()),
            "parent_url_hash": pa.array(parent_hash, pa.uint64()),
        }
    )
