"""Revisit / recrawl pipeline (the crawler half of a production refresh
cycle): conditional refetch over the previous crawl's validator artifact,
changed-only page output, and a WARC-1.1 ``revisit`` export for the
unchanged pages.

The flow (all streaming — no driver materialization, no broadcast maps):

1. A first crawl (or a previous revisit) exports a VALIDATORS artifact —
   ``(url, etag, last_modified, payload_sha256)`` — from its fetch output
   (``validators_from_fetch``).
2. The recrawl reads that artifact straight into
   ``stages.fetch.ConditionalFetcher`` batches: every row carries its own
   validators, the fetcher sends ``If-None-Match`` / ``If-Modified-Since``
   and 304s come back body-less (RFC 9110 §13).  At 10^10 URLs this is the
   only shape that works — validators travel in the rows, never in a
   driver-held url->etag dict.
3. ``split_revisit`` separates the annotated output into (a) CHANGED pages
   (2xx with a body) that flow into the normal parse/extract/dedup tail and
   replace their predecessors, and (b) the revisit log — one row per URL
   with ``not_modified`` marking the 304s that cost a header exchange
   instead of a transfer.
4. ``export_warc_revisits`` persists the unchanged rows as WARC 1.1
   ``revisit`` records with the ``server-not-modified`` profile (WARC 1.1
   §6.7.3 — exactly the semantics of an HTTP 304), carrying the prior
   payload digest in ``WARC-Payload-Digest`` so a replay chain can resolve
   the content from the earlier capture.

Tested end-to-end against local in-process HTTP servers that implement
real ETag/Last-Modified validation (tests/test_revisit.py) — the same
no-outbound-network discipline as the HttpFetcher / robots / TLS-probe
suites.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from monocator_ray.shipping import ensure_shipped

VALIDATORS = pa.schema(
    [
        ("url", pa.string()),
        ("etag", pa.string()),
        ("last_modified", pa.string()),
        ("payload_sha256", pa.string()),
    ]
)

REVISIT_LOG = pa.schema(
    [
        ("url", pa.string()),
        ("fetch_status", pa.int32()),
        ("not_modified", pa.bool_()),
        ("etag", pa.string()),
        ("last_modified", pa.string()),
    ]
)


def validators_from_fetch(ds: rd.Dataset) -> rd.Dataset:
    """Fetch/revisit output -> the next cycle's VALIDATORS artifact.

    Keeps rows that produced a body (2xx) OR revalidated (304 — their
    carried-forward validators are still current); drops rows with neither
    validator (nothing to condition the next fetch on, they refetch
    unconditionally by absence from the artifact)."""
    ensure_shipped()

    def prep(t: pa.Table) -> pa.Table:
        import hashlib

        status = t["fetch_status"]
        ok = pc.or_(
            pc.and_(pc.greater_equal(status, 200), pc.less(status, 300)),
            pc.equal(status, 304),
        )
        has_validator = pc.or_(
            pc.is_valid(t["etag"]), pc.is_valid(t["last_modified"])
        )
        t = t.filter(pc.and_(ok, has_validator))
        shas = [
            hashlib.sha256(h).hexdigest() if h is not None else None
            for h in t["html"].to_pylist()
        ]
        return pa.table(
            {
                "url": t["url"],
                "etag": t["etag"],
                "last_modified": t["last_modified"],
                "payload_sha256": pa.array(shas, pa.string()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def conditional_refetch(
    validators: rd.Dataset,
    fetcher_cls,
    fetcher_kwargs: dict | None = None,
    concurrency: int = 4,
    batch_size: int = 64,
) -> rd.Dataset:
    """VALIDATORS Dataset -> annotated conditional-fetch output (the
    ConditionalFetcher contract: pages columns + fetch_status + response
    etag / last_modified).  ``fetcher_cls`` is an actor-pool class with the
    ConditionalFetcher calling convention (tests pass ConditionalFetcher
    bound to local servers)."""
    ensure_shipped()
    return validators.map_batches(
        fetcher_cls,
        fn_constructor_kwargs=fetcher_kwargs or {},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def split_revisit(annotated: rd.Dataset) -> tuple[rd.Dataset, rd.Dataset]:
    """Annotated conditional-fetch output -> (changed_pages, revisit_log).

    ``changed_pages`` keeps the rows that must re-enter the parse/extract
    tail (2xx with a body); ``revisit_log`` has one row per input URL with
    ``not_modified`` flagging the 304s.  Both sides are map_batches filters
    over the same upstream — Ray Data executes the shared stage once per
    block and streams both consumers."""
    ensure_shipped()

    def changed(t: pa.Table) -> pa.Table:
        status = t["fetch_status"]
        keep = pc.and_(
            pc.and_(pc.greater_equal(status, 200), pc.less(status, 300)),
            pc.is_valid(t["html"]),
        )
        return t.filter(keep)

    def log(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": t["url"],
                "fetch_status": t["fetch_status"],
                "not_modified": pc.equal(t["fetch_status"], 304),
                "etag": t["etag"],
                "last_modified": t["last_modified"],
            }
        )

    return (
        annotated.map_batches(changed, batch_format="pyarrow"),
        annotated.map_batches(log, batch_format="pyarrow"),
    )


def export_warc_revisits(
    annotated: rd.Dataset,
    prior_digests: rd.Dataset | None,
    out_dir: str,
    compress: bool = True,
) -> rd.Dataset:
    """304 rows -> sharded WARC 1.1 ``revisit`` records (profile
    ``server-not-modified``, §6.7.3), one member file per input block
    written on its worker; returns the (path, n_records) manifest.

    ``prior_digests`` is the previous VALIDATORS artifact carrying
    ``payload_sha256`` — joined in per batch by url hash ONLY when given
    (the digest header is optional in the profile; passing None skips the
    join entirely).  The join side is the validator table for THIS batch's
    key range when the caller pre-partitioned both by url hash; at small
    scale the tests pass the artifact whole."""
    import os

    import numpy as np

    from monocator_ray.hashing import hash_str64

    ensure_shipped()
    os.makedirs(out_dir, exist_ok=True)

    digest_map: dict[str, str] = {}
    if prior_digests is not None:
        # O(validators-in-artifact) — the caller bounds this side (the
        # small-side-broadcast rule; a 10^10-URL deployment partitions both
        # sides by url hash and exports per partition)
        for row in prior_digests.take_all():
            if row.get("payload_sha256"):
                digest_map[row["url"]] = row["payload_sha256"]

    def write_block(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["fetch_status"], 304))
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        import gzip as _gzip
        import io
        import uuid

        urls = t["url"].to_pylist()
        ts = t["warc_ts"].to_numpy(zero_copy_only=False)
        buf = io.BytesIO()
        for u, x in zip(urls, ts):
            date = str(np.datetime_as_string(x, unit="us")) + "Z"
            digest = digest_map.get(u)
            # WARC 1.1 §5.2: WARC-Record-ID is mandatory on every record.
            # UUID5 over url+date keeps the export deterministic (matching
            # the content-hashed shard-name idempotency).
            rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{u}\n{date}")
            head = (
                "WARC/1.1\r\nWARC-Type: revisit\r\n"
                f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
                f"WARC-Target-URI: {u}\r\nWARC-Date: {date}\r\n"
                "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
                "server-not-modified\r\n"
            )
            if digest:
                head += f"WARC-Payload-Digest: sha256:{digest}\r\n"
            head += "Content-Length: 0\r\n\r\n"
            buf.write(head.encode() + b"\r\n\r\n")
        data = buf.getvalue()
        if compress:
            data = _gzip.compress(data)
        key = int(hash_str64(urls).min())
        name = f"revisit-{key:016x}-{t.num_rows}.warc" + (
            ".gz" if compress else "")
        tmp = os.path.join(out_dir, f".{name}.tmp-{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"path": pa.array([name], pa.string()),
                         "n_records": pa.array([t.num_rows], pa.int64())})

    return annotated.map_batches(write_block, batch_format="pyarrow")
