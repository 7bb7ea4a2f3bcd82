"""WARC ingestion (S1 companion): Common-Crawl's native archive format ->
the SPEC pages table.

Minimal WARC/1.0-1.1 parser (public format, ISO 28500): reads ``response``
records from plain or gzipped WARC files, strips the HTTP response envelope,
and emits SPEC-shape rows (url, warc_ts, html, text="", lang="").  Used via
``ray.data.read_binary_files`` + ``map_batches`` so each archive file parses
on a worker — WARC members are independent, which is exactly the
embarrassingly-parallel layout Common Crawl ships.
"""

from __future__ import annotations

import gzip
import io

import numpy as np
import pyarrow as pa

import ray.data as rd

from monocator_ray.schemas import PAGES
from monocator_ray.shipping import ensure_shipped


def _parse_warc_stream(stream: io.BufferedReader) -> list[tuple[str, np.datetime64, bytes]]:
    """Yield (url, ts, body) for each response record."""
    out = []
    while True:
        line = stream.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            continue
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if h in (b"\r\n", b"\n", b""):
                break
            if b":" in h:
                k, _, v = h.partition(b":")
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
        length = int(headers.get("content-length", "0"))
        block = stream.read(length)
        # records are followed by two newlines; tolerate their absence
        if headers.get("warc-type") == "response":
            url = headers.get("warc-target-uri", "")
            date = headers.get("warc-date", "1970-01-01T00:00:00Z")
            try:
                ts = np.datetime64(date.rstrip("Z"), "us")
            except ValueError:
                ts = np.datetime64(0, "us")
            # strip the HTTP envelope if present
            body = block
            if block[:5] in (b"HTTP/",):
                sep = block.find(b"\r\n\r\n")
                if sep < 0:
                    sep = block.find(b"\n\n")
                    body = block[sep + 2 :] if sep >= 0 else b""
                else:
                    body = block[sep + 4 :]
            if url:
                out.append((url, ts, body))
    return out


def parse_warc_bytes(data: bytes) -> list[tuple[str, np.datetime64, bytes]]:
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return _parse_warc_stream(io.BufferedReader(io.BytesIO(data)))


def read_warc(paths: str | list[str]) -> rd.Dataset:
    """WARC file(s) -> SPEC pages Dataset (text/lang left for the engine)."""
    ensure_shipped()
    files = rd.read_binary_files(paths, include_paths=False)

    def to_pages(batch: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        for blob in batch["bytes"].to_pylist():
            rows.extend(parse_warc_bytes(blob))
        return pa.Table.from_arrays(
            [
                pa.array([r[0] for r in rows], pa.string()),
                pa.Array.from_pandas(
                    np.array([r[1] for r in rows], dtype="datetime64[us]"), type=pa.timestamp("us")
                ),
                pa.array([r[2] for r in rows], pa.binary()),
                pa.array([""] * len(rows), pa.string()),
                pa.array([""] * len(rows), pa.string()),
            ],
            schema=PAGES,
        )

    return files.map_batches(to_pages, batch_format="pyarrow", batch_size=4)


def write_warc(records: list[tuple[str, str, bytes]], path: str, compress: bool = False) -> None:
    """Tiny WARC writer (tests + export): records = (url, iso_date, html)."""
    buf = io.BytesIO()
    for url, date, body in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\nContent-Length: {len(http)}\r\n\r\n"
        ).encode()
        buf.write(head + http + b"\r\n\r\n")
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)


def export_warc(ds: rd.Dataset, out_dir: str, compress: bool = True) -> rd.Dataset:
    """Distributed WARC export sink (S3 companion): a SPEC pages Dataset ->
    sharded ``.warc[.gz]`` member files, one per input block, written ON THE
    WORKER that holds the block — the driver sees only the O(blocks)
    manifest Dataset (path, n_records) this returns.  File names derive
    from the block's minimum url hash + row count, so re-running the same
    export overwrites the same members (idempotent, resumable — the
    partitioned-output rule the crawl artifacts follow).  Reversible by
    ``read_warc``; the roundtrip is pinned by
    tests/test_warc_cli.py::test_export_warc_roundtrip."""
    import os

    from monocator_ray.hashing import hash_str64

    ensure_shipped()
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        urls = t["url"].to_pylist()
        ts = t["warc_ts"].to_numpy(zero_copy_only=False)
        dates = [str(np.datetime_as_string(x, unit="us")) + "Z" for x in ts]
        htmls = t["html"].to_pylist()
        key = int(hash_str64(urls).min())
        name = f"part-{key:016x}-{t.num_rows}.warc" + (".gz" if compress else "")
        write_warc(list(zip(urls, dates, htmls)), os.path.join(out_dir, name), compress)
        return pa.table({"path": pa.array([name], pa.string()),
                         "n_records": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow")
