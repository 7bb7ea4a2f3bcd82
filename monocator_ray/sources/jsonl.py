"""JSONL corpus sink/source (S3/S1 companions): the interchange format
LLM training stacks actually consume (one JSON object per line, optionally
gzipped, sharded across files).

Same sink discipline as ``sources/warc.py``: each input block serializes
ON ITS WORKER into one ``part-<minhash>-<rows>.jsonl[.gz]`` member, so the
export is distributed, idempotent (same blocks -> same names, overwrite)
and resumable; the driver only ever sees the O(blocks) manifest this
returns.  Serialization is pandas' C ``to_json(lines=True)`` — no Python
per-row loop.  Reading uses ``pyarrow.json`` per file on workers.

JSON carries int64 / float64 / string / bool only; binary and timestamp
columns are rejected with a clear error rather than silently mangled
(export a decoded/ISO projection first if you need them).
"""

from __future__ import annotations

import gzip
import io
import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from monocator_ray.shipping import ensure_shipped

_JSON_OK = (
    pa.types.is_integer,
    pa.types.is_floating,
    pa.types.is_string,
    pa.types.is_large_string,
    pa.types.is_boolean,
)


def _check_schema(schema: pa.Schema) -> None:
    for f in schema:
        if not any(ok(f.type) for ok in _JSON_OK):
            raise TypeError(
                f"column {f.name!r} has JSON-unfriendly type {f.type}; "
                "project it to int/float/string/bool before export_jsonl"
            )


def export_jsonl(ds: rd.Dataset, out_dir: str, compress: bool = True) -> rd.Dataset:
    """Dataset -> sharded JSONL files under ``out_dir``; returns the
    (path, n_records) manifest Dataset.  See module docstring."""
    from monocator_ray.hashing import hash_str64

    ensure_shipped()
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        _check_schema(t.schema)
        df = t.to_pandas()
        payload = df.to_json(orient="records", lines=True, force_ascii=False)
        data = payload.encode("utf-8")
        if compress:
            data = gzip.compress(data, 6)
        # hash the WHOLE payload: a prefix key collides for blocks sharing
        # a long first document (near-duplicates are this tooling's normal
        # input) and the second write would silently clobber the first
        key = int(hash_str64([payload]).min()) & 0x7FFFFFFFFFFFFFFF
        name = f"part-{key:016x}-{t.num_rows}.jsonl" + (".gz" if compress else "")
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(data)
        return pa.table({"path": pa.array([name], pa.string()),
                         "n_records": pa.array([t.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow")


def read_jsonl(path: str) -> rd.Dataset:
    """JSONL file(s)/dir (optionally .gz) -> Dataset: each file parses on a
    worker with ``pyarrow.json`` (C++), one file per task — the same
    embarrassingly-parallel layout as the WARC reader."""
    ensure_shipped()

    def parse(batch: dict) -> pa.Table:
        import pyarrow.json as pj

        tables = []
        for raw in batch["bytes"]:
            data = bytes(raw)
            # detect by magic, not extension: read_binary_files already
            # auto-decompresses .gz paths via the Arrow filesystem
            if data[:2] == b"\x1f\x8b":
                data = gzip.decompress(data)
            tables.append(pj.read_json(io.BytesIO(data)))
        return pa.concat_tables(tables, promote_options="default")

    files = rd.read_binary_files(path)
    return files.map_batches(parse, batch_format="numpy", batch_size=1)
