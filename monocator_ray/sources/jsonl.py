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


def write_training_shards(docs: "rd.Dataset", out_dir: str,
                          shard_rows: int = 4096) -> "rd.Dataset":
    """Deterministic SHUFFLED training shards: rank every doc under the
    seedless (mix32(doc_id), doc_id) permutation (docs.shuffle_positions —
    no global sort), hash-join the ranks back to the payload, and write
    shard i = pos range [i*S, (i+1)*S) as one parquet file sorted by pos,
    each landing whole in a worker partition.  ``_MANIFEST.json`` commits
    last with per-shard (file, pos_lo, pos_hi, rows).

    Resumability is the point of the deterministic permutation: shard
    contents are a pure function of (corpus, shard_rows), so a re-run can
    skip any shard file the manifest of a previous attempt already lists.
    Returns the manifest as a Dataset."""
    import json as _json

    import numpy as np
    import pyarrow.parquet as _pq

    from monocator_ray.pipelines.docs import shuffle_positions
    from monocator_ray.stages.grouped import collect_arrow, hash_partitioned, run_boundaries

    ensure_shipped()
    os.makedirs(out_dir, exist_ok=True)
    ranks = shuffle_positions(docs.select_columns(["doc_id"])).materialize()
    joined = docs.join(ranks, join_type="inner", num_partitions=8, on=("doc_id",))

    def add_shard(t: pa.Table) -> pa.Table:
        sid = t["pos"].to_numpy(zero_copy_only=False) // shard_rows
        return t.append_column("shard_id", pa.array(sid, pa.int64()))

    _OUT = pa.schema(
        [("file", pa.string()), ("pos_lo", pa.int64()), ("pos_hi", pa.int64()),
         ("rows", pa.int64())]
    )

    def write_shards(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        sid = t["shard_id"].to_numpy(zero_copy_only=False)
        pos = t["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, sid))
        t = t.take(pa.array(order, pa.int64()))
        sid, pos = sid[order], pos[order]
        starts, ends = run_boundaries(sid)
        files, los, his, rows = [], [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            name = f"shard-{int(sid[s]):06d}.parquet"
            _pq.write_table(
                t.slice(s, e - s).drop_columns(["shard_id"]),
                os.path.join(out_dir, name),
            )
            files.append(name)
            los.append(int(pos[s]))
            his.append(int(pos[e - 1]))
            rows.append(e - s)
        return pa.table(
            {"file": pa.array(files, pa.string()),
             "pos_lo": pa.array(los, pa.int64()),
             "pos_hi": pa.array(his, pa.int64()),
             "rows": pa.array(rows, pa.int64())}
        )

    manifest = collect_arrow(
        hash_partitioned(
            joined.map_batches(add_shard, batch_format="pyarrow"),
            lambda t: [t["shard_id"].to_numpy(zero_copy_only=False).view(np.uint64)],
            write_shards,
            num_parts=32,
        )
    )
    recs = sorted(manifest.to_pylist(), key=lambda r: r["file"])
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as fh:
        _json.dump(recs, fh)  # commit point
    import ray.data as _rd

    return _rd.from_arrow(pa.Table.from_pylist(recs, schema=_OUT)) if recs else _rd.from_arrow(_OUT.empty_table())
