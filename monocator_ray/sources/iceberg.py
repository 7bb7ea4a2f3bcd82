"""Minimal Apache Iceberg table source/sink (sixth interchange surface —
the other half of the lakehouse world beside Delta): the open Iceberg
spec (https://iceberg.apache.org/spec/) is JSON table metadata + Avro
manifest files + parquet data, all three of which this engine already
speaks (``sources/avro.py`` supplies both the nested-record manifest
reader AND the ``write_avro_records`` metadata writer).

Supported spec surface (format-version 1, the widely-readable core):

* ``metadata/v<N>.metadata.json`` + ``version-hint.text`` — table schema
  (Iceberg field-id'd struct), partition spec (identity transforms),
  snapshot list, current snapshot pointer.  Commits write the next
  vN.metadata.json and then the hint; the hint write is the pointer
  swap (single-writer per table here — a real catalog arbitrates
  multi-writer, the same caveat the spec itself makes).
* ``snap-<id>.avro`` manifest lists (one entry per manifest with
  added/existing/deleted counts) and ``mf-...avro`` manifests (one
  ``data_file`` record per parquet file: path, format, identity
  partition values, record count, size).
* Reads resolve current-or-requested snapshot -> manifest list ->
  manifests -> live data files (status != DELETED), reattach typed
  identity-partition columns, and prune whole files on
  ``filters={part_col: value-or-list}`` before any byte is read —
  the same plan shape as ``sources/delta.read_delta``.
* Time travel: ``snapshot_id=`` (every snapshot's manifest list is
  retained, append snapshots carry the prior manifests forward).

Scale path mirrors the Delta sink: data parquet writes ON WORKERS
(content-hashed names), manifests are O(files) metadata written by the
driver, reads stream per-file across the cluster.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from monocator_ray.shipping import ensure_shipped
from monocator_ray.sources.csvio import _payload_key
from monocator_ray.sources.avro import parse_avro_file, write_avro_records

_ICEBERG_TO_ARROW = {
    "long": pa.int64(),
    "int": pa.int32(),
    "double": pa.float64(),
    "float": pa.float32(),
    "string": pa.string(),
    "binary": pa.binary(),
    "boolean": pa.bool_(),
    "timestamp": pa.timestamp("us"),
    "date": pa.date32(),
}
_ARROW_TO_ICEBERG = {v: k for k, v in _ICEBERG_TO_ARROW.items()}

# Avro schema of our manifest-list entries (spec field names, v1 core)
_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
    ],
}


def _manifest_schema(pcols: list[str], ptypes: dict) -> dict:
    """Avro schema of a manifest's entries: status + nested data_file
    (identity partition values as a nested record of nullable fields)."""
    part_fields = [
        {"name": c, "type": ["null", _ARROW_TO_ICEBERG_AVRO[ptypes[c]]]}
        for c in pcols
    ]
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int"},  # 1 ADDED 0 EXISTING 2 DELETED
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file", "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102",
                        "fields": part_fields}},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ]}},
        ],
    }


# Iceberg type name -> Avro type name for partition value fields
_ARROW_TO_ICEBERG_AVRO = {
    pa.int64(): "long",
    pa.int32(): "int",
    pa.string(): "string",
    pa.bool_(): "boolean",
}


def _meta_dir(table: str) -> str:
    return os.path.join(table, "metadata")


def _current_version(table: str) -> int:
    hint = os.path.join(_meta_dir(table), "version-hint.text")
    if not os.path.exists(hint):
        raise FileNotFoundError(f"no Iceberg table at {table}")
    with open(hint) as f:
        return int(f.read().strip())


def _read_metadata(table: str, version: int | None = None) -> dict:
    v = _current_version(table) if version is None else version
    with open(os.path.join(_meta_dir(table), f"v{v}.metadata.json")) as f:
        return json.load(f)


def _arrow_schema_of(meta: dict) -> pa.Schema:
    fields = []
    for f in meta["schema"]["fields"]:
        t = _ICEBERG_TO_ARROW.get(f["type"])
        if t is None:
            raise TypeError(f"Iceberg type {f['type']!r} not supported")
        fields.append(pa.field(f["name"], t))
    return pa.schema(fields)


def _partition_cols_of(meta: dict) -> list[str]:
    by_id = {f["id"]: f["name"] for f in meta["schema"]["fields"]}
    out = []
    for pf in meta["partition-spec"]:
        if pf["transform"] != "identity":
            raise TypeError(
                f"partition transform {pf['transform']!r} not supported")
        out.append(by_id[pf["source-id"]])
    return out


def iceberg_history(table: str) -> list[dict]:
    meta = _read_metadata(table)
    return [{"snapshot_id": s["snapshot-id"],
             "operation": s.get("summary", {}).get("operation")}
            for s in meta["snapshots"]]


def _live_files(table: str, meta: dict, snapshot_id: int | None):
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    sid = meta["current-snapshot-id"] if snapshot_id is None else snapshot_id
    if sid not in snaps:
        raise ValueError(f"snapshot {sid} not in table (have {list(snaps)})")
    ml_path = os.path.join(table, snaps[sid]["manifest-list"])
    entries = parse_avro_file(open(ml_path, "rb").read()).to_pylist()
    files = []
    for e in entries:
        mf = parse_avro_file(
            open(os.path.join(table, e["manifest_path"]), "rb").read()
        ).to_pylist()
        for ent in mf:
            if ent["status"] == 2:  # DELETED
                continue
            df = ent["data_file"]
            pv = df["partition"]
            if isinstance(pv, list):  # arrow map round-trip guard
                pv = dict(pv)
            files.append({"path": df["file_path"], "pvals": dict(pv or {})})
    return files


def read_iceberg(table: str, snapshot_id: int | None = None,
                 columns: list[str] | None = None,
                 filters: dict | None = None) -> rd.Dataset:
    """Iceberg table -> Dataset; same contract as ``read_delta``:
    ``snapshot_id`` time-travels, ``filters`` prunes identity-partition
    files before any read, ``columns`` projects.  Partition columns
    reattach as typed constants per file."""
    ensure_shipped()
    meta = _read_metadata(table)
    schema = _arrow_schema_of(meta)
    pcols = _partition_cols_of(meta)
    ptypes = {c: schema.field(c).type for c in pcols}
    files = _live_files(table, meta, snapshot_id)

    if filters:
        unknown = set(filters) - set(pcols)
        if unknown:
            raise ValueError(f"filters on non-partition columns: {unknown}")

        def keep(f):
            for c, want in filters.items():
                allowed = want if isinstance(want, (list, tuple, set)) \
                    else [want]
                if f["pvals"].get(c) not in allowed:
                    return False
            return True

        files = [f for f in files if keep(f)]

    out_schema = pa.schema([schema.field(c)
                            for c in (columns or schema.names)])
    if not files:
        return rd.from_arrow(out_schema.empty_table())
    want_data = [c for c in (columns or schema.names) if c not in pcols]

    data_schema = pa.schema(
        [schema.field(c) for c in schema.names if c not in pcols])
    if not pcols:
        # unpartitioned fast path: Ray's native parquet reader splits
        # large files by row group; the declared REDUCED schema both
        # projects and null-fills pre-evolution files (read_delta
        # rationale — schema= and columns= together break)
        read_schema = pa.schema([data_schema.field(c) for c in want_data]) \
            if want_data else data_schema
        ds = rd.read_parquet(
            [os.path.join(table, f["path"]) for f in files],
            schema=read_schema)
        return ds.map_batches(
            lambda t: t.select(out_schema.names).cast(out_schema),
            batch_format="pyarrow")

    def load(batch: dict) -> pa.Table:
        tables = []
        for path, pv_json in zip(batch["path"], batch["pvals"]):
            t = pq.read_table(os.path.join(table, path))
            for c in want_data:  # null-fill pre-evolution files
                if c not in t.column_names:
                    t = t.append_column(
                        c, pa.nulls(t.num_rows, data_schema.field(c).type))
            t = t.select(want_data) if want_data else t.select([])
            pv = json.loads(pv_json)
            for c in pcols:
                if columns is not None and c not in columns:
                    continue
                t = t.append_column(
                    c, pa.array([pv[c]] * t.num_rows, ptypes[c]))
            tables.append(t.select(out_schema.names).cast(out_schema))
        return pa.concat_tables(tables)

    src = rd.from_items(
        [{"path": f["path"], "pvals": json.dumps(f["pvals"], default=str)}
         for f in files])
    return src.map_batches(load, batch_format="numpy", batch_size=1)


def write_iceberg(ds: rd.Dataset, table: str, mode: str = "append",
                  partition_by: list[str] | None = None) -> int:
    """Dataset -> Iceberg commit; returns the new snapshot id.

    Data files write ON WORKERS exactly like the Delta sink (hive layout
    under ``data/``, content-hashed names); the driver writes one new
    manifest (this commit's files), a manifest LIST (append: prior
    manifests carried forward + the new one; overwrite: just the new
    one), the next ``v<N>.metadata.json`` and finally the version hint.
    Single-writer per table (a real catalog arbitrates concurrency —
    module docstring)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode {mode!r}")
    ensure_shipped()
    pcols = list(partition_by or [])
    schema = pa.schema(
        [pa.field(n, t) for n, t in zip(ds.schema().names,
                                        ds.schema().types)])
    for c in pcols:
        if c not in schema.names:
            raise ValueError(f"partition column {c!r} not in schema")
        if schema.field(c).type not in _ARROW_TO_ICEBERG_AVRO:
            raise TypeError(
                f"partition column {c!r}: type {schema.field(c).type} has "
                "no identity-partition serialization here")
    for f in schema:
        if f.type not in _ARROW_TO_ICEBERG:
            raise TypeError(
                f"column {f.name!r} has Iceberg-unsupported type {f.type}")

    # ---- data files on workers (same shape as the Delta block writer) ----
    os.makedirs(os.path.join(table, "data"), exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        import io

        import numpy as np
        import pyarrow.compute as pc_

        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "pvals": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64()),
                             "size": pa.array([], pa.int64())})
        if pcols:
            for c in pcols:
                if t[c].null_count:
                    raise TypeError(f"null partition value in {c!r}")
            encs = [pc_.dictionary_encode(t[c].combine_chunks())
                    for c in pcols]
            mixed = np.zeros(t.num_rows, np.int64)
            for e in encs:
                idx = e.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                mixed = mixed * (len(e.dictionary) + 1) + idx
            groups = []
            for code in np.unique(mixed):
                sel = np.flatnonzero(mixed == code)
                pv = {c: encs[j].dictionary[
                    int(encs[j].indices[int(sel[0])].as_py())].as_py()
                    for j, c in enumerate(pcols)}
                groups.append((pv, t.take(pa.array(sel))))
        else:
            groups = [({}, t)]
        paths, pvals, rows, sizes = [], [], [], []
        for pv, sub in groups:
            body = sub.drop_columns(pcols) if pcols else sub
            buf = io.BytesIO()
            pq.write_table(body, buf)
            data = buf.getvalue()
            rel_dir = "data" + "".join(
                f"/{c}={pv[c]}" for c in pcols)
            name = f"part-{_payload_key(data):016x}-{body.num_rows}.parquet"
            abs_dir = os.path.join(table, rel_dir)
            os.makedirs(abs_dir, exist_ok=True)
            tmp = os.path.join(abs_dir, f".{name}.tmp-{os.getpid()}")
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, os.path.join(abs_dir, name))
            paths.append(f"{rel_dir}/{name}")
            pvals.append(json.dumps(pv, default=str))
            rows.append(body.num_rows)
            sizes.append(len(data))
        return pa.table({"path": pa.array(paths, pa.string()),
                         "pvals": pa.array(pvals, pa.string()),
                         "rows": pa.array(rows, pa.int64()),
                         "size": pa.array(sizes, pa.int64())})

    manifest_rows = ds.map_batches(write_block, batch_format="pyarrow").take_all()  # bounded: O(files) metadata

    # ---- metadata on the driver ----
    os.makedirs(_meta_dir(table), exist_ok=True)
    try:
        version = _current_version(table)
        meta = _read_metadata(table)
    except FileNotFoundError:
        version = 0
        meta = None
    if meta is not None and mode == "append":
        # additive schema evolution (same contract as write_delta): new
        # columns extend the table schema; missing columns are fine (the
        # increment's files omit them, reads null-fill); type conflicts
        # error; partition spec must match
        cur_schema = _arrow_schema_of(meta)
        if _partition_cols_of(meta) != pcols:
            raise ValueError(
                f"append partition_by {pcols} != table's "
                f"{_partition_cols_of(meta)}")
        merged = list(cur_schema)
        for f in schema:
            if f.name in cur_schema.names:
                have = cur_schema.field(f.name).type
                if have != f.type:
                    raise TypeError(
                        f"append column {f.name!r}: type {f.type} "
                        f"conflicts with table type {have}")
            else:
                merged.append(f)
        schema = pa.schema(merged)
    ptypes = {c: schema.field(c).type for c in pcols}
    mf_schema = _manifest_schema(pcols, ptypes)
    entries = [{"status": 1, "data_file": {
        "file_path": r["path"], "file_format": "PARQUET",
        "partition": json.loads(r["pvals"]),
        "record_count": int(r["rows"]),
        "file_size_in_bytes": int(r["size"])}} for r in manifest_rows]
    snap_id = version + 1
    mf_name = f"metadata/mf-{snap_id}-{_payload_key(repr(entries).encode()):08x}.avro"
    write_avro_records(os.path.join(table, mf_name), mf_schema, entries)
    mf_len = os.path.getsize(os.path.join(table, mf_name))

    prior_manifests: list[dict] = []
    if meta is not None and mode == "append" and meta["snapshots"]:
        cur = {s["snapshot-id"]: s for s in meta["snapshots"]}[
            meta["current-snapshot-id"]]
        prior = parse_avro_file(
            open(os.path.join(table, cur["manifest-list"]), "rb").read()
        ).to_pylist()
        prior_manifests = [dict(p) for p in prior]
    ml_rows = prior_manifests + [{
        "manifest_path": mf_name, "manifest_length": int(mf_len),
        "partition_spec_id": 0, "added_files_count": len(entries),
        "existing_files_count": 0, "deleted_files_count": 0}]
    ml_name = f"metadata/snap-{snap_id}.avro"
    write_avro_records(os.path.join(table, ml_name),
                       _MANIFEST_LIST_SCHEMA, ml_rows)

    by_name = {f.name: i + 1 for i, f in enumerate(schema)}
    new_meta = {
        "format-version": 1,
        "table-uuid": f"{_payload_key(table.encode()):032x}",
        "location": table,
        "schema": {"type": "struct", "fields": [
            {"id": by_name[f.name], "name": f.name, "required": False,
             "type": _ARROW_TO_ICEBERG[f.type]} for f in schema]},
        "partition-spec": [
            {"name": c, "transform": "identity",
             "source-id": by_name[c], "field-id": 1000 + i}
            for i, c in enumerate(pcols)],
        "current-snapshot-id": snap_id,
        "snapshots": (meta["snapshots"] if meta else []) + [{
            "snapshot-id": snap_id,
            "manifest-list": ml_name,
            "summary": {"operation": "append" if mode == "append"
                        else "overwrite"},
        }],
    }
    v_new = version + 1
    mpath = os.path.join(_meta_dir(table), f"v{v_new}.metadata.json")
    tmp = mpath + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(new_meta, f, indent=1)
    os.replace(tmp, mpath)
    hint = os.path.join(_meta_dir(table), "version-hint.text")
    tmp = hint + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(str(v_new))
    os.replace(tmp, hint)  # the pointer swap
    return snap_id
