"""CSV, Arrow-IPC and ORC sinks/sources (S1/S3 companions): the interchange
formats that bracket parquet — CSV for the lowest-common-denominator hand-off
(spreadsheets, shell tooling, legacy loaders), Arrow IPC (Feather v2) for
the lossless zero-parse hand-off between Arrow-native processes, and ORC
for the Hive/Trino columnar world.

Same sink discipline as ``sources/jsonl.py`` / ``sources/warc.py``: each
input block serializes ON ITS WORKER into one ``part-<hash>-<rows>`` member
(content-hashed name -> distributed, idempotent, resumable), and the driver
only ever sees the O(blocks) manifest.  Serialization and parsing are
pyarrow's C++ CSV / IPC kernels — no Python per-row loop anywhere.

Fidelity contract (stated, not silent):
* CSV is text-typed and null-lossy: nulls round-trip as empty strings and
  column types are re-inferred on read unless ``schema=`` pins them.
  Embedded newlines / quotes / delimiters round-trip exactly (RFC-4180
  quoting; the reader runs ``newlines_in_values=True``).  Binary and
  nested columns are rejected with a clear error.
* IPC is exact: every Arrow type (binary, timestamps, lists) round-trips
  bit-for-bit — use it when the consumer is Arrow-aware.
* ORC is value-exact but widens timestamps to nanoseconds on read; pass the
  original schema to ``read_orc_dir`` to cast back (exact for us-precision
  data below the year-2262 ns bound).
"""

from __future__ import annotations

import io
import os

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data as rd

from monocator_ray.shipping import ensure_shipped

_MANIFEST_SCHEMA = pa.schema([("path", pa.string()), ("n_records", pa.int64())])


def _payload_key(data: bytes) -> int:
    """Deterministic 63-bit content key for shard file names (stdlib
    blake2b — the payload may be arbitrary binary, so the string SipHash
    helper doesn't apply)."""
    import hashlib

    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big") \
        & 0x7FFFFFFFFFFFFFFF


def _manifest(name: str | None, rows: int) -> pa.Table:
    if name is None:
        return _MANIFEST_SCHEMA.empty_table()
    return pa.table({"path": pa.array([name], pa.string()),
                     "n_records": pa.array([rows], pa.int64())})


def _check_csv_schema(schema: pa.Schema) -> None:
    for f in schema:
        if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type) \
                or pa.types.is_nested(f.type):
            raise TypeError(
                f"column {f.name!r} has CSV-unfriendly type {f.type}; "
                "project/encode it before export_csv (or use export_ipc)"
            )


def export_csv(ds: rd.Dataset, out_dir: str) -> rd.Dataset:
    """Dataset -> sharded ``part-<hash>-<rows>.csv`` files under ``out_dir``
    (one per input block, written on its worker); returns the
    (path, n_records) manifest Dataset.  See module docstring."""
    ensure_shipped()
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _manifest(None, 0)
        _check_csv_schema(t.schema)
        buf = io.BytesIO()
        pacsv.write_csv(t, buf)
        data = buf.getvalue()
        # hash the whole payload (prefix keys collide on near-dup blocks —
        # jsonl.py rationale); idempotent overwrite on re-run
        name = f"part-{_payload_key(data):016x}-{t.num_rows}.csv"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(data)
        return _manifest(name, t.num_rows)

    return ds.map_batches(write_block, batch_format="pyarrow")


def read_csv_dir(path: str, schema: pa.Schema | None = None) -> rd.Dataset:
    """CSV file(s)/dir -> Dataset: each file parses on a worker with
    pyarrow's C++ reader (``newlines_in_values=True`` so quoted multi-line
    text fields — normal in document corpora — parse correctly; plain
    ``ray.data.read_csv`` splits files on raw newlines and would tear
    them).  ``schema`` pins column types (else re-inferred per file)."""
    ensure_shipped()

    convert = pacsv.ConvertOptions(
        column_types=dict(zip(schema.names, schema.types)) if schema else None,
        strings_can_be_null=False,
    )
    parse = pacsv.ParseOptions(newlines_in_values=True)

    def parse_file(batch: dict) -> pa.Table:
        tables = [
            pacsv.read_csv(io.BytesIO(bytes(raw)), parse_options=parse,
                           convert_options=convert)
            for raw in batch["bytes"]
        ]
        return pa.concat_tables(tables, promote_options="default")

    files = rd.read_binary_files(path)
    return files.map_batches(parse_file, batch_format="numpy", batch_size=1)


def export_ipc(ds: rd.Dataset, out_dir: str) -> rd.Dataset:
    """Dataset -> sharded Arrow IPC (Feather v2) ``part-<hash>-<rows>.arrow``
    files; lossless for every Arrow type.  Returns the manifest Dataset."""
    ensure_shipped()
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _manifest(None, 0)
        buf = io.BytesIO()
        with pa.ipc.new_file(buf, t.schema) as w:
            w.write_table(t)
        data = buf.getvalue()
        name = f"part-{_payload_key(data):016x}-{t.num_rows}.arrow"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(data)
        return _manifest(name, t.num_rows)

    return ds.map_batches(write_block, batch_format="pyarrow")


def read_ipc(path: str) -> rd.Dataset:
    """Arrow IPC file(s)/dir -> Dataset, one file per worker task."""
    ensure_shipped()

    def parse_file(batch: dict) -> pa.Table:
        tables = [
            pa.ipc.open_file(io.BytesIO(bytes(raw))).read_all()
            for raw in batch["bytes"]
        ]
        return pa.concat_tables(tables, promote_options="default")

    files = rd.read_binary_files(path)
    return files.map_batches(parse_file, batch_format="numpy", batch_size=1)


def export_orc(ds: rd.Dataset, out_dir: str) -> rd.Dataset:
    """Dataset -> sharded ORC ``part-<hash>-<rows>.orc`` files — the
    interchange format the Hive/Trino world reads natively.  Same sink
    discipline as the CSV/IPC exporters (worker-side serialization,
    content-hashed idempotent names, O(blocks) driver manifest).

    Fidelity contract: values round-trip exactly for ints / floats /
    strings / binary / lists / nulls, but ORC stores ONE timestamp
    precision — pyarrow reads timestamps back as ``timestamp[ns]``.
    Pass the original schema to :func:`read_orc_dir` to cast back (safe:
    the driver tables are microsecond-precision, and us->ns->us is exact
    below the year-2262 ns-overflow bound)."""
    from pyarrow import orc as paorc

    ensure_shipped()
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _manifest(None, 0)
        buf = io.BytesIO()
        paorc.write_table(t, buf)
        data = buf.getvalue()
        name = f"part-{_payload_key(data):016x}-{t.num_rows}.orc"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(data)
        return _manifest(name, t.num_rows)

    return ds.map_batches(write_block, batch_format="pyarrow")


def read_orc_dir(path: str, schema: pa.Schema | None = None) -> rd.Dataset:
    """ORC file(s)/dir -> Dataset, one file per worker task (pyarrow's C++
    ORC reader).  ``schema`` casts the result back to the original types —
    needed for timestamp columns, which ORC widens to nanoseconds."""
    from pyarrow import orc as paorc

    ensure_shipped()

    def parse_file(batch: dict) -> pa.Table:
        tables = [
            paorc.ORCFile(pa.BufferReader(bytes(raw))).read()
            for raw in batch["bytes"]
        ]
        t = pa.concat_tables(tables, promote_options="default")
        return t.cast(schema) if schema is not None else t

    files = rd.read_binary_files(path)
    return files.map_batches(parse_file, batch_format="numpy", batch_size=1)


def cleanup_stale_staging(base: str, prefix: str, keep: str) -> None:
    """Reap OTHER processes' PID-keyed staging dirs under ``base`` once
    their owner is dead.  Dir names are ``f"{prefix}{pid}"`` or
    ``f"{prefix}{pid}_..."`` — the pid is parsed as the first token after
    the prefix, so a prefix rename can never silently shift the split
    index (code-review r3-closing finding #8; the previous three inline
    copies each hard-coded a magic ``split("_")[i]``).  Never touches
    ``keep`` or any dir whose embedded pid is still alive (ADVICE r2 #4's
    live-PID guard)."""
    import shutil

    for d in os.listdir(base):
        p = os.path.join(base, d)
        if not d.startswith(prefix) or p == keep:
            continue
        try:
            pid = int(d[len(prefix):].split("_")[0])
            os.kill(pid, 0)  # raises ProcessLookupError iff owner is dead
        except ProcessLookupError:
            shutil.rmtree(p, ignore_errors=True)
        except (ValueError, PermissionError, OSError):
            pass
