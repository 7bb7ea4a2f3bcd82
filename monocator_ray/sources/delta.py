"""Minimal Delta Lake table source/sink (fifth interchange surface beside
CSV / IPC / ORC / Avro): the lakehouse format's open PROTOCOL
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md) is a parquet
data layer plus a JSON action log, both of which this engine already
speaks — no external ``deltalake`` package needed.

Supported protocol surface (reader version 1 / writer version 2 features
only — the widely-interoperable core):

* ``_delta_log/%020d.json`` commit files holding newline-delimited
  ``protocol`` / ``metaData`` / ``add`` / ``remove`` / ``commitInfo``
  actions; state reconstruction replays them in version order with
  last-writer-wins per file path.
* ``%020d.checkpoint.parquet`` + ``_last_checkpoint`` — reads start from
  the newest checkpoint at-or-below the requested version and replay only
  the JSON tail; ``checkpoint_delta_table`` writes one (add/remove-
  compacted) so log replay cost stays O(commits since checkpoint).
* Spark ``schemaString`` struct JSON <-> Arrow schema for the scalar
  types this engine's tables use (long/integer/double/float/string/
  binary/boolean/timestamp/date).
* Hive-partitioned tables: ``partitionValues`` are string-serialized per
  the spec; the reader re-types them from the table schema and attaches
  them as columns (they are NOT in the data files), and ``filters=``
  prunes whole files by partition value BEFORE any read is issued.
* Optimistic concurrency: a commit claims ``<version>.json`` with
  ``O_CREAT|O_EXCL`` — exactly the protocol's "mutual exclusion on the
  next log entry" rule; a lost race surfaces as
  ``DeltaConcurrentCommit`` and the caller retries on fresh state.
  (Object stores without atomic create need a coordination service —
  same caveat the reference protocol documents for S3.)

Scale path: data files write ON WORKERS (content-hashed shard names, the
csvio sink discipline) and only the O(files) action list passes through
the driver commit; reads resolve the live-file set from the log
(O(files) driver state, the same order as parquet's own footer planning)
and then stream with ``read_parquet`` exactly like any parquet table.
Time travel (``version=``) is free: replay just stops early.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from monocator_ray.shipping import ensure_shipped
from monocator_ray.sources.csvio import _payload_key


class DeltaConcurrentCommit(RuntimeError):
    """Another writer claimed this log version first — re-read and retry."""


_LOG = "_delta_log"
_TMP_GRACE_S = 600.0  # vacuum leaves tmp files younger than this alone

# Spark schemaString type <-> Arrow (scalar core; nested types rejected)
_SPARK_TO_ARROW = {
    "long": pa.int64(),
    "integer": pa.int32(),
    "short": pa.int16(),
    "byte": pa.int8(),
    "double": pa.float64(),
    "float": pa.float32(),
    "string": pa.string(),
    "binary": pa.binary(),
    "boolean": pa.bool_(),
    "timestamp": pa.timestamp("us"),
    "date": pa.date32(),
}
_ARROW_TO_SPARK = {v: k for k, v in _SPARK_TO_ARROW.items()}


def _schema_to_spark_json(schema: pa.Schema) -> str:
    fields = []
    for f in schema:
        t = _ARROW_TO_SPARK.get(f.type)
        if t is None:
            raise TypeError(
                f"column {f.name!r} has Delta-unsupported type {f.type}; "
                "project/encode it before write_delta"
            )
        fields.append({"name": f.name, "type": t, "nullable": True,
                       "metadata": {}})
    return json.dumps({"type": "struct", "fields": fields})


def _spark_json_to_schema(s: str) -> pa.Schema:
    doc = json.loads(s)
    out = []
    for f in doc["fields"]:
        t = _SPARK_TO_ARROW.get(f["type"])
        if t is None:
            raise TypeError(f"Delta type {f['type']!r} not supported")
        out.append((f["name"], t))
    return pa.schema(out)


def _partition_value_str(v) -> str | None:
    """Spec serialization of a partition value (strings as-is, numerics
    str(), null -> None which the JSON carries as null)."""
    if v is None:
        return None
    if isinstance(v, (bytes, float)):
        raise TypeError("partition columns must be string/int/bool/date")
    if isinstance(v, bool):
        # Delta PROTOCOL serializes booleans lowercase; str(True) would
        # round-trip as False through _typed_partition_scalar.
        return "true" if v else "false"
    return str(v)


def _typed_partition_scalar(s: str | None, t: pa.DataType):
    if s is None:
        return None
    if pa.types.is_integer(t):
        return int(s)
    if pa.types.is_boolean(t):
        # accept "True" too for tables written before the lowercase fix
        return s in ("true", "True")
    if pa.types.is_date(t):
        import datetime

        return datetime.date.fromisoformat(s)
    return s


# ------------------------------------------------------------------- state --


def _log_dir(table: str) -> str:
    return os.path.join(table, _LOG)


def _list_versions(table: str) -> list[int]:
    return sorted(
        int(os.path.basename(p)[:20])
        for p in glob.glob(os.path.join(_log_dir(table), "*.json"))
        if os.path.basename(p)[:20].isdigit()
    )


def _read_last_checkpoint(table: str):
    p = os.path.join(_log_dir(table), "_last_checkpoint")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _replay(table: str, version: int | None = None):
    """-> (snapshot_version, schema, partition_cols, live add-actions).

    Starts from the newest checkpoint at-or-below ``version`` when one
    exists, then replays the JSON commits after it."""
    versions = _list_versions(table)
    if not versions:
        raise FileNotFoundError(f"no Delta log at {table}")
    target = versions[-1] if version is None else version
    if target not in versions:
        raise ValueError(f"version {target} not in log (have {versions})")

    live: dict[str, dict] = {}
    meta = None
    start_after = -1
    cp = _read_last_checkpoint(table)
    if cp is not None and cp["version"] <= target:
        cpt = pq.read_table(os.path.join(
            _log_dir(table), f"{cp['version']:020d}.checkpoint.parquet"))
        for row in cpt.to_pylist():
            if row.get("metaData") and row["metaData"].get("schemaString"):
                meta = row["metaData"]
            if row.get("add") and row["add"].get("path"):
                a = dict(row["add"])
                pv = a.get("partitionValues")
                if isinstance(pv, list):  # arrow map type -> (k, v) tuples
                    a["partitionValues"] = dict(pv)
                live[a["path"]] = a
        start_after = cp["version"]

    for v in versions:
        if v <= start_after or v > target:
            continue
        with open(os.path.join(_log_dir(table), f"{v:020d}.json")) as f:
            for line in f:
                if not line.strip():
                    continue
                act = json.loads(line)
                if "metaData" in act:
                    meta = act["metaData"]
                elif "add" in act:
                    live[act["add"]["path"]] = act["add"]
                elif "remove" in act:
                    live.pop(act["remove"]["path"], None)
    if meta is None:
        raise ValueError("Delta log has no metaData action")
    schema = _spark_json_to_schema(meta["schemaString"])
    pcols = list(meta.get("partitionColumns") or [])
    return target, schema, pcols, list(live.values())


def delta_history(table: str) -> list[dict]:
    """commitInfo (or a stub) per version, oldest first."""
    out = []
    for v in _list_versions(table):
        info = {"version": v}
        with open(os.path.join(_log_dir(table), f"{v:020d}.json")) as f:
            for line in f:
                if line.strip():
                    act = json.loads(line)
                    if "commitInfo" in act:
                        info.update(act["commitInfo"])
        out.append(info)
    return out


# ------------------------------------------------------------------ reader --


def read_delta(table: str, version: int | None = None,
               columns: list[str] | None = None,
               filters: dict | None = None) -> rd.Dataset:
    """Delta table -> Dataset.  ``version`` time-travels; ``filters`` is
    ``{partition_col: value-or-list}`` and prunes whole files from the
    plan BEFORE any byte is read; ``columns`` projects the parquet read.
    Partition columns re-attach as typed constant columns per file."""
    ensure_shipped()
    _, schema, pcols, adds = _replay(table, version)
    ptypes = {c: schema.field(c).type for c in pcols}

    if filters:
        unknown = set(filters) - set(pcols)
        if unknown:
            raise ValueError(f"filters on non-partition columns: {unknown}")
        def keep(a):
            for c, want in filters.items():
                allowed = want if isinstance(want, (list, tuple, set)) else [want]
                got = _typed_partition_scalar(a["partitionValues"].get(c),
                                              ptypes[c])
                if got not in allowed:
                    return False
            return True
        adds = [a for a in adds if keep(a)]

    data_cols = [f.name for f in schema if f.name not in pcols]
    want_data = [c for c in (columns or data_cols) if c not in pcols]
    out_schema = pa.schema(
        [schema.field(c) for c in (columns or schema.names)])

    if not adds:
        return rd.from_arrow(out_schema.empty_table())

    data_schema = pa.schema([schema.field(c) for c in data_cols])
    if not pcols:
        # unpartitioned fast path: hand the live-file list to Ray's native
        # parquet reader, which splits large files by row group (the
        # per-file map path below cannot).  The DECLARED reduced schema
        # does double duty: it both PROJECTS (columns absent from it are
        # pruned at the scan) and null-fills columns a pre-evolution file
        # lacks.  (schema= and columns= together break on heterogeneous
        # files — the datasource builds per-fragment batches that must
        # already match the declared schema.)
        read_schema = pa.schema([data_schema.field(c) for c in want_data]) \
            if want_data else data_schema
        ds = rd.read_parquet([os.path.join(table, a["path"]) for a in adds],
                             schema=read_schema)
        return ds.map_batches(
            lambda t: t.select(out_schema.names).cast(out_schema),
            batch_format="pyarrow")

    # one task list entry per live file: path + its partition values
    items = [
        {"path": os.path.join(table, a["path"]),
         "pvals": {c: _typed_partition_scalar(
             a["partitionValues"].get(c), ptypes[c]) for c in pcols}}
        for a in adds
    ]

    def load(batch: dict) -> pa.Table:
        tables = []
        for path, pv_json in zip(batch["path"], batch["pvals"]):
            t = pq.read_table(path)
            # null-fill columns this file predates (schema evolution),
            # then project to the wanted data columns
            for c in want_data:
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
        [{"path": it["path"], "pvals": json.dumps(it["pvals"], default=str)}
         for it in items])
    return src.map_batches(load, batch_format="numpy", batch_size=1)


# ------------------------------------------------------------------ writer --


def _commit(table: str, version: int, actions: list[dict]) -> None:
    """Claim ``<version>.json`` with O_EXCL — the protocol's mutual
    exclusion on the next log entry.  Loser raises DeltaConcurrentCommit."""
    os.makedirs(_log_dir(table), exist_ok=True)
    path = os.path.join(_log_dir(table), f"{version:020d}.json")
    try:
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
    except FileExistsError as e:
        raise DeltaConcurrentCommit(
            f"version {version} already committed") from e
    with os.fdopen(fd, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def write_delta(ds: rd.Dataset, table: str, mode: str = "append",
                partition_by: list[str] | None = None) -> int:
    """Dataset -> Delta table commit; returns the committed version.

    Data files write ON WORKERS (hive-layout when ``partition_by``,
    content-hashed names -> idempotent re-runs); the driver sees only the
    O(files) action manifest and claims the next log version with O_EXCL.
    ``mode='overwrite'`` removes every previously-live file in the same
    atomic commit; ``'append'`` only adds.  A lost commit race raises
    DeltaConcurrentCommit (data files are orphans until a later commit
    claims them — harmless per the protocol, invisible to readers)."""
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
        t = schema.field(c).type
        if not (pa.types.is_integer(t) or pa.types.is_boolean(t)
                or pa.types.is_string(t) or pa.types.is_date(t)):
            raise TypeError(
                f"partition column {c!r} has type {t}; only string/int/"
                "bool/date partition values have a stable spec serialization"
            )
    os.makedirs(table, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "pvals": pa.array([], pa.string()),
                             "size": pa.array([], pa.int64())})
        groups: list[tuple[dict, pa.Table]]
        if pcols:
            # hive-split the block by its partition tuple(s) — vectorized:
            # dictionary-encode each partition column, mix the codes into
            # one int key, one np.unique + one take per distinct tuple
            import pyarrow.compute as pc_

            for c in pcols:
                if t[c].null_count:
                    raise TypeError(
                        f"partition column {c!r} has nulls; null partition "
                        "values are not supported by this writer"
                    )
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
        out_paths, out_pvals, out_sizes = [], [], []
        for pv, sub in groups:
            body = sub.drop_columns(pcols) if pcols else sub
            import io

            buf = io.BytesIO()
            pq.write_table(body, buf)
            data = buf.getvalue()
            rel_dir = "/".join(
                f"{c}={_partition_value_str(pv[c])}" for c in pcols)
            name = f"part-{_payload_key(data):016x}-{body.num_rows}.parquet"
            rel = f"{rel_dir}/{name}" if rel_dir else name
            abs_dir = os.path.join(table, rel_dir) if rel_dir else table
            os.makedirs(abs_dir, exist_ok=True)
            tmp = os.path.join(abs_dir, f".{name}.tmp-{os.getpid()}")
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, os.path.join(abs_dir, name))
            out_paths.append(rel)
            out_pvals.append(json.dumps(
                {c: _partition_value_str(pv[c]) for c in pcols}))
            out_sizes.append(len(data))
        return pa.table({"path": pa.array(out_paths, pa.string()),
                         "pvals": pa.array(out_pvals, pa.string()),
                         "size": pa.array(out_sizes, pa.int64())})

    manifest = ds.map_batches(write_block, batch_format="pyarrow").take_all()  # bounded: O(files) action rows

    versions = _list_versions(table)
    version = (versions[-1] + 1) if versions else 0
    # additive schema evolution on append: new columns extend the table
    # schema (a metaData action in the same commit); columns the increment
    # LACKS are fine (its files just omit them — reads null-fill against
    # the declared table schema); a type conflict on a shared name errors.
    commit_schema = schema
    evolved = False
    if version > 0 and mode == "append":
        _, cur_schema, cur_pcols, _ = _replay(table)
        if cur_pcols != pcols:
            raise ValueError(
                f"append partition_by {pcols} != table's {cur_pcols}")
        merged = list(cur_schema)
        for f in schema:
            if f.name in cur_schema.names:
                have = cur_schema.field(f.name).type
                if have != f.type:
                    raise TypeError(
                        f"append column {f.name!r}: type {f.type} conflicts "
                        f"with table type {have}")
            else:
                merged.append(f)
                evolved = True
        commit_schema = pa.schema(merged)
    actions: list[dict] = [
        {"commitInfo": {"operation": "WRITE" if mode == "append"
                        else "OVERWRITE", "engine": "monocator_ray"}}
    ]
    if version == 0:
        actions.append({"protocol": {"minReaderVersion": 1,
                                     "minWriterVersion": 2}})
    if version == 0 or mode == "overwrite" or evolved:
        actions.append({"metaData": {
            "id": f"{_payload_key(table.encode()):032x}",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_to_spark_json(commit_schema),
            "partitionColumns": pcols,
            "configuration": {},
        }})
    if mode == "overwrite" and versions:
        _, _, _, prior = _replay(table)
        for a in prior:
            actions.append({"remove": {"path": a["path"],
                                       "deletionTimestamp": 0,
                                       "dataChange": True}})
    for row in manifest:
        actions.append({"add": {
            "path": row["path"],
            "partitionValues": json.loads(row["pvals"]),
            "size": int(row["size"]),
            "modificationTime": 0,
            "dataChange": True,
        }})
    _commit(table, version, actions)
    return version


def checkpoint_delta_table(table: str) -> int:
    """Write ``<v>.checkpoint.parquet`` + ``_last_checkpoint`` for the
    current snapshot (adds compacted, removes dropped, metaData carried)
    so replay cost resets to O(commits since checkpoint).  Returns the
    checkpointed version."""
    version, schema, pcols, adds = _replay(table)
    _write_checkpoint_at(table, version, schema, pcols, adds)
    return version


def vacuum_delta_table(table: str, keep_versions: int | None = None) -> list[str]:
    """Delete data files referenced by NO retained version and log files
    below the retention horizon; returns the deleted paths.

    ``keep_versions=None`` retains every version (vacuum then only sweeps
    stray tmp files and data files no commit ever referenced — crashed
    writers' orphans).  ``keep_versions=k`` retains the newest k versions:
    older JSON commits are dropped AFTER a checkpoint is written at the
    horizon so the retained tail still replays, and any data file whose
    ONLY references were in dropped history is deleted — time travel
    below the horizon is gone, exactly Delta's VACUUM contract."""
    versions = _list_versions(table)
    if not versions:
        return []
    horizon = versions[0] if keep_versions is None else \
        (versions[-keep_versions] if keep_versions <= len(versions)
         else versions[0])

    # every data path referenced by any RETAINED version's live set
    retained: set[str] = set()
    for v in versions:
        if v >= horizon:
            _, _, _, adds = _replay(table, v)
            retained.update(a["path"] for a in adds)

    deleted: list[str] = []
    if keep_versions is not None and horizon > versions[0]:
        # checkpoint the horizon so the retained tail replays standalone
        cp = _read_last_checkpoint(table)
        if cp is None or cp["version"] < horizon:
            _, schema, pcols, adds = _replay(table, horizon)
            _write_checkpoint_at(table, horizon, schema, pcols, adds)
        for v in versions:
            if v < horizon:
                p = os.path.join(_log_dir(table), f"{v:020d}.json")
                os.remove(p)
                deleted.append(p)

    # sweep data files nothing retained references (+ writer tmp leftovers).
    # Tmp files get a grace period: a CONCURRENT writer's in-flight
    # .part-*.tmp-<pid> must survive until its os.replace lands.
    now = time.time()
    for root, _dirs, names in os.walk(table):
        rel_root = os.path.relpath(root, table)
        if rel_root.split(os.sep)[0] == _LOG:
            continue
        for n in names:
            full = os.path.join(root, n)
            rel = os.path.relpath(full, table)
            if n.startswith("."):
                try:
                    if now - os.path.getmtime(full) < _TMP_GRACE_S:
                        continue
                    os.remove(full)
                    deleted.append(full)
                except FileNotFoundError:
                    continue  # the writer just renamed it away
            elif n.endswith(".parquet") and rel not in retained:
                os.remove(full)
                deleted.append(full)
    return deleted


def _write_checkpoint_at(table: str, version: int, schema: pa.Schema,
                         pcols: list[str], adds: list[dict]) -> None:
    """checkpoint_delta_table's writer for an explicit snapshot (vacuum's
    horizon checkpoint)."""
    str_map = pa.map_(pa.string(), pa.string())
    cp_schema = pa.schema([
        ("protocol", pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
        ])),
        ("metaData", pa.struct([
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string()),
                                  ("options", str_map)])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", str_map),
        ])),
        ("add", pa.struct([
            ("path", pa.string()),
            ("partitionValues", str_map),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ])),
    ])
    meta = {"id": "", "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_to_spark_json(schema),
            "partitionColumns": pcols, "configuration": {}}
    # the PROTOCOL requires checkpoints to carry the table's protocol so
    # foreign readers (Spark/delta-rs) replaying from _last_checkpoint see it
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}
    rows = [{"protocol": proto, "metaData": None, "add": None},
            {"protocol": None, "metaData": meta, "add": None}]
    rows += [{"protocol": None, "metaData": None,
              "add": {k: a.get(k) for k in
                      ("path", "partitionValues", "size",
                       "modificationTime", "dataChange")}} for a in adds]
    t = pa.Table.from_pylist(rows, schema=cp_schema)
    path = os.path.join(_log_dir(table), f"{version:020d}.checkpoint.parquet")
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    lc = os.path.join(_log_dir(table), "_last_checkpoint")
    tmp = lc + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"version": version, "size": len(rows)}, f)
    os.replace(tmp, lc)


def write_delta_retrying(ds, table: str, mode: str = "append",
                         partition_by: list[str] | None = None,
                         max_retries: int = 8) -> int:
    """write_delta with the protocol's standard conflict loop: on
    DeltaConcurrentCommit re-read the log and try the next version.
    Append commits are always safe to retry (their adds conflict with
    nothing); overwrite retries recompute the remove set against the
    fresh state, which is last-overwrite-wins — the semantics Delta
    itself gives blind overwrites."""
    last: DeltaConcurrentCommit | None = None
    for _ in range(max_retries):
        try:
            return write_delta(ds, table, mode=mode,
                               partition_by=partition_by)
        except DeltaConcurrentCommit as e:
            last = e
    raise last  # noqa: B904 — the loop's final conflict IS the error
