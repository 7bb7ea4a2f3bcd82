"""Fixed-cost controls for small/medium Dataset stages.

Two measured problems (round 2, 32-cpu session, sf0.1 tables):

* **Actor-pool spin-up** — ``map_batches(Cls, concurrency=N)`` launches N
  fresh actor processes per query (~1.8-2.1 s even in a warm session; pools
  are torn down when the dataset finishes).  For stages whose setup is
  cheap (compile a regex, draw permutation seeds, ``ray.get`` a broadcast
  ref) that spin-up IS the stage cost at any input size — it is paid per
  query on a 256-node cluster exactly as on this box.  :func:`cached_stage`
  keeps the callable-class pattern (setup separate from per-batch work) but
  runs it as plain map TASKS on Ray's warm worker processes, constructing
  the instance lazily once per worker (best-effort cache; construction is
  cheap by precondition, so a cache miss only costs the setup again).
  Stages with genuinely heavy setup (the page-store fetcher's sidecar
  index, media decoders) keep real actor pools.

* **Per-group dispatch** — ``groupby(k).map_groups(fn)`` calls ``fn`` once
  per group (~60 us of slicing + pandas overhead each).  LSH banding
  produces one group per (band, hash-bucket): ~16x corpus groups, nearly
  all singletons — per-group dispatch costs more than the pair math by
  100x, and at 10^9 documents it is ~10^10 Python calls.
  :func:`hash_partitioned` groups by a HASH PARTITION of the key instead
  (``num_parts`` groups total) and hands ``fn`` one table holding all of a
  partition's complete key-groups, to be grouped vectorized inside
  (sort + run-length boundaries — see ``run_boundaries``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from monocator_ray.hashing import hash_str64

_instances: dict = {}


def cached_stage(cls, **kwargs):
    """A plain function for ``map_batches`` that lazily constructs and
    caches ``cls(**kwargs)`` once per worker process (see module docstring).
    ``kwargs`` values must be hashable (ObjectRefs are)."""
    cls_key = (cls.__module__, cls.__qualname__)
    key = (cls_key, tuple(sorted(kwargs.items())))

    def stage(batch):
        inst = _instances.get(key)
        if inst is None:
            # One live instance per class: a new kwargs key (e.g. fpstore's
            # per-generation fences_json) evicts the stale one, or a
            # long-lived incremental session leaks one decoded-shard cache
            # per ingest generation on every worker (ADVICE r2 #5).
            for k in [k for k in _instances if k[0] == cls_key]:
                del _instances[k]
            inst = _instances[key] = cls(**kwargs)
        return inst(batch)

    stage.__name__ = stage.__qualname__ = f"task:{cls.__name__}"
    return stage


_MIX = np.uint64(0x9E3779B97F4A7C15)  # Fibonacci hashing multiplier


def hash_part_column(cols: list[np.ndarray], num_parts: int) -> np.ndarray:
    """int64 partition id in [0, num_parts) from one or more uint64/int64
    key columns (multiplicative mix so low-entropy keys still spread)."""
    acc = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        acc = (acc ^ c.astype(np.uint64, copy=False)) * _MIX
    return ((acc >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int64)


def hash_partitioned(ds, key_arrays_fn, fn, num_parts: int = 64):
    """``groupby(keys).map_groups(fn)`` with per-PARTITION instead of
    per-group dispatch: adds ``_part = hash(keys) % num_parts`` via
    ``key_arrays_fn(table) -> [np.ndarray, ...]``, groups on ``_part``
    (``num_parts`` groups total, uniform by the hash), and calls ``fn`` once
    per partition with the ``_part`` column already dropped.  ``fn`` must
    re-group on the fine key internally (vectorized).

    SIZING: one partition is materialized per ``fn`` call, so ``num_parts``
    must scale with the input — pick ``num_parts ~ input_bytes /
    target_partition_bytes`` (e.g. 256 MB) at large scale; the 64 default
    suits the driver-table/bench sizes.  The hash is uniform, so partition
    skew is bounded by key-group skew only."""

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_part", pa.array(hash_part_column(key_arrays_fn(t), num_parts), pa.int64())
        )

    def run(g: pa.Table) -> pa.Table:
        return fn(g.drop_columns(["_part"]))

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("_part").map_groups(
        run, batch_format="pyarrow"
    )


def _key_arrays(t: pa.Table, key_cols: list[str]) -> list[np.ndarray]:
    """uint64 hashables for hash_part_column from arbitrary key columns:
    numeric/temporal columns bit-reinterpret, string columns SipHash."""
    out = []
    for c in key_cols:
        col = t[c]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            out.append(hash_str64(col.to_pylist()))
        else:
            arr = col.to_numpy(zero_copy_only=False)
            if arr.dtype.kind == "M":  # datetime64 -> int64 view
                arr = arr.view(np.int64)
            out.append(arr.astype(np.uint64, copy=False) if arr.dtype != np.uint64 else arr)
    return out


def partitioned_aggregate(ds, key_cols: list[str], aggs: list[tuple], names: list[str], num_parts: int = 32):
    """Exact ``groupby(key_cols).aggregate(...)`` via coarse hash partitions
    with an Arrow-native ``pa.TableGroupBy`` inside each: Ray's sort-based
    aggregate was measured ~25 us/row/agg at driver scale (4.8 s for 98 k
    rows x 4 aggs), while the C++ kernel does the same in milliseconds — the
    Ray shuffle then only moves ``num_parts`` coarse groups.  Every fine
    group lands wholly in one partition (hash of the full key), so results
    are exact for decomposable aggregates.

    ``aggs``: pyarrow aggregate pairs, e.g. ``[("v", "sum"), ("v", "count")]``
    (note ``"count"`` counts NON-NULL values of that column — pass a
    never-null column to count rows).  ``names``: output column names for
    ``key_cols + aggs`` in that order (pyarrow puts keys first).  Same
    num_parts sizing rule as ``hash_partitioned``."""

    def agg_part(t: pa.Table) -> pa.Table:
        return t.group_by(key_cols).aggregate(list(aggs)).rename_columns(list(names))

    return hash_partitioned(ds, lambda t: _key_arrays(t, key_cols), agg_part, num_parts)


def driver_grouped_agg(ds, key_cols: list[str], aggs: list[tuple], names: list[str]) -> pd.DataFrame:
    """Grouped aggregate whose RESULT is small (O(groups), e.g. stats per
    language / return flag): Arrow-C++ partial combine per BATCH, final
    combine driver-side in pandas.  The driver only ever holds
    O(blocks x groups) partial rows — bounded by the result's own group
    count times read parallelism, the same driver-smallness argument as a
    broadcast join's build side.  Versus a Ray-native aggregate this removes
    the whole shuffle (one map stage instead of map + sort-shuffle + reduce).

    ``aggs``/``names`` as in :func:`partitioned_aggregate`; supported
    aggregate fns: sum / min / max / count (count partials re-combine by
    summing).  Returns an UNSORTED pandas frame with ``names`` columns."""

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(key_cols).aggregate(list(aggs)).rename_columns(list(names))

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if pdf.empty and any(c not in pdf.columns for c in names):
        # a fully-filtered-out input yields a schema-less empty frame
        # (Ray's zero-column empty-block class); give it the real columns
        import pandas as _pd

        return _pd.DataFrame({n: _pd.Series([], dtype="object") for n in names})
    final = {
        name: ("sum" if f in ("sum", "count") else f)
        for (_c, f), name in zip(aggs, names[len(key_cols):])
    }
    return pdf.groupby(key_cols, as_index=False).agg(final)


def run_boundaries(*cols: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-key runs over pre-sorted key columns."""
    n = len(cols[0])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for c in cols:
        new[1:] |= c[1:] != c[:-1]
    starts = np.nonzero(new)[0]
    ends = np.append(starts[1:], n)
    return starts, ends


def join_partitions(paths: list[str], lo: int = 2, hi: int = 256,
                    target_bytes: int = 256 << 20) -> int:
    """Adaptive Dataset.join partition count: ~one partition per 256 MB of
    joined INPUT file bytes (metadata only — never an execution).  Measured
    (round 3, 8-cpu session): the join's hash-shuffle fixed cost grows
    ~0.1 s per partition (0.65 s at 2 vs 2.2 s at 16 on driver-scale
    inputs), so hardcoded 8/16-partition joins tax every small join ~1-1.5
    s; at 100 TB the same formula rides the hi cap instead."""
    import os

    total = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    return join_partitions_for_bytes(total, lo, hi, target_bytes)


def join_partitions_for_bytes(total: int | None, lo: int = 2, hi: int = 256,
                              target_bytes: int = 256 << 20) -> int:
    """:func:`join_partitions` for an already-known byte count (e.g. a
    materialized Dataset's ``size_bytes()``; None -> the lo floor).  Keeps
    iterative-join callers (pagerank_join_path) on the same sizing curve
    instead of a hardcoded constant (code-review r3 finding #7)."""
    return int(max(lo, min(hi, -(-(total or 0) // target_bytes))))


def collect_arrow(ds) -> pa.Table:
    """Driver-side collect of a SMALL Dataset as one Arrow table.

    Ray Data occasionally emits schema-LESS empty blocks (zero columns —
    the "RefBundle with a different schema" warning); ``pa.concat_tables``
    rejects them, which made every ``concat_tables(ray.get(...))`` site a
    latent flake (observed: q_triangle_count, bench r2g).  Dropping
    zero-column blocks is lossless: an empty block carries no rows."""
    import ray as _ray

    tabs = [t for t in _ray.get(ds.to_arrow_refs()) if t.num_columns]
    nonempty = [t for t in tabs if t.num_rows]
    if nonempty:
        # zero-row blocks can carry DEGRADED schemas (empty pandas batches
        # convert string columns to null type) — drop them when any real
        # block exists; keep one only as the schema for an empty result
        return pa.concat_tables(nonempty)
    return tabs[0] if tabs else pa.table({})
