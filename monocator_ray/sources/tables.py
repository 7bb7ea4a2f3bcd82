"""Size-aware parquet reads for the query layer.

Ray Data's default read parallelism floors out around ``2 x CPUs`` blocks
regardless of input size; for the driver-scale tables (KB-MB parquet files)
that turns every downstream map stage into dozens of ~100-row tasks whose
scheduling overhead dominates the query (measured: token_stats over a 594 KB
documents file ran 2.6 s at the default 64 blocks vs 0.9 s at 8 — and even
the compute-heavy SimHasher stage preferred 8).  ``sized_read_parquet``
overrides the block count ONLY for small inputs, from the on-disk byte size
alone:

* bytes >= 64 MB  -> no override (Ray's ~128 MB-block heuristic is the right
  call at scale, and a fixed cap here would under-split a 100 GB file);
* otherwise       -> ``min(200, max(small_floor, ceil(bytes / 256 KB)))``
  where ``small_floor = min(8, ceil(bytes / 4 KB))`` keeps tiny dimension
  tables (nation/region) in one or two blocks instead of eight empty ones.

The policy is a pure function of input SIZE — never of the session's CPU
count — so a scaling pair (8 vs 32 CPUs) still executes identical work,
which the bench's ``identical_work`` check relies on.
"""

from __future__ import annotations

import os

import ray.data as rd

_LARGE_BYTES = 64 << 20
_TARGET_BYTES = 256 << 10
_FLOOR_GRANULARITY = 4 << 10
_MAX_BLOCKS = 200


def small_input_blocks(total_bytes: int) -> int | None:
    """Block-count override for a small input, or None to use Ray's default."""
    if total_bytes <= 0 or total_bytes >= _LARGE_BYTES:
        return None
    floor = min(8, -(-total_bytes // _FLOOR_GRANULARITY))
    return min(_MAX_BLOCKS, max(floor, -(-total_bytes // _TARGET_BYTES)))


def sized_read_parquet(paths, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    """``rd.read_parquet`` with the small-input block policy above.  ``paths``
    is a path or list of paths; unreadable sizes fall back to Ray's default."""
    plist = [paths] if isinstance(paths, (str, os.PathLike)) else list(paths)
    try:
        total = sum(os.path.getsize(p) for p in plist)
    except OSError:
        total = 0
    nb = small_input_blocks(total)
    if nb is not None and "override_num_blocks" not in kwargs:
        kwargs["override_num_blocks"] = nb
    return rd.read_parquet(paths, columns=columns, **kwargs)


def read_parquet_union(paths, columns: list[str] | None = None) -> "rd.Dataset":
    """Read parquet files whose schemas EVOLVED across snapshots (columns
    added/dropped over time) as one Dataset over the UNION schema —
    missing columns null-filled, matching names cast to a common type
    (the wider of the observed types via Arrow's unify).  Plain
    ``read_parquet`` over such a mix misaligns or errors; incremental
    pipelines (fpstore/aggstore-era snapshots, crawl epochs with added
    feature columns) hit this the moment a schema gains a field.

    Plan: schemas come from footer METADATA only (no data read); files
    group by schema fingerprint; each group reads via
    :func:`sized_read_parquet` (block policy intact, column pruning
    pushed down per group to the columns that group HAS); one
    ``map_batches`` per group aligns to the union schema; groups union.
    The align step is zero-copy for present columns (selection +
    null-array appends only)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    plist = sorted([paths] if isinstance(paths, (str, os.PathLike)) else list(paths))
    if not plist:
        raise ValueError("read_parquet_union: no paths")
    groups: dict[tuple, list[str]] = {}
    schemas: dict[tuple, "pa.Schema"] = {}
    for p in plist:
        sch = pq.read_schema(p)
        key = tuple((n, str(sch.field(n).type)) for n in sch.names)
        groups.setdefault(key, []).append(str(p))
        schemas[key] = sch
    # union schema: field order = first appearance across sorted paths;
    # conflicting types unify via Arrow (raises on irreconcilable ones —
    # surfacing the conflict beats silently casting)
    union = pa.unify_schemas(list(schemas.values()))
    if columns is not None:
        union = pa.schema([union.field(c) for c in columns])
    union_names = list(union.names)

    out = None
    for key, files in groups.items():
        have = {n for n, _t in key}
        cols = [c for c in union_names if c in have]
        ds = sized_read_parquet(files, columns=cols or None)
        target = union  # closure-captured; ships by value with the fn

        def align(t: "pa.Table", _target=target) -> "pa.Table":
            arrays = []
            for f in _target:
                if f.name in t.column_names:
                    arrays.append(t[f.name].cast(f.type))
                else:
                    arrays.append(pa.nulls(t.num_rows, f.type))
            return pa.Table.from_arrays(arrays, schema=_target)

        ds = ds.map_batches(align, batch_format="pyarrow")
        out = ds if out is None else out.union(ds)
    return out
