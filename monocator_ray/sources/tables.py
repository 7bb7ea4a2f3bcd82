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
