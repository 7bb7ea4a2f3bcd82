"""Stable, vectorized 64-bit hashing (SURVEY.md §2 M2).

The SPEC calls for "canonicalized-URL 64-bit hashes" as the dedup key and
"host-hash repartitioning" as the partition key.  xxhash is not available in
this environment, so we use pandas' vectorized SipHash-1-3
(``pandas.util.hash_array``) with a pinned 16-byte key — deterministic across
processes, runs, and parallelism levels, which is what the exact-order /
exact-seen-set contract needs (SURVEY.md §4.3: everything order-relevant is
decided by keys, never by arrival time).

All functions accept a sequence / numpy array / pyarrow array of strings and
return ``np.ndarray[uint64]``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Pinned key: changing this invalidates every checkpoint and golden file.
HASH_KEY = "monocator_ray_64"  # exactly 16 bytes
assert len(HASH_KEY.encode()) == 16


def _to_object_array(values) -> np.ndarray:
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    return arr


def hash_str64(values) -> np.ndarray:
    """Stable uint64 hash of each string (SipHash-1-3, pinned key)."""
    arr = _to_object_array(values)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, encoding="utf8", hash_key=HASH_KEY, categorize=False)


def hash_url64(urls) -> np.ndarray:
    """Dedup key: hash of the *canonical* URL string."""
    return hash_str64(urls)


def hash_host64(hosts) -> np.ndarray:
    """Partition key: hash of the registrable host."""
    return hash_str64(hosts)


def shard_of(host_hash: np.ndarray, num_shards: int) -> np.ndarray:
    """Deterministic shard routing: host_hash % num_shards → int32.

    Sharding by host (not url) keeps all of a host's URLs on one shard so
    per-host politeness/caps state is never split (SURVEY.md §2.3 A1-A3).
    """
    return (np.asarray(host_hash, dtype=np.uint64) % np.uint64(num_shards)).astype(np.int32)
