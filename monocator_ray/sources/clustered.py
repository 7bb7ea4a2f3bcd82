"""Clustered (range-partitioned, sorted) parquet output with manifest-
pruned reads — the query-layer rendering of the crawl store's layout
(SURVEY.md: "resumable output: partitioned parquet, never one giant
file").

``write_clustered`` range-partitions the dataset on an int64 key via a
sampled-quantile splitter, sorts within each range, and writes ONE file
per range plus a ``_manifest.json`` recording each file's exact key
span and row count (written LAST — its presence is the success marker,
so a crashed run is re-runnable by range).  ``read_clustered`` opens
only the files whose recorded span overlaps the requested range — the
same prune-at-the-read discipline as the crawl's bucketed store, and
rows inside each file are already key-sorted for downstream merges.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from monocator_ray.shipping import ensure_shipped


def _sample_splits(ds: rd.Dataset, key: str, num_ranges: int, sample_rows: int = 8192) -> np.ndarray:
    """Range split points from a bounded key sample (per-batch head sample,
    driver quantiles) — O(sample) driver memory regardless of input size."""
    per_block = max(64, sample_rows // 64)

    def head_keys(t: pa.Table) -> pa.Table:
        return pa.table({key: t[key].slice(0, per_block)})

    sample = ds.map_batches(head_keys, batch_format="pyarrow").to_pandas()[key].to_numpy()
    if len(sample) == 0 or num_ranges <= 1:
        return np.empty(0, dtype=np.int64)
    qs = np.linspace(0, 1, num_ranges + 1)[1:-1]
    return np.unique(np.quantile(sample, qs).astype(np.int64))


def write_clustered(ds: rd.Dataset, key: str, out_dir: str, num_ranges: int = 16) -> dict:
    """Write ``ds`` as ``range-<i>.parquet`` files sorted by ``key`` with a
    span manifest.  Returns the manifest dict.  Partitioning: explicit
    range ids from broadcast split points + a range-id groupby, so each
    range lands wholly in one write task (workers write their own file —
    the driver never holds data)."""
    ensure_shipped()
    os.makedirs(out_dir, exist_ok=True)
    splits = _sample_splits(ds, key, num_ranges)
    splits_ref = ray.put(splits)

    def add_range(t: pa.Table) -> pa.Table:
        sp = ray.get(splits_ref)
        k = t[key].to_numpy(zero_copy_only=False)
        rid = np.searchsorted(sp, k, side="right") if len(sp) else np.zeros(len(k), np.int64)
        return t.append_column("_range", pa.array(rid.astype(np.int64), pa.int64()))

    def write_range(g: pa.Table) -> pa.Table:
        rid = int(g["_range"][0].as_py())
        g = g.drop_columns(["_range"])
        order = np.argsort(g[key].to_numpy(zero_copy_only=False), kind="mergesort")
        g = g.take(pa.array(order))
        path = os.path.join(out_dir, f"range-{rid:05d}.parquet")
        # atomic publish (duplicate-task truncation guard, see fpstore)
        tmp = f"{path}.tmp-{os.getpid()}-{os.urandom(4).hex()}"
        pq.write_table(g, tmp)
        os.replace(tmp, path)
        k = g[key].to_numpy(zero_copy_only=False)
        return pa.table(
            {"range_id": pa.array([rid], pa.int64()),
             "file": pa.array([os.path.basename(path)], pa.string()),
             "key_min": pa.array([int(k[0])], pa.int64()),
             "key_max": pa.array([int(k[-1])], pa.int64()),
             "n_rows": pa.array([len(k)], pa.int64())}
        )

    entries = (
        ds.map_batches(add_range, batch_format="pyarrow")
        .groupby("_range")
        .map_groups(write_range, batch_format="pyarrow")
        .to_pandas()
    )
    if len(entries) == 0:  # empty input: valid empty manifest, no files
        entries = entries.reindex(columns=["range_id", "file", "key_min", "key_max", "n_rows"])
    entries = entries.sort_values("range_id")
    manifest = {
        "key": key,
        "files": entries.to_dict("records"),
        "n_rows": int(entries["n_rows"].sum()) if len(entries) else 0,
    }
    # manifest written LAST = success marker (a crashed write leaves no
    # manifest; rerun overwrites range files idempotently)
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


def _overlapping(manifest: dict, out_dir: str, lo: int | None, hi: int | None) -> list[str]:
    """Full paths of the manifest files whose span overlaps [lo, hi] —
    the ONE overlap predicate both the reader and pruned_files use."""
    return [
        os.path.join(out_dir, e["file"])
        for e in manifest["files"]
        if (hi is None or e["key_min"] <= hi) and (lo is None or e["key_max"] >= lo)
    ]


def read_clustered(out_dir: str, lo: int | None = None, hi: int | None = None) -> rd.Dataset:
    """Read back rows with ``lo <= key <= hi`` touching only the files
    whose manifest span overlaps (both bounds optional)."""
    ensure_shipped()
    with open(os.path.join(out_dir, "_manifest.json")) as f:
        manifest = json.load(f)
    key = manifest["key"]
    files = _overlapping(manifest, out_dir, lo, hi)
    if not files:
        if manifest["files"]:  # schema-pinned empty from any real file
            first = os.path.join(out_dir, manifest["files"][0]["file"])
            return rd.from_arrow(pq.read_table(first).slice(0, 0))
        return rd.from_arrow(pa.table({}))  # empty write: no schema exists
    ds = rd.read_parquet(files)
    if lo is None and hi is None:
        return ds
    import pyarrow.compute as pc

    def trim(t: pa.Table) -> pa.Table:
        k = t[key]
        mask = None
        if lo is not None:
            mask = pc.greater_equal(k, pa.scalar(lo))
        if hi is not None:
            m2 = pc.less_equal(k, pa.scalar(hi))
            mask = m2 if mask is None else pc.and_(mask, m2)
        return t.filter(mask)

    return ds.map_batches(trim, batch_format="pyarrow")


def pruned_files(out_dir: str, lo: int | None = None, hi: int | None = None) -> list[str]:
    """The file subset (full paths) read_clustered would touch."""
    with open(os.path.join(out_dir, "_manifest.json")) as f:
        manifest = json.load(f)
    return _overlapping(manifest, out_dir, lo, hi)
