"""Persistent fingerprint store: INCREMENTAL exact dedup at corpus scale.

One-shot dedup (pipelines/docs.q_dedup_exact) re-shuffles the whole corpus
every run; a continuously-ingesting pipeline instead PROBES an index of
everything already accepted and keeps only novel documents — the LSM shape
of ``state/seen.py`` lifted to a durable on-disk store.

Layout under ``store_dir``:

* ``run=<gen>/fp-<part>.parquet`` — one generation per ingested batch,
  each file holding a SORTED uint64 (int64 bit-view) fingerprint range,
  written worker-side by range partition;
* ``run=<gen>/_MANIFEST.json`` — per-file ``[min, max, rows]`` fences,
  written LAST as the generation's success marker (manifest-last
  discipline, like sources/clustered.py / annstore.py).

A probe consults every generation's fences (tiny, broadcast) and reads
ONLY the shard files whose [min, max] range intersects the batch's
fingerprints — at 10^10 accepted docs and a few-thousand-doc increment
that is a handful of shard reads, not a corpus scan.  Workers cache
decoded shard arrays in a per-process LRU keyed by (path, mtime).

Membership is by 64-bit content fingerprint (textstats.Fingerprinter);
collisions merge distinct texts with probability ~n^2/2^65 — the same
documented tradeoff as q_dedup_exact's SipHash group key.
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
from monocator_ray.stages.textstats import fingerprint_arrow
from monocator_ray.sources.storelock import locked_writer
from monocator_ray.stages.grouped import (
    cached_stage,
    collect_arrow,
    hash_partitioned,
    run_boundaries,
)


def _runs(store_dir: str) -> list[str]:
    if not os.path.isdir(store_dir):
        return []
    out = []
    for name in sorted(os.listdir(store_dir)):
        d = os.path.join(store_dir, name)
        if name.startswith("run=") and os.path.exists(os.path.join(d, "_MANIFEST.json")):
            out.append(d)
    return out


def _fences(store_dir: str) -> list[dict]:
    """Every complete generation's shard fences: [{path, lo, hi}, ...].

    A run whose manifest vanishes between the listdir and the open is one
    a concurrent ``compact()`` is mid-sweep on — by the commit rule its
    superseding generation is already committed and listed, so SKIPPING
    the vanished run is exact (this must not raise: the prober's own
    FileNotFoundError recovery calls it)."""
    fences = []
    for d in _runs(store_dir):
        try:
            with open(os.path.join(d, "_MANIFEST.json")) as fh:
                recs = json.load(fh)
        except FileNotFoundError:
            continue  # swept mid-listing: superseded, new gen is visible
        for rec in recs:
            fences.append(
                {"path": os.path.join(d, rec["file"]),
                 "lo": int(rec["lo"]), "hi": int(rec["hi"])}
            )
    return fences


class _ShardProber:
    """map_batches stage: drop rows whose fingerprint exists in the store.

    Fences arrive via the constructor (a broadcast-sized list); shard
    arrays load lazily per worker and live in an LRU keyed by
    (path, mtime) so a regenerated store never serves stale bytes.

    Compaction race: ``compact()`` sweeps superseded COMMITTED runs after
    its manifest commit, so a prober holding pre-compact fences can stat a
    deleted shard file (storelock.py promises readers are safe concurrent
    with writers — this is the code that keeps that promise for fpstore).
    Compaction preserves membership exactly, so on FileNotFoundError the
    prober re-reads the fences from the store and re-probes — an exact
    retry, not best-effort.  ``ingest`` itself holds the writer lock, so
    its probe never races; this path exists for lock-free readers."""

    def __init__(self, fences_json: str, store_dir: str = "",
                 cache_shards: int = 64):
        self._load_fences(json.loads(fences_json))
        self.store_dir = store_dir
        self.cache: dict = {}
        self.cache_shards = cache_shards

    def _load_fences(self, fences: list[dict]) -> None:
        self.fences = fences
        self.los = np.array([f["lo"] for f in fences], dtype=np.int64)
        self.his = np.array([f["hi"] for f in fences], dtype=np.int64)

    def _shard(self, path: str) -> np.ndarray:
        key = (path, os.stat(path).st_mtime_ns)
        arr = self.cache.pop(key, None)  # pop+reinsert = move-to-end (LRU)
        if arr is None:
            if len(self.cache) >= self.cache_shards:
                self.cache.pop(next(iter(self.cache)))
            arr = pq.read_table(path)["fp"].to_numpy(zero_copy_only=False)
        self.cache[key] = arr
        return arr

    def _probe(self, batch: pa.Table) -> pa.Table:
        fp = batch["fp"].to_numpy(zero_copy_only=False)
        seen = np.zeros(len(fp), dtype=bool)
        for i, f in enumerate(self.fences):
            # fence prune: skip shards whose range can't hold any batch fp
            in_range = (fp >= self.los[i]) & (fp <= self.his[i])
            if not in_range.any():
                continue
            shard = self._shard(f["path"])
            cand = fp[in_range]
            pos = np.searchsorted(shard, cand)
            hit = (pos < len(shard)) & (shard[np.minimum(pos, len(shard) - 1)] == cand)
            idx = np.nonzero(in_range)[0]
            seen[idx[hit]] = True
        return batch.filter(pa.array(~seen))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or not self.fences:
            return batch
        for _ in range(3):  # concurrent compactions are rare; 3 is plenty
            try:
                return self._probe(batch)
            except FileNotFoundError:
                if not self.store_dir:
                    raise
                self._load_fences(_fences(self.store_dir))
                if not self.fences:
                    return batch
        return self._probe(batch)


class _FpStage:
    """(doc_id, text) pyarrow batch -> (doc_id, fp int64) — Arrow-native
    since r3 (VERDICT r2 #7): no per-batch pandas conversion."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fp = fingerprint_arrow(batch["text"]).view(np.int64)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "fp": pa.array(fp, pa.int64()),
            }
        )


def _dedup_first_wins(fp_ds: rd.Dataset, num_parts: int = 32) -> rd.Dataset:
    """Within-batch first-wins (min doc_id per fingerprint)."""

    _OUT = pa.schema([("doc_id", pa.int64()), ("fp", pa.int64())])

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        fp = t["fp"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, fp))
        starts, _ends = run_boundaries(fp[order])
        keep = order[starts]
        return pa.table(
            {"doc_id": pa.array(did[keep], pa.int64()),
             "fp": pa.array(fp[keep], pa.int64())}
        )

    return hash_partitioned(
        fp_ds,
        lambda t: [t["fp"].to_numpy(zero_copy_only=False).view(np.uint64)],
        part,
        num_parts=num_parts,
    )


_SHARD_OUT = pa.schema(
    [("file", pa.string()), ("lo", pa.int64()), ("hi", pa.int64()),
     ("rows", pa.int64())]
)


def _write_generation(fp_ds: rd.Dataset, run_dir: str, num_shards: int) -> list[dict]:
    """Range-partition a (fp int64) Dataset into sorted shard files under
    ``run_dir`` and return the manifest records (NOT yet committed — the
    caller writes _MANIFEST.json last).  One implementation of the shard
    format shared by ingest() and compact(); changing naming/fences in one
    place keeps every generation readable."""

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SHARD_OUT.empty_table()
        fp = np.sort(t["fp"].to_numpy(zero_copy_only=False))
        # unsigned-hex min: partitions hold disjoint fp sets, so names never
        # collide; Python's & gives the unsigned 64-bit value
        name = f"fp-{int(fp[0]) & 0xFFFFFFFFFFFFFFFF:016x}.parquet"
        # ATOMIC publish (unique temp + os.replace), NOT a direct write:
        # Ray may re-execute a map task (retry/straggler), and a duplicate
        # still running after the manifest commit would reopen the
        # committed path WITH TRUNCATE — a concurrent probe then reads a
        # 0-byte parquet (caught in the wild: the r4 fpstore flake).  The
        # content is a pure function of the partition, so a late duplicate
        # replacing the file atomically is a no-op.
        final = os.path.join(run_dir, name)
        tmp = f"{final}.tmp-{os.getpid()}-{os.urandom(4).hex()}"
        pq.write_table(pa.table({"fp": pa.array(fp, pa.int64())}), tmp)
        os.replace(tmp, final)
        return pa.table(
            {"file": pa.array([name], pa.string()),
             "lo": pa.array([int(fp[0])], pa.int64()),
             "hi": pa.array([int(fp[-1])], pa.int64()),
             "rows": pa.array([len(fp)], pa.int64())}
        )

    def range_key(t: pa.Table) -> list:
        # TOP bits of the (uniform) fingerprint: equal-width ranges, so
        # shards are disjoint sorted runs and fences prune tightly
        fp = t["fp"].to_numpy(zero_copy_only=False).view(np.uint64)
        return [(fp >> np.uint64(64 - 4))]

    manifest = collect_arrow(
        hash_partitioned(fp_ds, range_key, write_shard, num_parts=num_shards)
    )
    return manifest.to_pylist() if manifest.num_rows else []


@locked_writer
def ingest(docs: rd.Dataset, store_dir: str, num_shards: int = 16) -> rd.Dataset:
    """Ingest a (doc_id, text) increment: return the NOVEL survivors
    (first-wins within the increment, nothing already in the store) and
    append their fingerprints as a new generation.

    Three streaming stages: fingerprint map -> within-increment dedup
    (one hash partition) -> store probe (fence-pruned shard reads), then
    the survivors' fingerprints range-partition into sorted shard files
    written worker-side; the manifest write commits the generation."""
    ensure_shipped()
    os.makedirs(store_dir, exist_ok=True)
    fps = docs.map_batches(cached_stage(_FpStage), batch_format="pyarrow")
    local = _dedup_first_wins(fps).materialize()
    fences = _fences(store_dir)
    novel = local.map_batches(
        # cached per worker process so shard arrays survive across batches
        cached_stage(_ShardProber, fences_json=json.dumps(fences),
                     store_dir=store_dir),
        batch_format="pyarrow",
    ).materialize()

    # append the new generation: range partition by fingerprint so each
    # shard file is a sorted, fence-able run.  Number by MAX existing run
    # index (committed or not) — len(committed) would renumber into a gap
    # and destroy a committed generation; a crashed (manifest-less) dir at
    # the max index is the only thing safe to overwrite, so reuse it
    idx = [int(d.split("=", 1)[1]) for d in os.listdir(store_dir)
           if d.startswith("run=")] if os.path.isdir(store_dir) else []
    gen = max(idx) + 1 if idx else 0
    if idx and not os.path.exists(
        os.path.join(store_dir, f"run={max(idx)}", "_MANIFEST.json")
    ):
        gen = max(idx)  # crashed attempt: rewrite in place
    run_dir = os.path.join(store_dir, f"run={gen}")
    os.makedirs(run_dir, exist_ok=True)
    for f in os.listdir(run_dir):  # crashed attempt: clear before rewrite
        os.remove(os.path.join(run_dir, f))

    recs = _write_generation(novel.select_columns(["fp"]), run_dir, num_shards)
    with open(os.path.join(run_dir, "_MANIFEST.json"), "w") as fh:
        json.dump(recs, fh)
    return novel


def store_size(store_dir: str) -> int:
    """Total accepted fingerprints across all complete generations."""
    return sum(f["rows"] for d in _runs(store_dir)
               for f in json.load(open(os.path.join(d, "_MANIFEST.json"))))


@locked_writer
def compact(store_dir: str, num_shards: int = 16) -> int:
    """LSM compaction: merge every committed generation into ONE new
    generation of sorted shards, then drop the inputs.  Probe cost scales
    with the fence count, so periodic compaction keeps a long-lived store's
    probes at one shard read per range instead of one per ingest.

    Crash-safe in the store's own terms: the merged generation is written
    at the next run index with the usual manifest-last commit, and the
    input runs are deleted only AFTER that commit — a crash in between
    leaves duplicate fingerprints across runs, which probes tolerate
    (membership is idempotent) and the next compaction removes.  Returns
    the number of fingerprints in the compacted generation."""
    ensure_shipped()
    runs = _runs(store_dir)
    if len(runs) <= 1:
        return store_size(store_dir)
    files = [f["path"] for f in _fences(store_dir)]
    if not files:
        # every committed generation is empty: dropping them loses nothing
        import shutil

        for d in runs:
            shutil.rmtree(d)
        return 0
    merged = rd.read_parquet(files)

    # distinct (generations may share a fingerprint only via the
    # crash-window above, but compaction must converge regardless)
    _OUT = pa.schema([("fp", pa.int64())])

    def distinct_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        fp = np.unique(t["fp"].to_numpy(zero_copy_only=False))
        return pa.table({"fp": pa.array(fp, pa.int64())})

    gen = max(int(d.split("=", 1)[1]) for d in os.listdir(store_dir)
              if d.startswith("run=")) + 1
    run_dir = os.path.join(store_dir, f"run={gen}")
    os.makedirs(run_dir, exist_ok=True)

    distinct = hash_partitioned(merged, lambda t: [
        t["fp"].to_numpy(zero_copy_only=False).view(np.uint64)
    ], distinct_part, num_parts=num_shards).materialize()
    recs = _write_generation(distinct, run_dir, num_shards)
    with open(os.path.join(run_dir, "_MANIFEST.json"), "w") as fh:
        json.dump(recs, fh)  # commit point
    import shutil

    for d in runs:  # inputs dropped only after the commit
        shutil.rmtree(d)
    return sum(r["rows"] for r in recs)
