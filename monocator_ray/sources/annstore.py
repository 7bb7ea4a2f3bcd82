"""Persistent IVF index store: build once, query many times with PRUNED
reads — the serving layout q_ann_ivf_topk's docstring points at (its
per-call index makes batch-side pruning the right choice there; a store
amortizes the index across query batches and lets every search read only
``nprobe / nlist`` of the corpus bytes from disk).

Layout under ``store_dir``:

* ``list=<id>.parquet`` — one file per IVF list, rows ``(vec_id,
  embedding)`` assigned to that centroid, written ON THE WORKER holding
  them (one partitioned pass over the corpus);
* ``centroids.npz`` — the trained centroid matrix plus per-list row
  counts, written LAST as the success marker (same manifest-last
  discipline as ``sources/clustered.py``).

``search`` reads ONLY the union of the query batch's probed list files
(`read_parquet` over that explicit file list), scores per list and merges
— at 10^9 vectors and nprobe/nlist = 1/4 that is a 4x I/O cut before any
compute, and the per-list files shard naturally across a cluster.
Results are identical to the in-memory probe by construction (same
centroids, same per-list brute force, same tie rule); pinned in tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from monocator_ray.shipping import ensure_shipped
from monocator_ray.stages.ann import IvfIndex, _normalize, global_topk, table_to_matrix
from monocator_ray.stages.grouped import collect_arrow, run_boundaries
from monocator_ray.sources.storelock import locked_writer


@locked_writer
def build_ivf_store(emb: rd.Dataset, store_dir: str, nlist: int = 16,
                    train_sample: int = 2048) -> IvfIndex:
    """Partition the embedding Dataset into per-list parquet files.

    Centroids train on a bounded head sample (never the full table); the
    corpus streams through one assignment pass; each (list, block) group
    is appended worker-side.  Multiple blocks may hold rows of one list —
    files are ``list=<id>-<minvec>.parquet`` so concurrent writers never
    collide; the build starts by CLEARING prior shards (names depend on
    block splits, so a crashed attempt's leftovers would otherwise
    duplicate vectors) and only a build that reaches the final
    ``centroids.npz`` write counts as complete."""
    ensure_shipped()
    os.makedirs(store_dir, exist_ok=True)
    # clear any previous/partial build: shard names depend on block splits,
    # so a retry with different blocks would otherwise leave stale shards
    # that search would read alongside the new ones (duplicate vectors)
    for f in os.listdir(store_dir):
        if f.startswith("list=") or f == "centroids.npz":
            os.remove(os.path.join(store_dir, f))
    head = emb.limit(train_sample).take_all()
    sample = np.array([r["embedding"] for r in head], dtype=np.float32)
    index = IvfIndex.train(sample, nlist=nlist)
    index_ref = ray.put(index)

    def write_block(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        inst = ray.get(index_ref)
        lists = inst.assign(table_to_matrix(t))
        order = np.argsort(lists, kind="mergesort")
        t = t.take(pa.array(order, pa.int64()))
        lists = lists[order]
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        out_l, out_n = [], []
        starts, ends = run_boundaries(lists)
        for s, e in zip(starts.tolist(), ends.tolist()):
            lid = int(lists[s])
            part = t.slice(s, e - s)
            # atomic publish (duplicate-task truncation guard, see fpstore)
            final = os.path.join(store_dir, f"list={lid}-{int(ids[s:e].min())}.parquet")
            tmp = f"{final}.tmp-{os.getpid()}-{os.urandom(4).hex()}"
            pq.write_table(part.select(["vec_id", "embedding"]), tmp)
            os.replace(tmp, final)
            out_l.append(lid)
            out_n.append(e - s)
        return pa.table({"list_id": pa.array(out_l, pa.int32()),
                         "n": pa.array(out_n, pa.int64())})

    manifest = emb.map_batches(write_block, batch_format="pyarrow").to_pandas()
    counts = manifest.groupby("list_id")["n"].sum()
    sizes = np.zeros(len(index.centroids), np.int64)
    sizes[counts.index.to_numpy()] = counts.to_numpy()
    _write_marker(store_dir, centroids=index.centroids, sizes=sizes,
                  gens=np.array([0], np.int64))
    return index


def _write_marker(store_dir: str, **arrays) -> None:
    """Atomic centroids.npz commit: an in-place np.savez over the LIVE
    marker would truncate it first — a crash mid-write destroys the whole
    store, strictly worse than the orphan case the gens machinery guards
    (code-review r3-closing-2 finding #2).  Temp file + os.replace."""
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=store_dir, suffix=".npztmp")
    os.close(fd)
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, os.path.join(store_dir, "centroids.npz"))


def load_ivf_store(store_dir: str) -> tuple[IvfIndex, np.ndarray]:
    marker = os.path.join(store_dir, "centroids.npz")
    if not os.path.exists(marker):
        raise FileNotFoundError(f"no complete IVF store at {store_dir} "
                                "(centroids.npz is written last)")
    z = np.load(marker)
    return IvfIndex(z["centroids"]), z["sizes"]


def _committed_gens(store_dir: str) -> set[int]:
    z = np.load(os.path.join(store_dir, "centroids.npz"))
    return set(z["gens"].tolist()) if "gens" in z else {0}


def _file_gen(name: str) -> int:
    """list=<id>-g<gen>-<minvec>.parquet -> gen; build files (no -g tag)
    are generation 0."""
    parts = name.split("-")
    for p in parts[1:]:
        if p.startswith("g") and p[1:].isdigit():
            return int(p[1:])
    return 0


@locked_writer
def ingest_ivf_store(emb: rd.Dataset, store_dir: str) -> int:
    """APPEND an embedding increment to an existing store — the
    incremental-family path (fpstore/invstore pattern): new vectors are
    assigned with the EXISTING centroids (the standard IVF serving
    property — lists drift from optimal as the distribution shifts, but
    results stay exact for the probed lists; rebuild to retrain) and land
    in generation-tagged ``list=<id>-g<gen>-<minvec>.parquet`` files.
    The centroids.npz rewrite (sizes += increment, gens += [gen]) commits
    LAST — search reads only committed generations, so a crashed ingest's
    orphan files are invisible until a rebuild clears them.  Returns the
    number of vectors ingested."""
    ensure_shipped()
    index, sizes = load_ivf_store(store_dir)
    gens = _committed_gens(store_dir)
    present = {_file_gen(f) for f in os.listdir(store_dir)
               if f.startswith("list=") and f.endswith(".parquet")}
    gen = max(present | gens) + 1  # never renumber onto any existing run
    index_ref = ray.put(index)
    sdir = store_dir

    def write_block(t: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        inst = ray.get(index_ref)
        lists = inst.assign(table_to_matrix(t))
        order = np.argsort(lists, kind="mergesort")
        t = t.take(pa.array(order, pa.int64()))
        lists = lists[order]
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        out_l, out_n = [], []
        starts, ends = run_boundaries(lists)
        for s, e in zip(starts.tolist(), ends.tolist()):
            lid = int(lists[s])
            # atomic publish (duplicate-task truncation guard, see fpstore)
            final = os.path.join(
                sdir, f"list={lid}-g{gen}-{int(ids[s:e].min())}.parquet")
            tmp = f"{final}.tmp-{os.getpid()}-{os.urandom(4).hex()}"
            pq.write_table(t.slice(s, e - s).select(["vec_id", "embedding"]), tmp)
            os.replace(tmp, final)
            out_l.append(lid)
            out_n.append(e - s)
        return pa.table({"list_id": pa.array(out_l, pa.int32()),
                         "n": pa.array(out_n, pa.int64())})

    manifest = emb.map_batches(write_block, batch_format="pyarrow").to_pandas()
    added = 0
    if "list_id" in manifest.columns and len(manifest):
        counts = manifest.groupby("list_id")["n"].sum()
        sizes = sizes.copy()
        sizes[counts.index.to_numpy()] += counts.to_numpy()
        added = int(counts.sum())
    _write_marker(store_dir, centroids=index.centroids, sizes=sizes,
                  gens=np.array(sorted(gens | {gen}), np.int64))
    return added


def search_ivf_store(store_dir: str, queries: np.ndarray, k: int = 5,
                     nprobe: int = 4) -> pa.Table:
    """Top-k cosine over ONLY the probed lists' files."""
    ensure_shipped()
    index, _sizes = load_ivf_store(store_dir)
    probes = index.probe_lists(queries, nprobe)  # (nq, nprobe)
    wanted = sorted({int(x) for x in probes.reshape(-1)})
    gens = _committed_gens(store_dir)
    # prune twice: only probed lists, only COMMITTED generations (a crashed
    # ingest's orphan files must stay invisible)
    files = sorted(
        os.path.join(store_dir, f)
        for f in os.listdir(store_dir)
        if f.startswith("list=") and f.endswith(".parquet")
        and int(f.split("=", 1)[1].split("-", 1)[0]) in wanted
        and _file_gen(f) in gens
    )
    qn = _normalize(queries)
    payload_ref = ray.put((qn, probes))
    index_ref = ray.put(index)

    class _StoreProbe:
        """Identical scoring to docs._IvfProbe, but rows arrive pre-pruned
        (only probed lists were read), so `assign` re-derives the row's
        list for the per-query probe mask."""

        def __init__(self, iref, pref, k: int):
            self.index = ray.get(iref)
            self.qn, self.probes = ray.get(pref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = table_to_matrix(batch)
            lists = self.index.assign(m)
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            mn = _normalize(m)
            out_q, out_id, out_sim = [], [], []
            for qi in range(self.probes.shape[0]):
                sel = np.isin(lists, self.probes[qi])
                if not sel.any():
                    continue
                sims = self.qn[qi] @ mn[sel].T
                sub_ids = ids[sel]
                kk = min(self.k, len(sub_ids))
                order = np.lexsort((sub_ids, -sims))[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(sub_ids[order].tolist())
                out_sim.extend(sims[order].astype(np.float64).tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int32()),
                    "vec_id": pa.array(out_id, pa.int64()),
                    "sim": pa.array(out_sim, pa.float64()),
                }
            )

    from monocator_ray.stages.grouped import cached_stage

    local = rd.read_parquet(files).map_batches(
        cached_stage(_StoreProbe, iref=index_ref, pref=payload_ref, k=k),
        batch_format="pyarrow", batch_size=4096,
    )
    merged = collect_arrow(local)
    return global_topk(merged, k).select(["query_id", "vec_id", "rank"])
