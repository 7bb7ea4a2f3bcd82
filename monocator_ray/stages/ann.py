"""Similarity search over an embedding column (task brief).

* ``BruteForceTopK`` — baseline: per-batch numpy matmul against a broadcast
  query matrix (``ray.put`` once, ``ray.get`` in actor ``__init__``), emit
  per-batch local top-k, then a tiny global top-k reduce.  Exact.
* ``lsh_bucket_topk`` — scale path: random-hyperplane LSH buckets
  (sign-bit codes) so candidate generation is a bucket groupby instead of a
  full scan; probes only matching buckets.  Approximate.

Embeddings ride as Arrow ``list<float>`` -> numpy 2-D via a zero-copy-ish
``np.stack`` on the flattened values (fixed width asserted).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def table_to_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float32)
    dim = len(flat) // n
    return flat.reshape(n, dim).astype(np.float32, copy=False)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches actor: local top-k of cosine(query, batch) per query."""

    def __init__(self, queries_ref, k: int = 5, id_col: str = "vec_id"):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float32))  # (nq, dim)
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(table_to_matrix(batch))  # (n, dim)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.q @ m.T  # (nq, n)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            sel = top[qi]
            out_q.extend([qi] * k)
            out_id.extend(ids[sel].tolist())
            out_sim.extend(sims[qi, sel].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )


def global_topk(local: pa.Table, k: int = 5) -> pa.Table:
    """Tiny driver-side reduce of per-batch local top-k tables."""
    df = local.to_pandas()
    df = df.sort_values(["query_id", "sim", "vec_id"], ascending=[True, False, True])
    out = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype(np.int32)
    return pa.Table.from_pandas(out, preserve_index=False)


class IvfIndex:
    """IVF scale path: k-means centroids (numpy Lloyd on a seeded sample),
    rows assigned to their nearest centroid; queries probe only the
    ``nprobe`` nearest lists.  Centroids are built once on the driver from a
    sample and broadcast; assignment is a vectorized map_batches; the probe
    is a per-list brute force — the standard inverted-file ANN layout."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _normalize(np.asarray(centroids, dtype=np.float32))

    @classmethod
    def train(cls, sample: np.ndarray, nlist: int = 16, iters: int = 10, seed: int = 13) -> "IvfIndex":
        rng = np.random.RandomState(seed)
        x = _normalize(np.asarray(sample, dtype=np.float32))
        cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
        for _ in range(iters):
            sims = x @ cent.T
            assign = sims.argmax(axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        cent[c] = v / n
        return cls(cent)

    def assign(self, m: np.ndarray) -> np.ndarray:
        return (_normalize(m) @ self.centroids.T).argmax(axis=1).astype(np.int32)

    def probe_lists(self, queries: np.ndarray, nprobe: int = 4) -> np.ndarray:
        sims = _normalize(queries) @ self.centroids.T
        return np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)


class IvfAssigner:
    """map_batches actor: adds the IVF list id per row (index broadcast via
    ray.put once, fetched in __init__)."""

    def __init__(self, index_ref):
        self.index = ray.get(index_ref) if not isinstance(index_ref, IvfIndex) else index_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = table_to_matrix(batch)
        return batch.append_column("ivf_list", pa.array(self.index.assign(m), pa.int32()))


class LshCoder:
    """map_batches actor: sign-bit LSH bucket code per row (scale path —
    bucket groupby replaces the full scan; same hyperplanes everywhere via
    seeded construction)."""

    def __init__(self, dim: int, nbits: int = 16, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, nbits)).astype(np.float32)

    def code(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = table_to_matrix(batch)
        return batch.append_column("lsh_bucket", pa.array(self.code(m), pa.int64()))


class KMeansPartial:
    """map_batches task for one distributed Lloyd iteration: assign each
    row to its nearest (cosine) broadcast centroid and emit the per-cluster
    PARTIAL (count, vector sum) — O(k x dim) out of every batch, so the
    driver's reduce is corpus-size-independent (the Pregel-aggregator shape
    pipelines/graph.py uses for rank vectors)."""

    def __init__(self, centroids_ref, id_col: str = "vec_id"):
        c = ray.get(centroids_ref) if not isinstance(centroids_ref, np.ndarray) else centroids_ref
        self.c = _normalize(np.asarray(c, dtype=np.float64))
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = table_to_matrix(batch).astype(np.float64)
        if not len(m):
            return pa.table({"cluster": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64()),
                             "vsum": pa.array([], pa.list_(pa.float64()))})
        assign = (_normalize(m) @ self.c.T).argmax(axis=1)
        k, dim = self.c.shape
        counts = np.bincount(assign, minlength=k).astype(np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        np.add.at(sums, assign, m)
        present = counts > 0
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int32)[present], pa.int32()),
                "n": pa.array(counts[present], pa.int64()),
                "vsum": pa.array(list(sums[present]), pa.list_(pa.float64())),
            }
        )


class PqIndex:
    """Product quantization (Jégou et al., PAMI'11 — public method): split
    the (L2-normalized) vector into ``m`` subspaces, k-means each subspace
    to ``2**nbits`` centroids, store each vector as ``m`` code bytes.  At
    100-TB scale the search scan reads ``m`` bytes/vector instead of
    ``4*dim`` (32x at dim=64, m=8) and scoring is table lookups — the
    memory-compression ANN path that complements IVF's candidate pruning.

    Cosine rendering: data and queries are normalized first; the
    asymmetric-distance (ADC) score is ``sum_j <q_j, c_{j, code_j}>``, the
    inner product of the query with the RECONSTRUCTED vector — exact for
    vectors equal to their reconstruction, approximate otherwise."""

    def __init__(self, codebooks: np.ndarray):
        self.codebooks = np.asarray(codebooks, dtype=np.float32)  # (m, ksub, dsub)
        self.m, self.ksub, self.dsub = self.codebooks.shape

    @classmethod
    def train(cls, sample: np.ndarray, m: int = 8, nbits: int = 4,
              iters: int = 10, seed: int = 17) -> "PqIndex":
        x = _normalize(np.asarray(sample, dtype=np.float32))
        n, dim = x.shape
        assert dim % m == 0, "dim must divide into m subspaces"
        dsub, ksub = dim // m, 1 << nbits
        rng = np.random.RandomState(seed)
        books = np.empty((m, ksub, dsub), dtype=np.float32)
        for j in range(m):
            xs = x[:, j * dsub:(j + 1) * dsub]
            cent = xs[rng.choice(n, size=min(ksub, n), replace=False)].copy()
            for _ in range(iters):
                d = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
                assign = d.argmin(axis=1)
                for c in range(len(cent)):
                    members = xs[assign == c]
                    if len(members):
                        cent[c] = members.mean(axis=0)
            books[j, :len(cent)] = cent
            if len(cent) < ksub:  # degenerate tiny sample: repeat centroids
                books[j, len(cent):] = cent[-1]
        return cls(books)

    def encode(self, x: np.ndarray) -> np.ndarray:
        """(n, dim) -> (n, m) uint8 codes (nearest subspace centroid)."""
        x = _normalize(np.asarray(x, dtype=np.float32))
        n = len(x)
        codes = np.empty((n, self.m), dtype=np.uint8)
        for j in range(self.m):
            xs = x[:, j * self.dsub:(j + 1) * self.dsub]
            d = ((xs[:, None, :] - self.codebooks[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d.argmin(axis=1).astype(np.uint8)
        return codes

    def adc_tables(self, queries: np.ndarray) -> np.ndarray:
        """(nq, dim) -> (nq, m, ksub) inner-product lookup tables."""
        q = _normalize(np.asarray(queries, dtype=np.float32))
        nq = len(q)
        t = np.empty((nq, self.m, self.ksub), dtype=np.float32)
        for j in range(self.m):
            t[:, j, :] = q[:, j * self.dsub:(j + 1) * self.dsub] @ self.codebooks[j].T
        return t


class PqEncoder:
    """map_batches task: (vec_id, embedding) -> (vec_id, code: m-byte
    binary).  The encoded dataset is what a PQ deployment stores and
    scans — embeddings are dropped right here."""

    def __init__(self, index_ref):
        self.index = ray.get(index_ref) if not isinstance(index_ref, PqIndex) else index_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = table_to_matrix(batch)
        codes = self.index.encode(m) if len(m) else np.empty((0, self.index.m), np.uint8)
        return pa.table(
            {"vec_id": batch["vec_id"],
             "code": pa.array([c.tobytes() for c in codes], pa.binary())}
        )


class PqScorer:
    """map_batches task over the ENCODED dataset: ADC-score every code row
    against the broadcast query tables, emit per-batch local top-k (the
    BruteForceTopK output contract, so global_topk finishes it)."""

    def __init__(self, tables_ref, m: int, k: int = 5):
        self.tables = ray.get(tables_ref) if not isinstance(tables_ref, np.ndarray) else tables_ref
        self.m = m
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        blob = b"".join(batch["code"].to_pylist())
        codes = np.frombuffer(blob, dtype=np.uint8).reshape(-1, self.m)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        nq = self.tables.shape[0]
        if len(codes) == 0:
            return pa.table({"query_id": pa.array([], pa.int32()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        j_idx = np.arange(self.m)
        out_q, out_id, out_sim = [], [], []
        k = min(self.k, len(codes))
        for qi in range(nq):
            sims = self.tables[qi][j_idx, codes].sum(axis=1)  # (n,)
            sel = np.argpartition(-sims, k - 1)[:k]
            out_q.extend([qi] * k)
            out_id.extend(ids[sel].tolist())
            out_sim.extend(sims[sel].astype(np.float64).tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int32()),
             "vec_id": pa.array(out_id, pa.int64()),
             "sim": pa.array(out_sim, pa.float64())}
        )


def quantize_ints(m: np.ndarray, scale: float = 1024.0) -> np.ndarray:
    """floor(double(x) * 1024) per component — the exact-arithmetic bridge
    that lets brute-force cosine top-k carry a *SQL oracle*: 1024 is a
    power of two, so the product is exact in IEEE double on every engine,
    floor of an exact product is deterministic, and the resulting int64
    dot products / norms (<= dims * |v|^2 * scale^2, far below 2^53) are
    representable exactly even through DuckDB's double-typed
    list_inner_product.  Both sides then evaluate the identical
    float(dot)/sqrt(float(qq)*float(dd)) expression — bit-identical sims,
    tolerance-free compare."""
    return np.floor(m.astype(np.float64) * scale).astype(np.int64)


class ExactIntTopK:
    """map_batches task stage: per-batch local cosine top-k per query over
    integer-quantized vectors (see quantize_ints).  Emits <= nq x k rows
    per batch (a combiner — the driver merge holds O(nq x blocks x k));
    optional `label` restricts candidates batch-side (filtered vector
    search: the predicate prunes BEFORE any dot product)."""

    def __init__(self, payload_ref, k: int = 5, label: int | None = None):
        payload = (
            ray.get(payload_ref) if isinstance(payload_ref, ray.ObjectRef)
            else payload_ref  # plain tuple path for Ray-free unit tests
        )
        self.qids, self.Q, self.qq = payload
        self.k = k
        self.label = label

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self.label is not None:
            batch = batch.filter(pc.equal(batch["label"], self.label))
        out_q, out_id, out_dot, out_dd = [], [], [], []
        if batch.num_rows:
            D = quantize_ints(table_to_matrix(batch))
            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            dot = D @ self.Q.T  # (n, nq) int64, exact
            dd = np.einsum("ij,ij->i", D, D)
            for qi in range(self.Q.shape[0]):
                s = dot[:, qi].astype(np.float64) / np.sqrt(
                    float(self.qq[qi]) * dd.astype(np.float64)
                )
                order = np.lexsort((ids, -s))
                order = order[ids[order] != self.qids[qi]][: self.k]
                out_q.extend([int(self.qids[qi])] * len(order))
                out_id.extend(ids[order].tolist())
                out_dot.extend(dot[order, qi].tolist())
                out_dd.extend(dd[order].tolist())
        return pa.table(
            {"query_id": pa.array(out_q, pa.int64()),
             "vec_id": pa.array(out_id, pa.int64()),
             "dot": pa.array(out_dot, pa.int64()),
             "dd": pa.array(out_dd, pa.int64())}
        )
