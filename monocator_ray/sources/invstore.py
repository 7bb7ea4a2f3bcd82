"""Persistent inverted-index store: build once, serve keyword queries with
PRUNED reads — the search-serving member of the incremental-store family
(``fpstore`` membership, ``aggstore`` views, ``annstore`` vectors; this one
is postings).  ``q_keyword_search`` re-tokenizes the whole corpus per query;
a store amortizes that one pass and lets every query read ONLY the postings
buckets its terms hash into.

Layout under ``store_dir``:

* ``bucket=<id>-g<gen>-<blockkey>.parquet`` — postings rows ``(term,
  doc_id, tf)`` for terms hashing into bucket ``id`` (SipHash-pinned
  ``hash_str64 % num_buckets``), sorted by ``(term, doc_id)`` inside each
  file so the parquet term-column min/max statistics prune row groups on
  read.  Multiple files per bucket are normal (one per contributing input
  block per ingest generation; the block's min doc_id keys the name, so
  concurrent writers never collide).  Postings are immutable and additive,
  which is what makes :func:`ingest_inverted_store` a pure append.
* ``meta.json`` — ``n_docs`` (for the integer idf weight) + ``num_buckets``,
  written LAST as the success marker (manifest-last discipline shared with
  clustered.py / annstore.py).

Scale shape: the build is ONE streaming tokenize pass (tokens become
(term, doc_id, tf) partials inside the batch — the corpus text never
shuffles; only the much smaller postings do, partitioned by term hash).  A
query for |Q| terms reads at most ``|Q| / num_buckets`` of the postings
bytes, scores per doc inside doc-hash partitions and merges O(parts x k)
rows on the driver — the same tail as q_keyword_search, minus the corpus
scan.  Results are identical to the scan-path query by construction (same
tokenizer, same integer weight, same tie rule); the registry pins both to
one SQL oracle.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from monocator_ray.hashing import hash_str64
from monocator_ray.shipping import ensure_shipped
from monocator_ray.sources.storelock import locked_writer


@locked_writer
def build_inverted_store(docs: rd.Dataset, store_dir: str,
                         num_buckets: int = 64) -> int:
    """Tokenize ``docs`` (columns doc_id, text) into per-bucket postings
    files.  Returns n_docs.  Clears any prior/partial build first (file
    names depend on block splits — annstore.py rationale)."""
    ensure_shipped()
    os.makedirs(store_dir, exist_ok=True)
    for f in os.listdir(store_dir):
        if f.startswith("bucket=") or f == "meta.json":
            os.remove(os.path.join(store_dir, f))
    return _ingest(docs, store_dir, num_buckets, gen=0, prev_docs=0)


@locked_writer
def ingest_inverted_store(docs: rd.Dataset, store_dir: str) -> int:
    """APPEND a document increment to an existing store — the fpstore-style
    incremental path.  Postings files are immutable and additive (search
    unions every file of a probed bucket, and df/tf merge by summation), so
    an increment is just new ``bucket=<id>-g<gen>-...`` files plus a
    meta.json rewrite LAST (a crashed ingest leaves the old meta counting
    only committed generations; its orphan files are cleared by the next
    full build).  Generation numbering by MAX existing run index — the
    fpstore lesson: a gap must never renumber onto a committed run.
    Returns the new total n_docs."""
    ensure_shipped()
    with open(os.path.join(store_dir, "meta.json")) as fh:
        meta = json.load(fh)
    present = [
        _bucket_file_gen(f)
        for f in os.listdir(store_dir)
        if f.startswith("bucket=") and f.endswith(".parquet")
    ]
    committed = sorted(_committed_gens(store_dir, meta))
    # never renumber onto ANY existing run, committed or orphan
    return _ingest(docs, store_dir, meta["num_buckets"],
                   gen=max(present + committed) + 1,
                   prev_docs=meta["n_docs"])


def _bucket_file_gen(fname: str) -> int:
    """bucket=<id>-g<gen>-<blockkey>.parquet -> gen."""
    return int(fname.split("-g")[1].split("-")[0]) if "-g" in fname else 0


def _committed_gens(store_dir: str, meta: dict) -> set[int]:
    """Committed generations.  A meta without a 'gens' key predates the
    committed-gens discipline, when EVERY present file was live — treat
    all present generations as committed (defaulting to {0} would drop,
    and compaction would then DELETE, that store's increments —
    code-review r3-closing-2 finding #1)."""
    if "gens" in meta:
        return set(meta["gens"])
    return {
        _bucket_file_gen(f) for f in os.listdir(store_dir)
        if f.startswith("bucket=") and f.endswith(".parquet")
    } or {0}


def _write_meta(store_dir: str, meta: dict) -> None:
    """Atomic meta commit: a crash DURING an in-place rewrite would leave
    a truncated meta.json and an unreadable store (finding #3) — write a
    temp file and os.replace it."""
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=store_dir, suffix=".metatmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(store_dir, "meta.json"))


def _ingest(docs: rd.Dataset, store_dir: str, num_buckets: int,
            gen: int, prev_docs: int) -> int:
    from monocator_ray.stages.textstats import _WS_SPLIT

    sdir = store_dir
    nb = num_buckets

    def write_block(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_doc, out_term, out_tf = [], [], []
        for i, s in enumerate(t["text"].to_pylist()):
            if not s:
                continue
            arr = np.array(_WS_SPLIT.split(s.strip(" ")), dtype=object)
            vals, counts = np.unique(arr, return_counts=True)
            out_term.append(vals)
            out_tf.append(counts.astype(np.int64))
            out_doc.append(np.full(len(vals), ids[i], dtype=np.int64))
        if not out_doc:
            # an all-empty-text block still CONTAINS docs: n_docs feeds the
            # idf weight and must match the oracle's COUNT(*) FROM documents
            # (code-review r3-closing finding #1)
            return pa.table({"n": pa.array([len(ids)], pa.int64())})
        term = np.concatenate(out_term)
        doc = np.concatenate(out_doc)
        tf = np.concatenate(out_tf)
        bucket = (hash_str64(term) % np.uint64(nb)).astype(np.int64)
        # sort by (bucket, term, doc) once; bucket runs slice out of it
        order = np.lexsort((doc, term, bucket))
        term, doc, tf, bucket = term[order], doc[order], tf[order], bucket[order]
        starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        ends = np.r_[starts[1:], len(bucket)]
        blockkey = int(doc.min())
        for s, e in zip(starts.tolist(), ends.tolist()):
            part = pa.table({
                "term": pa.array(term[s:e], pa.string()),
                "doc_id": pa.array(doc[s:e], pa.int64()),
                "tf": pa.array(tf[s:e], pa.int64()),
            })
            # atomic publish: a duplicate/straggler execution of this map
            # task after the meta commit would otherwise truncate a LIVE
            # file under a concurrent reader (the fpstore 0-byte flake)
            final = os.path.join(sdir, f"bucket={bucket[s]}-g{gen}-{blockkey}.parquet")
            tmp = f"{final}.tmp-{os.getpid()}-{os.urandom(4).hex()}"
            pq.write_table(part, tmp)
            os.replace(tmp, final)
        return pa.table({"n": pa.array([len(ids)], pa.int64())})

    counts = docs.map_batches(write_block, batch_format="pyarrow").to_pandas()
    # empty increment -> degraded schema-less frame (the zero-column class)
    n_docs = prev_docs + (int(counts["n"].sum()) if "n" in counts.columns else 0)
    # success marker LAST: a crashed build leaves no meta.json (or, on
    # ingest, the previous meta, whose committed-gens list keeps the
    # orphan generation's files INVISIBLE to search — the annstore rule)
    prev_gens: set[int] = set()
    if gen > 0:
        with open(os.path.join(store_dir, "meta.json")) as fh:
            prev_gens = _committed_gens(store_dir, json.load(fh)) - {gen}
    _write_meta(store_dir, {"n_docs": n_docs, "num_buckets": num_buckets,
                            "gens": sorted(prev_gens | {gen})})
    return n_docs


def search_inverted_store(store_dir: str, terms: tuple[str, ...],
                          k: int = 20) -> pa.Table:
    """Top-``k`` docs by ``sum_t tf * (n_docs // df(t))`` over ``terms``,
    reading ONLY the postings buckets the query terms hash into."""
    from monocator_ray.stages.grouped import (
        driver_grouped_agg, hash_partitioned, run_boundaries,
    )

    ensure_shipped()
    with open(os.path.join(store_dir, "meta.json")) as fh:
        meta = json.load(fh)
    n_docs, nb = meta["n_docs"], meta["num_buckets"]
    gens = _committed_gens(store_dir, meta)
    want = set(
        (hash_str64(np.array(list(terms), dtype=object)) % np.uint64(nb))
        .astype(np.int64).tolist()
    )
    # prune twice: only the query terms' buckets, only COMMITTED
    # generations (a crashed ingest's orphan files stay invisible)
    files = [
        os.path.join(store_dir, f)
        for f in sorted(os.listdir(store_dir))
        if f.startswith("bucket=") and f.endswith(".parquet")
        and int(f.split("=")[1].split("-")[0]) in want
        and _bucket_file_gen(f) in gens
    ]
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.int64())})
    if not files:
        return empty
    # row-group pruning: files are term-sorted, so the term IN filter skips
    # row groups whose min/max statistics exclude every query term.
    # materialize: TWO consumers follow (df pass + scoring pass) and a lazy
    # Dataset would re-read and re-filter every probed file per consumer
    # (code-review r3-closing finding #7; the filtered postings are tiny)
    postings = rd.read_parquet(
        files, filter=pc.field("term").isin(list(terms))
    ).materialize()
    dfc = driver_grouped_agg(postings, ["term"], [("doc_id", "count")],
                             ["term", "df"])
    if not len(dfc):
        return empty
    weight = {t_: n_docs // int(d) for t_, d in zip(dfc["term"], dfc["df"])}

    def score_part(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        tf = t["tf"].to_numpy(zero_copy_only=False)
        w = pd.Series(t["term"].to_pandas()).map(weight).to_numpy(np.int64)
        order = np.argsort(did, kind="mergesort")
        did, contrib = did[order], (tf * w)[order]
        starts, ends = run_boundaries(did)
        cum = np.concatenate([[0], np.cumsum(contrib)])
        score = cum[ends] - cum[starts]
        top = np.lexsort((did[starts], -score))[:k]
        return pa.table({"doc_id": pa.array(did[starts][top], pa.int64()),
                         "score": pa.array(score[top], pa.int64())})

    local = hash_partitioned(
        postings,
        lambda t: [t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)],
        score_part,
        num_parts=16,
    ).to_pandas()
    if "score" not in local.columns:
        return empty
    out = (
        local.sort_values(["score", "doc_id"], ascending=[False, True],
                          kind="mergesort")
        .head(k).reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


@locked_writer
def compact_inverted_store(store_dir: str) -> int:
    """Merge each bucket's live generation files into ONE term-sorted file
    at a fresh generation, committed by the meta.json rewrite (gens=[G])
    — the LSM full compaction the fpstore/aggstore/annstore siblings have.
    Postings are additive, so the merge is a concat + (term, doc_id) sort
    + tf sum; a crash before the meta rewrite leaves only dead orphan
    files.  Returns the number of live postings files after compaction."""
    with open(os.path.join(store_dir, "meta.json")) as fh:
        meta = json.load(fh)
    gens = _committed_gens(store_dir, meta)
    present = [_bucket_file_gen(f) for f in os.listdir(store_dir)
               if f.startswith("bucket=") and f.endswith(".parquet")]
    g = max(present + sorted(gens)) + 1
    by_bucket: dict[int, list[str]] = {}
    for f in os.listdir(store_dir):
        if (f.startswith("bucket=") and f.endswith(".parquet")
                and _bucket_file_gen(f) in gens):
            by_bucket.setdefault(int(f.split("=")[1].split("-")[0]), []).append(f)
    written = 0
    for bid, fnames in sorted(by_bucket.items()):
        tables = [pq.read_table(os.path.join(store_dir, f)) for f in fnames]
        t = pa.concat_tables(tables)
        # concat generations and restore the term-sorted layout the
        # row-group pruning relies on; the group_by is a no-op under the
        # ingest contract (doc_ids disjoint across increments, like
        # fpstore) and guards the sum if that contract is ever violated
        merged = (t.group_by(["term", "doc_id"]).aggregate([("tf", "sum")])
                  .rename_columns(["term", "doc_id", "tf"])
                  .sort_by([("term", "ascending"), ("doc_id", "ascending")]))
        pq.write_table(merged, os.path.join(store_dir, f"bucket={bid}-g{g}-0.parquet"))
        written += 1
    # THE commit: only generation g is live from here on (atomic rename)
    _write_meta(store_dir, {"n_docs": meta["n_docs"],
                            "num_buckets": meta["num_buckets"], "gens": [g]})
    # best-effort cleanup: after the commit EVERYTHING but generation g is
    # dead — including crashed-ingest orphans from before the compaction
    for f in os.listdir(store_dir):
        if f.startswith("bucket=") and _bucket_file_gen(f) != g:
            try:
                os.unlink(os.path.join(store_dir, f))
            except OSError:
                pass
    return written
