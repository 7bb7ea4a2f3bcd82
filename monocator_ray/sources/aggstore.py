"""Persistent mergeable-aggregate store: incremental MATERIALIZED VIEW
maintenance for decomposable aggregates (sum / count / min / max).

The one-shot queries recompute their aggregate from the whole corpus; a
continuously-ingesting pipeline instead keeps the VIEW's partials on disk
and folds each increment in — O(increment) work per refresh instead of
O(corpus), the classic partial-aggregate maintenance argument (and the
same per-batch-partials shape grouped.driver_grouped_agg streams through,
here persisted between runs).

Layout under ``store_dir``: one ``run=<gen>.parquet`` partial table per
ingested increment, committed ATOMICALLY via temp-file + ``os.replace``
(a crashed ingest leaves no visible generation).  ``read_merged`` folds
all generations — the merge is the same combine the per-batch partials
used, so (ingest A; ingest B; read) == one-shot over A ∪ B exactly for
integer-count partials.
"""

from __future__ import annotations

import json
import os
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from monocator_ray.shipping import ensure_shipped
from monocator_ray.stages.grouped import driver_grouped_agg
from monocator_ray.sources.storelock import locked_writer

# fold rule per non-key column, by name prefix convention
_FOLDS = {"n_": "sum", "total_": "sum", "sum_": "sum", "max_": "max", "min_": "min",
          "hll_": "hll"}


def _fold_of(col: str) -> str:
    for prefix, how in _FOLDS.items():
        if col.startswith(prefix):
            return how
    raise ValueError(f"column {col!r} has no fold rule (prefix one of {list(_FOLDS)})")


@locked_writer
def ingest_partials(ds: rd.Dataset, store_dir: str, key_cols: list[str],
                    aggs: list[tuple], names: list[str],
                    txn: str | None = None) -> pd.DataFrame:
    """Aggregate one increment (driver_grouped_agg semantics: the RESULT is
    O(groups)) and append it as a new committed generation.  Returns the
    increment's partial table.

    ``txn`` is an optional CLIENT transaction token carried in the
    committed file's parquet footer metadata — atomic with the data by
    construction, so ``committed_txns`` can answer "did this increment
    land?" after any crash.  Counts are NOT idempotent, so exactly-once
    re-drivers (sources/watch.py) MUST check the token before
    re-ingesting; a duplicate token raises."""
    ensure_shipped()
    os.makedirs(store_dir, exist_ok=True)
    if txn is not None and txn in committed_txns(store_dir):
        raise ValueError(f"txn {txn!r} already committed to {store_dir!r}")
    part = driver_grouped_agg(ds, key_cols, aggs, names)
    gens = [_gen_of(f) for f in os.listdir(store_dir)
            if f.endswith(".parquet") and (f.startswith("run=") or f.startswith("base="))]
    gen = max(gens) + 1 if gens else 0
    fd, tmp = tempfile.mkstemp(dir=store_dir, suffix=".tmp")
    os.close(fd)
    t = pa.Table.from_pandas(part, preserve_index=False)
    if txn is not None:
        t = t.replace_schema_metadata({_TXN_META_KEY: json.dumps([txn])})
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(store_dir, f"run={gen}.parquet"))  # commit
    return part


_TXN_META_KEY = b"monocator.txns"


def _txns_of_file(path: str) -> set[str]:
    meta = pq.read_schema(path).metadata or {}
    raw = meta.get(_TXN_META_KEY)
    return set(json.loads(raw)) if raw else set()


def committed_txns(store_dir: str) -> set[str]:
    """Union of the txn tokens carried by every LIVE generation (footer
    metadata reads only — no data pages touched).  Compaction unions the
    folded generations' tokens into the base, so the answer survives it."""
    if not os.path.isdir(store_dir):
        return set()
    out: set[str] = set()
    for f in _live_files(store_dir):
        out |= _txns_of_file(f)
    return out


def _gen_of(fname: str) -> int:
    return int(fname.split("=", 1)[1][:-8])


def _live_files(store_dir: str) -> list[str]:
    """The LSM view: the NEWEST base (a full compaction, gen B) plus every
    run with gen > B.  Runs <= B are superseded the instant the base's
    atomic rename lands, so a compaction crash that never unlinked them
    cannot double-count."""
    runs, bases = [], []
    for f in os.listdir(store_dir):
        if not f.endswith(".parquet"):
            continue
        if f.startswith("run="):
            runs.append(f)
        elif f.startswith("base="):
            bases.append(f)
    live: list[str] = []
    b = -1
    if bases:
        newest = max(bases, key=_gen_of)
        b = _gen_of(newest)
        live.append(newest)
    live.extend(f for f in runs if _gen_of(f) > b)
    return sorted(os.path.join(store_dir, f) for f in live)


def _fold_files(files: list[str], key_cols: list[str]) -> pd.DataFrame:
    frames = [pq.read_table(f).to_pandas() for f in files]
    allp = pd.concat(frames, ignore_index=True)
    how = {c: (_merge_hll_blobs if _fold_of(c) == "hll" else _fold_of(c))
           for c in allp.columns if c not in key_cols}
    out = allp.groupby(key_cols, as_index=False).agg(how)
    return out.sort_values(key_cols).reset_index(drop=True)


def read_merged(store_dir: str, key_cols: list[str]) -> pd.DataFrame:
    """Fold every committed generation into the current view (sorted by
    key).  Fold rules come from the column-name convention (_FOLDS)."""
    files = _live_files(store_dir)
    if not files:
        raise FileNotFoundError(
            f"aggstore {store_dir!r} has no committed generations "
            "(view read before its first refresh?)"
        )
    return _fold_files(files, key_cols)


@locked_writer
def compact(store_dir: str, key_cols: list[str]) -> int:
    """Fold all live generations into ONE ``base=<G>.parquet`` (G = the
    newest live gen) — the aggstore analog of fpstore's LSM compaction,
    bounding read fan-in after many increments.  Commit is the base's
    atomic rename; superseded runs are unlinked best-effort afterwards (a
    crash between the two leaves them visible on disk but DEAD to
    ``_live_files``'s gen rule).  Returns the compacted group count."""
    live = _live_files(store_dir)
    if not live:
        raise FileNotFoundError(f"aggstore {store_dir!r} has nothing to compact")
    # fold EXACTLY the live list captured above — re-listing the directory
    # here would fold a concurrently-committed run into the base while the
    # gen rule also keeps that run live -> double count (code-review
    # r3-closing-2 finding #4)
    merged = _fold_files(live, key_cols)
    g = max(_gen_of(os.path.basename(f)) for f in live)
    # carry the folded generations' txn tokens into the base: the
    # exactly-once recovery check (committed_txns) must survive compaction
    txns = set()
    for f in live:
        txns |= _txns_of_file(f)
    fd, tmp = tempfile.mkstemp(dir=store_dir, suffix=".tmp")
    os.close(fd)
    t = pa.Table.from_pandas(merged, preserve_index=False)
    if txns:
        t = t.replace_schema_metadata({_TXN_META_KEY: json.dumps(sorted(txns))})
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(store_dir, f"base={g}.parquet"))  # commit
    # best-effort cleanup: EVERYTHING superseded by the new base — runs and
    # bases with gen <= g, including garbage a crashed earlier cleanup left
    # (finding #6); leftovers are dead by the gen rule either way
    for name in os.listdir(store_dir):
        if not name.endswith(".parquet") or name == f"base={g}.parquet":
            continue
        if (name.startswith("run=") or name.startswith("base=")) and _gen_of(name) <= g:
            try:
                os.unlink(os.path.join(store_dir, name))
            except OSError:
                pass
    return len(merged)


# ---- sketch-valued view columns: HLL blobs folded by register max ----
# ``hll_``-prefixed columns hold serialized HLL sketches (state/hll.py
# dumps(): 1 p-byte + 2^p registers).  Their fold is the HLL merge —
# elementwise register max — which is associative/commutative/idempotent,
# so (ingest A; ingest B; read) is REGISTER-IDENTICAL to one-shot over
# A ∪ B (stronger than the estimate agreeing: the bytes are equal).

def _merge_hll_blobs(blobs) -> bytes:
    import numpy as np

    it = [b for b in blobs if b is not None]
    if not it:
        return b""
    p = it[0][0]
    regs = np.zeros(1 << p, dtype=np.uint8)
    for b in it:
        assert b[0] == p, "mixed HLL precisions in one view column"
        np.maximum(regs, np.frombuffer(b[1:], dtype=np.uint8), out=regs)
    return bytes([p]) + regs.tobytes()


@locked_writer
def ingest_hll_partials(ds: rd.Dataset, store_dir: str, key_cols: list[str],
                        hash_col: str, out_col: str, p: int = 12) -> pd.DataFrame:
    """Aggregate one increment into per-group HLL sketch blobs and append
    it as a committed generation (the sketch analog of
    :func:`ingest_partials` — distinct-count views whose exact form would
    need the full key set per group).  ``hash_col`` must be uint64/int64
    pre-hashed values (hash once at the source, the q_hll_user_counts
    discipline); ``out_col`` must carry the ``hll_`` prefix so
    ``read_merged`` folds it by register max.  Per-batch partial rows are
    O(groups) x (2^p + 1) bytes — the broadcastable-vertex-state bound
    (4 KB/group at p=12)."""
    import numpy as np

    from monocator_ray.state.hll import HLL

    if not out_col.startswith("hll_"):
        raise ValueError("sketch view columns must be 'hll_'-prefixed")
    ensure_shipped()
    os.makedirs(store_dir, exist_ok=True)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as _pd

        keys = t.select(key_cols).to_pandas()
        h = t[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_keys, out_blobs = [], []
        grouped = _pd.DataFrame({**{k: keys[k] for k in key_cols},
                                 "_h": h}).groupby(key_cols, sort=False)
        for gk, sub in grouped:
            sk = HLL(p)
            sk.add_hashes(sub["_h"].to_numpy(np.uint64))
            out_keys.append(gk if isinstance(gk, tuple) else (gk,))
            out_blobs.append(sk.dumps())
        cols = {k: pa.array([ok[i] for ok in out_keys])
                for i, k in enumerate(key_cols)}
        cols[out_col] = pa.array(out_blobs, pa.binary())
        return pa.table(cols)

    pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()  # bounded: O(blocks x groups) sketch partials (4KB each)
    part = (pdf.groupby(key_cols, as_index=False)
            .agg({out_col: _merge_hll_blobs}))
    gens = [_gen_of(f) for f in os.listdir(store_dir)
            if f.endswith(".parquet") and (f.startswith("run=") or f.startswith("base="))]
    gen = max(gens) + 1 if gens else 0
    fd, tmp = tempfile.mkstemp(dir=store_dir, suffix=".tmp")
    os.close(fd)
    pq.write_table(pa.Table.from_pandas(part, preserve_index=False), tmp)
    os.replace(tmp, os.path.join(store_dir, f"run={gen}.parquet"))  # commit
    return part
