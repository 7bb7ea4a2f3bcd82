"""Exactly-once incremental ingestion driver: tail a landing directory of
parquet drops into a persistent store, surviving a crash at ANY point
without double-counting — the piece that turns the incremental stores
(aggstore / fpstore / invstore / annstore) into a continuously-refreshed
pipeline.

The correctness problem: store ingests commit atomically (generation
file rename), but a driver that crashes BETWEEN the store commit and its
own bookkeeping write would re-ingest the same files on restart — and
aggregate counts are not idempotent.  The fix is the classic
transactional-sink token: each ingest batch carries a deterministic
``txn`` token (content hash of the sorted file identities) that the
store commits ATOMICALLY WITH the data (parquet footer metadata —
``aggstore.ingest_partials(txn=)``), so on restart the driver asks the
STORE ``committed_txns()`` before trusting its own ledger:

* crash before the store commit  -> token absent  -> re-ingest (safe,
  nothing landed);
* crash after the store commit but before the ledger write -> token
  PRESENT -> skip the ingest, just finalize the ledger;
* compaction folds tokens into the base, so recovery works forever.

The ledger (``_ingest_ledger.json`` beside the store, atomic tmp+rename)
is therefore only an optimization — correctness never depends on it.

``watch_ingest_aggstore`` processes everything new in one pass and
returns (the testable / cron-able shape); a deployment loops it.  File
identity is (name, size, mtime_ns) — rewriting a dropped file re-queues
it, which is the right behavior for a landing zone."""

from __future__ import annotations

import hashlib
import json
import os

import ray.data as rd

from monocator_ray.shipping import ensure_shipped

_LEDGER = "_ingest_ledger.json"


def _file_identity(path: str) -> str:
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"


def _ledger_path(store_dir: str) -> str:
    return os.path.join(store_dir, _LEDGER)


def read_ledger(store_dir: str) -> dict[str, str]:
    p = _ledger_path(store_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _write_ledger(store_dir: str, ledger: dict[str, str]) -> None:
    p = _ledger_path(store_dir)
    tmp = p + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(ledger, f, indent=0, sort_keys=True)
    os.replace(tmp, p)


def discover_new_files(data_dir: str, store_dir: str) -> list[str]:
    """Parquet drops in ``data_dir`` whose (name, size, mtime) identity is
    not yet in the ledger, sorted by name for a deterministic batch."""
    ledger = read_ledger(store_dir)
    out = []
    for n in sorted(os.listdir(data_dir)):
        if not n.endswith(".parquet") or n.startswith("."):
            continue
        full = os.path.join(data_dir, n)
        if ledger.get(n) != _file_identity(full):
            out.append(full)
    return out


def file_txn(path: str) -> str:
    """Deterministic token for ONE drop: hash of its (name, size, mtime)
    identity — a rewritten file maps to a new token.  Tokens are PER FILE
    (each drop ingests as its own generation) so crash recovery never
    depends on how a batch happened to be grouped: whatever subset a
    crashed run committed is individually visible to ``committed_txns``."""
    h = hashlib.blake2b(digest_size=16)
    h.update(_file_identity(path).encode())
    return h.hexdigest()


def watch_ingest_aggstore(data_dir: str, store_dir: str,
                          key_cols: list[str], aggs: list[tuple],
                          names: list[str]) -> dict:
    """One exactly-once refresh pass: discover new drops, ingest each as
    its own aggstore generation carrying the file's txn token, finalize
    the ledger after each file.  Returns {"files": n, "skipped": k}.

    Crash-safe per the module docstring: a file whose token is already in
    ``committed_txns`` (a previous run crashed after its store commit but
    before the ledger write) is SKIPPED — only its ledger entry is
    finalized.  Compaction cost of one-generation-per-file is bounded by
    ``aggstore.compact``."""
    from monocator_ray.sources.aggstore import committed_txns, ingest_partials

    ensure_shipped()
    files = discover_new_files(data_dir, store_dir)
    if not files:
        return {"files": 0, "skipped": 0}
    done = committed_txns(store_dir)
    n_skipped = 0
    for f in files:
        txn = file_txn(f)
        if txn in done:
            n_skipped += 1
        else:
            ingest_partials(rd.read_parquet(f), store_dir,
                            key_cols, aggs, names, txn=txn)
        ledger = read_ledger(store_dir)
        ledger[os.path.basename(f)] = _file_identity(f)
        _write_ledger(store_dir, ledger)
    return {"files": len(files), "skipped": n_skipped}
