"""Exactly-once watch ingestion (sources/watch.py + aggstore txn tokens):
incremental == one-shot, crash-window recovery (store committed, ledger
lost), compaction-surviving tokens, rewritten-file re-queue."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from monocator_ray.sources.aggstore import (
    committed_txns,
    compact,
    ingest_partials,
    read_merged,
)
from monocator_ray.sources.watch import (
    discover_new_files,
    file_txn,
    read_ledger,
    watch_ingest_aggstore,
)

KEYS = ["k"]
AGGS = [("v", "sum"), ("v", "count")]
NAMES = ["k", "sum_v", "n_rows"]


def _drop(data_dir, name, ks, vs):
    pq.write_table(pa.table({"k": pa.array(ks, pa.string()),
                             "v": pa.array(vs, pa.int64())}),
                   os.path.join(data_dir, name))


def _view(store):
    return read_merged(store, KEYS).set_index("k")["sum_v"].to_dict()


@pytest.fixture()
def dirs(tmp_path):
    d = tmp_path / "landing"
    s = tmp_path / "store"
    d.mkdir()
    return str(d), str(s)


def test_incremental_equals_oneshot(dirs, ray_session):
    data, store = dirs
    _drop(data, "a.parquet", ["x", "y"], [1, 2])
    r1 = watch_ingest_aggstore(data, store, KEYS, AGGS, NAMES)
    assert r1["files"] == 1 and not r1["skipped"]
    _drop(data, "b.parquet", ["x", "z"], [10, 5])
    r2 = watch_ingest_aggstore(data, store, KEYS, AGGS, NAMES)
    assert r2["files"] == 1 and not r2["skipped"]
    assert _view(store) == {"x": 11, "y": 2, "z": 5}
    # nothing new -> no-op
    r3 = watch_ingest_aggstore(data, store, KEYS, AGGS, NAMES)
    assert r3["files"] == 0


def test_crash_after_store_commit_before_ledger(dirs, ray_session):
    """The dangerous window: the store generation landed but the ledger
    write was lost.  The rerun must SKIP the ingest (token present) and
    only finalize the ledger — counts stay exactly-once."""
    import ray.data as rd

    data, store = dirs
    _drop(data, "a.parquet", ["x"], [7])
    files = discover_new_files(data, store)
    txn = file_txn(files[0])
    # simulate the crashed run: store commit happened, ledger never written
    ingest_partials(rd.read_parquet(files), store, KEYS, AGGS, NAMES, txn=txn)
    assert read_ledger(store) == {}
    r = watch_ingest_aggstore(data, store, KEYS, AGGS, NAMES)
    assert r["skipped"] == 1
    assert _view(store) == {"x": 7}  # ONE ingest, not two
    assert read_ledger(store) != {}


def test_duplicate_txn_rejected_by_store(dirs, ray_session):
    import ray.data as rd

    data, store = dirs
    _drop(data, "a.parquet", ["x"], [1])
    files = discover_new_files(data, store)
    txn = file_txn(files[0])
    ingest_partials(rd.read_parquet(files), store, KEYS, AGGS, NAMES, txn=txn)
    with pytest.raises(ValueError, match="already committed"):
        ingest_partials(rd.read_parquet(files), store, KEYS, AGGS, NAMES,
                        txn=txn)


def test_tokens_survive_compaction(dirs, ray_session):
    data, store = dirs
    _drop(data, "a.parquet", ["x"], [1])
    watch_ingest_aggstore(data, store, KEYS, AGGS, NAMES)
    _drop(data, "b.parquet", ["y"], [2])
    watch_ingest_aggstore(data, store, KEYS, AGGS, NAMES)
    toks = committed_txns(store)
    assert len(toks) == 2
    compact(store, KEYS)
    assert committed_txns(store) == toks  # base carries the union
    # recovery after compaction: a lost-ledger rerun still skips
    os.remove(os.path.join(store, "_ingest_ledger.json"))
    r = watch_ingest_aggstore(data, store, KEYS, AGGS, NAMES)
    assert r["skipped"] == 2
    assert _view(store) == {"x": 1, "y": 2}


def test_rewritten_file_requeues(dirs, ray_session):
    data, store = dirs
    _drop(data, "a.parquet", ["x"], [1])
    watch_ingest_aggstore(data, store, KEYS, AGGS, NAMES)
    # rewrite the drop with different content (mtime/size change)
    os.utime(os.path.join(data, "a.parquet"), ns=(1, 1))
    _drop(data, "a.parquet", ["x"], [100])
    r = watch_ingest_aggstore(data, store, KEYS, AGGS, NAMES)
    assert r["files"] == 1 and not r["skipped"]
    assert _view(store) == {"x": 101}
