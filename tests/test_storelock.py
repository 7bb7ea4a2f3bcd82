"""Single-writer enforcement for the persistent-store family (ADVICE r3 #2):
concurrent ingests must serialize on the store's writer lock instead of
racing on the generation number + meta rewrite."""

import json
import os
import threading
import time

import pyarrow as pa
import pytest

import ray.data as rd

from monocator_ray.sources.invstore import (
    build_inverted_store, ingest_inverted_store, search_inverted_store,
)
from monocator_ray.sources.storelock import store_writer_lock


def _docs(ids, texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


@pytest.mark.usefixtures("ray_session")
def test_ingest_blocks_while_writer_lock_held(tmp_path):
    store = str(tmp_path / "inv")
    build_inverted_store(_docs([1, 2], ["alpha beta", "beta gamma"]), store,
                         num_buckets=4)

    done = threading.Event()

    def late_ingest():
        ingest_inverted_store(_docs([3], ["alpha delta"]), store)
        done.set()

    with store_writer_lock(store):
        t = threading.Thread(target=late_ingest)
        t.start()
        # the ingest must NOT complete while we hold the exclusive lock
        assert not done.wait(1.0)
    t.join(30)
    assert done.is_set()
    with open(os.path.join(store, "meta.json")) as fh:
        meta = json.load(fh)
    assert meta["n_docs"] == 3
    assert sorted(meta["gens"]) == [0, 1]


@pytest.mark.usefixtures("ray_session")
def test_concurrent_ingests_serialize_into_two_generations(tmp_path):
    """Two simultaneous ingests: without the lock both can claim the same
    generation and the last meta writer erases the other's n_docs; with it
    they serialize — final meta counts BOTH increments as distinct gens."""
    store = str(tmp_path / "inv")
    build_inverted_store(_docs([1], ["alpha"]), store, num_buckets=4)

    errs = []

    def ingest(ids, texts):
        try:
            ingest_inverted_store(_docs(ids, texts), store)
        except Exception as e:  # surfaced below
            errs.append(e)

    t1 = threading.Thread(target=ingest, args=([2, 3], ["beta b", "beta c"]))
    t2 = threading.Thread(target=ingest, args=([4], ["gamma alpha"]))
    t1.start(); t2.start()
    t1.join(60); t2.join(60)
    assert not errs, errs
    with open(os.path.join(store, "meta.json")) as fh:
        meta = json.load(fh)
    assert meta["n_docs"] == 4
    assert sorted(meta["gens"]) == [0, 1, 2]
    # and the merged index is queryable across all three generations
    got = search_inverted_store(store, ("alpha",), k=10)
    assert sorted(got["doc_id"].to_pylist()) == [1, 4]
