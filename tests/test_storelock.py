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


def _fp_docs(rows):
    return _docs([r[0] for r in rows], [r[1] for r in rows])


@pytest.mark.usefixtures("ray_session")
def test_concurrent_fpstore_ingests_two_generations(tmp_path):
    """fpstore race (VERDICT r3 #8): two simultaneous ingests must land in
    DISTINCT run= generations (without the lock both compute the same run
    index and the second manifest overwrites the first — lost dedup
    state), and a re-ingest of either increment afterwards finds every
    fingerprint already present."""
    from monocator_ray.sources.fpstore import ingest, store_size

    store = str(tmp_path / "fp")
    ingest(_fp_docs([(0, "seed doc")]), store)

    errs = []

    def do(rows):
        try:
            ingest(_fp_docs(rows), store)
        except Exception as e:
            errs.append(e)

    rows_a = [(1, "alpha one"), (2, "alpha two")]
    rows_b = [(3, "beta one"), (4, "beta two"), (5, "beta three")]
    t1 = threading.Thread(target=do, args=(rows_a,))
    t2 = threading.Thread(target=do, args=(rows_b,))
    t1.start(); t2.start()
    t1.join(120); t2.join(120)
    assert not errs, errs

    runs = sorted(d for d in os.listdir(store) if d.startswith("run="))
    assert runs == ["run=0", "run=1", "run=2"]
    for d in runs:  # every generation committed its manifest
        assert os.path.exists(os.path.join(store, d, "_MANIFEST.json"))
    assert store_size(store) == 6  # seed + both increments, nothing lost
    again = ingest(_fp_docs(rows_a + rows_b), store)
    assert again.count() == 0  # both commits visible to the probe path


@pytest.mark.usefixtures("ray_session")
def test_concurrent_aggstore_ingests_fold_both(tmp_path):
    """aggstore race: two simultaneous ingest_partials must commit two
    run= generations whose fold counts BOTH increments."""
    from monocator_ray.sources.aggstore import ingest_partials, read_merged
    from monocator_ray.stages.grouped import cached_stage
    from monocator_ray.stages.textstats import TokenCounter

    def tbl(rows):
        ds = rd.from_arrow(pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string()),
             "lang": pa.array([r[2] for r in rows], pa.string())}
        ))
        return ds.map_batches(cached_stage(TokenCounter), batch_format="pyarrow")

    aggs = [("n_tokens", "count"), ("n_tokens", "sum")]
    names = ["lang", "n_docs", "total_tokens"]
    store = str(tmp_path / "agg")
    errs = []

    def do(rows):
        try:
            ingest_partials(tbl(rows), store, ["lang"], aggs, names)
        except Exception as e:
            errs.append(e)

    rows_a = [(i, "one two three", "en") for i in range(4)]
    rows_b = [(10 + i, "vier funf", "de") for i in range(3)]
    t1 = threading.Thread(target=do, args=(rows_a,))
    t2 = threading.Thread(target=do, args=(rows_b,))
    t1.start(); t2.start()
    t1.join(120); t2.join(120)
    assert not errs, errs

    files = sorted(f for f in os.listdir(store) if f.endswith(".parquet"))
    assert files == ["run=0.parquet", "run=1.parquet"]
    view = read_merged(store, ["lang"]).set_index("lang")
    assert int(view.loc["en", "n_docs"]) == 4
    assert int(view.loc["en", "total_tokens"]) == 12
    assert int(view.loc["de", "n_docs"]) == 3
    assert int(view.loc["de", "total_tokens"]) == 6


@pytest.mark.usefixtures("ray_session")
def test_concurrent_annstore_ingests_two_generations(tmp_path):
    """annstore race: two simultaneous ingest_ivf_store calls must commit
    as generations 1 and 2 (the unlocked race has both read gens=[0] and
    the loser's centroids.npz rewrite erases the winner's gen + sizes),
    with full-probe search seeing every vector from both."""
    import numpy as np

    from monocator_ray.sources.annstore import (
        build_ivf_store, ingest_ivf_store, load_ivf_store, search_ivf_store,
    )

    rng = np.random.RandomState(7)

    def emb(ids):
        vecs = rng.randn(len(ids), 8).astype(np.float32)
        return rd.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        }))

    store = str(tmp_path / "ivf")
    build_ivf_store(emb(list(range(32))), store, nlist=4)
    errs = []

    def do(ids):
        try:
            ingest_ivf_store(emb(ids), store)
        except Exception as e:
            errs.append(e)

    t1 = threading.Thread(target=do, args=(list(range(100, 110)),))
    t2 = threading.Thread(target=do, args=(list(range(200, 215)),))
    t1.start(); t2.start()
    t1.join(120); t2.join(120)
    assert not errs, errs

    _index, sizes = load_ivf_store(store)
    assert int(sizes.sum()) == 32 + 10 + 15  # neither increment lost
    meta = np.load(os.path.join(store, "centroids.npz"))
    assert sorted(meta["gens"].tolist()) == [0, 1, 2]
    q = rng.randn(1, 8).astype(np.float32)
    got = search_ivf_store(store, q, k=57, nprobe=4).to_pandas()
    assert len(set(got["vec_id"])) == 57  # every vector reachable
