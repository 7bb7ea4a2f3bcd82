"""Persistent inverted-index store (sources/invstore.py)."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


@pytest.mark.usefixtures("ray_session")
def test_inverted_store_matches_scan_path(tmp_path):
    """Store-served search == the corpus-scan query (same tokenizer/weight/
    tie rule), and the query's file set is the PRUNED bucket subset."""
    from monocator_ray.hashing import hash_str64
    from monocator_ray.pipelines.docs import _SEARCH_TERMS, q_keyword_search
    from monocator_ray.sources.invstore import (
        build_inverted_store, search_inverted_store,
    )

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "inv")
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    n_docs = build_inverted_store(docs, store, num_buckets=16)
    assert n_docs == docs.count()
    meta = json.load(open(os.path.join(store, "meta.json")))
    assert meta == {"n_docs": n_docs, "num_buckets": 16, "gens": [0]}

    got = search_inverted_store(store, _SEARCH_TERMS, k=20).to_pandas()
    want = q_keyword_search(sf, k=20).to_pandas()
    assert got.to_dict("records") == want.to_dict("records")

    # pruned-read bound: the four query terms hash into <= 4 of 16 buckets,
    # so the probed file set is a strict subset of the store's shards
    want_buckets = set(
        (hash_str64(np.array(list(_SEARCH_TERMS), dtype=object)) % np.uint64(16))
        .astype(np.int64).tolist()
    )
    all_files = [f for f in os.listdir(store) if f.startswith("bucket=")]
    probed = [f for f in all_files
              if int(f.split("=")[1].split("-")[0]) in want_buckets]
    all_buckets = {int(f.split("=")[1].split("-")[0]) for f in all_files}
    assert len(want_buckets) <= 4
    assert len(all_buckets) > len(want_buckets)  # pruning is real
    assert len(probed) < len(all_files)

    # a term absent from the corpus contributes nothing and never crashes
    out = search_inverted_store(store, ("zzz_not_a_term",), k=5)
    assert out.num_rows == 0

    # a crashed build (no meta.json) is invisible: rebuild clears shards
    os.remove(os.path.join(store, "meta.json"))
    build_inverted_store(docs, store, num_buckets=16)
    got2 = search_inverted_store(store, _SEARCH_TERMS, k=20).to_pandas()
    assert got2.to_dict("records") == want.to_dict("records")


@pytest.mark.usefixtures("ray_session")
def test_inverted_store_empty_and_tiny_corpus(tmp_path):
    from monocator_ray.sources.invstore import (
        build_inverted_store, search_inverted_store,
    )

    t = pa.table({"doc_id": pa.array([7, 9], pa.int64()),
                  "text": pa.array(["a b b", ""], pa.string())})
    store = str(tmp_path / "tiny")
    n = build_inverted_store(rd.from_arrow(t), store, num_buckets=4)
    assert n == 2
    # df('b') = 1 -> weight 2//1 = 2; tf=2 -> score 4; 'a' weight 2, tf 1
    out = search_inverted_store(store, ("a", "b"), k=5).to_pandas()
    assert out.to_dict("records") == [{"doc_id": 7, "score": 6}]


@pytest.mark.usefixtures("ray_session")
def test_inverted_store_incremental_ingest(tmp_path):
    """Two-increment build == one-shot build; crashed ingest (no meta
    rewrite) leaves the old committed state; generation numbering never
    reuses a committed run index."""
    from monocator_ray.sources.invstore import (
        build_inverted_store, ingest_inverted_store, search_inverted_store,
    )

    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    one = str(tmp_path / "oneshot")
    build_inverted_store(docs, one, num_buckets=8)
    want = search_inverted_store(one, ("the", "of", "la", "van"), k=20).to_pandas()

    two = str(tmp_path / "twostep")
    n = docs.count()
    build_inverted_store(docs.filter(expr=f"doc_id < {n // 2}"), two, num_buckets=8)
    total = ingest_inverted_store(docs.filter(expr=f"doc_id >= {n // 2}"), two)
    assert total == n
    got = search_inverted_store(two, ("the", "of", "la", "van"), k=20).to_pandas()
    assert got.to_dict("records") == want.to_dict("records")

    # generations: g0 from build, g1 from ingest; next ingest must take g2
    gens = sorted({f.split("-g")[1].split("-")[0]
                   for f in os.listdir(two) if f.startswith("bucket=")})
    assert gens == ["0", "1"]
    t = pa.table({"doc_id": pa.array([10**6], pa.int64()),
                  "text": pa.array(["the the"], pa.string())})
    ingest_inverted_store(rd.from_arrow(t), two)
    gens = sorted({f.split("-g")[1].split("-")[0]
                   for f in os.listdir(two) if f.startswith("bucket=")})
    assert gens == ["0", "1", "2"]
    meta = json.load(open(os.path.join(two, "meta.json")))
    assert meta["n_docs"] == n + 1

    # empty increment: counts stay, nothing breaks
    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    assert ingest_inverted_store(empty, two) == n + 1


@pytest.mark.usefixtures("ray_session")
def test_empty_text_docs_still_count_toward_n_docs(tmp_path):
    """Code-review r3-closing #1: an all-empty-text block contributes its
    doc COUNT even though it contributes no postings — n_docs feeds the
    idf weight and must equal the oracle's COUNT(*) FROM documents."""
    from monocator_ray.sources.invstore import (
        build_inverted_store, search_inverted_store,
    )

    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["the cat", "of dog", "", None], pa.string())})
    # two blocks: one with tokens, one all-empty
    ds = rd.from_arrow(t).repartition(2)
    store = str(tmp_path / "empties")
    n = build_inverted_store(ds, store, num_buckets=4)
    assert n == 4
    meta = json.load(open(os.path.join(store, "meta.json")))
    assert meta["n_docs"] == 4
    # weight = n_docs // df = 4 // 1 = 4 for both terms
    out = search_inverted_store(store, ("the", "of"), k=5).to_pandas()
    assert sorted(out.to_dict("records"), key=lambda r: r["doc_id"]) == [
        {"doc_id": 1, "score": 4}, {"doc_id": 2, "score": 4}]


@pytest.mark.usefixtures("ray_session")
def test_crashed_ingest_invisible_and_compaction(tmp_path):
    """Committed-gens discipline (the annstore rule): a crashed ingest's
    orphan files never reach search; compact() folds live generations
    into one file per bucket with identical results."""
    from monocator_ray.sources.invstore import (
        build_inverted_store, compact_inverted_store, ingest_inverted_store,
        search_inverted_store,
    )

    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    store = str(tmp_path / "inv")
    n = docs.count()
    build_inverted_store(docs.filter(expr=f"doc_id < {n // 2}"), store, num_buckets=8)
    ingest_inverted_store(docs.filter(expr=f"doc_id >= {n // 2}"), store)
    want = search_inverted_store(store, ("the", "of"), k=10).to_pandas()

    # crashed ingest: generation files written, meta NEVER rewritten
    orphan = pa.table({"doc_id": pa.array([10 ** 7], pa.int64()),
                       "text": pa.array(["the the the the the the"], pa.string())})
    meta_before = open(os.path.join(store, "meta.json")).read()
    # simulate: run a real ingest, then roll the meta back (as a crash
    # between file writes and the meta rewrite would leave it)
    ingest_inverted_store(rd.from_arrow(orphan), store)
    open(os.path.join(store, "meta.json"), "w").write(meta_before)
    got = search_inverted_store(store, ("the", "of"), k=10).to_pandas()
    assert got.to_dict("records") == want.to_dict("records")
    assert 10 ** 7 not in set(got["doc_id"])

    # compaction: one live file per bucket, results unchanged, orphans gone
    n_files = compact_inverted_store(store)
    got2 = search_inverted_store(store, ("the", "of"), k=10).to_pandas()
    assert got2.to_dict("records") == want.to_dict("records")
    live = [f for f in os.listdir(store) if f.startswith("bucket=")]
    assert len(live) == n_files  # compaction unlinked everything dead
    buckets = {f.split("=")[1].split("-")[0] for f in live}
    assert len(buckets) == len(live)  # exactly one file per bucket
    # ingest after compaction keeps working
    ingest_inverted_store(rd.from_arrow(pa.table(
        {"doc_id": pa.array([10 ** 8], pa.int64()),
         "text": pa.array(["of of of of of of of of of of"], pa.string())})), store)
    got3 = search_inverted_store(store, ("of",), k=3).to_pandas()
    assert 10 ** 8 in set(got3["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_pre_gens_meta_treats_all_files_as_live(tmp_path):
    """Back-compat (code-review r3-closing-2 #1): a store whose meta.json
    predates the committed-gens discipline (no 'gens' key) must treat
    EVERY present generation as live — defaulting to {0} would drop the
    old increments from search and compaction would then delete them."""
    from monocator_ray.sources.invstore import (
        build_inverted_store, compact_inverted_store, ingest_inverted_store,
        search_inverted_store,
    )

    sf = "/root/testdata/sf0.001"
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    store = str(tmp_path / "legacy")
    n = docs.count()
    build_inverted_store(docs.filter(expr=f"doc_id < {n // 2}"), store, num_buckets=8)
    ingest_inverted_store(docs.filter(expr=f"doc_id >= {n // 2}"), store)
    want = search_inverted_store(store, ("the", "of"), k=10).to_pandas()

    # rewrite meta in the OLD format (no gens key)
    meta = json.load(open(os.path.join(store, "meta.json")))
    del meta["gens"]
    json.dump(meta, open(os.path.join(store, "meta.json"), "w"))

    got = search_inverted_store(store, ("the", "of"), k=10).to_pandas()
    assert got.to_dict("records") == want.to_dict("records")
    # compaction preserves the whole view (and upgrades the meta format)
    compact_inverted_store(store)
    got2 = search_inverted_store(store, ("the", "of"), k=10).to_pandas()
    assert got2.to_dict("records") == want.to_dict("records")
    assert json.load(open(os.path.join(store, "meta.json")))["gens"]


def test_search_cli(tmp_path):
    """`search` subcommand: builds the index on first use, serves queries
    from it afterwards (store reused, no rebuild)."""
    import json as _json
    import subprocess
    import sys

    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    store = str(tmp_path / "idx")

    def run():
        r = subprocess.run(
            [sys.executable, "-m", "monocator_ray", "--num-cpus", "4",
             "search", "the", "of", "--table",
             "/root/testdata/sf0.001/documents.parquet",
             "--store", store, "--k", "5"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    first = run()
    assert len(first["hits"]) == 5 and first["hits"][0]["score"] > 0
    import os as _os

    mtime = _os.path.getmtime(_os.path.join(store, "meta.json"))
    second = run()  # reuses the committed store
    assert second["hits"] == first["hits"]
    assert _os.path.getmtime(_os.path.join(store, "meta.json")) == mtime


@pytest.mark.usefixtures("ray_session")
def test_planted_tmp_files_invisible_and_swept(tmp_path):
    """Worker-side data files publish atomically (tmp + os.replace — a
    duplicate/straggler map task must never truncate a live file: the
    fpstore 0-byte flake).  A crashed writer's leftover .tmp file must be
    (a) invisible to search and generation numbering, (b) swept by
    compaction."""
    from monocator_ray.pipelines.docs import _SEARCH_TERMS
    from monocator_ray.sources.invstore import (
        build_inverted_store, compact_inverted_store, ingest_inverted_store,
        search_inverted_store,
    )

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "inv")
    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    n = docs.count()
    cut = n // 2
    build_inverted_store(docs.filter(expr=f"doc_id < {cut}"), store, num_buckets=4)
    baseline_files = sorted(f for f in os.listdir(store) if f.endswith(".parquet"))

    # a crashed duplicate writer left a truncated tmp with a plausible name
    open(os.path.join(store, "bucket=0-g7-deadbeef.parquet.tmp-9-ab"), "w").close()

    got = search_inverted_store(store, _SEARCH_TERMS, k=10)  # must not read it
    assert got.num_rows > 0
    ingest_inverted_store(docs.filter(expr=f"doc_id >= {cut}"), store)
    meta = json.load(open(os.path.join(store, "meta.json")))
    assert meta["gens"] == [0, 1]  # numbering ignored the g7 tmp name
    compact_inverted_store(store)
    assert not [f for f in os.listdir(store) if ".tmp-" in f]  # swept
    assert search_inverted_store(store, _SEARCH_TERMS, k=10).num_rows > 0

    # no store operation leaves its own tmp files behind either
    assert baseline_files  # sanity: the store had real shards to begin with


@pytest.mark.usefixtures("ray_session")
def test_annstore_planted_tmp_invisible(tmp_path):
    """Same contract for the IVF store: a leftover .tmp list file is never
    opened by search and never drives generation numbering."""
    import numpy as np

    from monocator_ray.sources.annstore import (
        build_ivf_store, ingest_ivf_store, search_ivf_store,
    )

    sf = "/root/testdata/sf0.001"
    emb = rd.read_parquet(f"{sf}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    store = str(tmp_path / "ann")
    build_ivf_store(emb, store, nlist=4)
    open(os.path.join(store, "list=0-g9-0.parquet.tmp-9-ab"), "w").close()

    q = np.stack([r["embedding"] for r in emb.limit(2).take_all()]).astype(np.float32)
    got = search_ivf_store(store, q, k=3, nprobe=4)  # full probe touches list 0
    assert got.num_rows > 0
    ingest_ivf_store(emb.limit(8), store)  # numbering must ignore g9 tmp
    import numpy as _np
    gens = {int(f.split("-g")[1].split("-")[0]) for f in os.listdir(store)
            if f.startswith("list=") and "-g" in f and f.endswith(".parquet")}
    assert gens == {1}  # the real increment landed at gen 1, not 10
