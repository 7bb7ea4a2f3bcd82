"""Persistent fingerprint store (sources/fpstore.py): incremental exact
dedup — generation layout, fence-pruned probes, idempotent re-ingest."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _docs_tbl(rows):
    return rd.from_arrow(pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    ))


@pytest.mark.usefixtures("ray_session")
def test_incremental_ingest_equals_one_shot_dedup(tmp_path):
    from monocator_ray.sources.fpstore import ingest, store_size

    batch1 = [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha  beta "),
              (3, "unique one")]
    batch2 = [(10, "alpha beta"), (11, "new text here"), (12, "gamma delta"),
              (13, "new text here"), (14, "another fresh doc")]
    store = str(tmp_path / "fp")
    a = ingest(_docs_tbl(batch1), store).to_pandas()
    # within-increment first-wins: doc 2 is a whitespace-dup of doc 0
    assert sorted(a["doc_id"]) == [0, 1, 3]
    b = ingest(_docs_tbl(batch2), store).to_pandas()
    # 10/12 already in the store; 13 dups 11 within the increment
    assert sorted(b["doc_id"]) == [11, 14]
    assert store_size(store) == 5

    # idempotence: re-ingesting anything already accepted yields nothing
    again = ingest(_docs_tbl(batch1 + batch2), store).to_pandas()
    assert len(again) == 0
    assert store_size(store) == 5


@pytest.mark.usefixtures("ray_session")
def test_fpstore_generations_and_fences(tmp_path):
    import json
    import os

    from monocator_ray.sources.fpstore import _fences, ingest

    store = str(tmp_path / "fp")
    ingest(_docs_tbl([(i, f"text number {i}") for i in range(50)]), store)
    ingest(_docs_tbl([(100 + i, f"other {i}") for i in range(30)]), store)
    runs = sorted(d for d in os.listdir(store) if d.startswith("run="))
    assert runs == ["run=0", "run=1"]
    fences = _fences(store)
    assert sum(1 for f in fences) >= 2
    # every fence is a real sorted shard within its declared range
    import pyarrow.parquet as pq

    for f in fences:
        fp = pq.read_table(f["path"])["fp"].to_numpy()
        assert fp[0] == f["lo"] and fp[-1] == f["hi"]
        assert (np.diff(fp) > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_fpstore_ignores_and_overwrites_crashed_generation(tmp_path):
    """A generation without _MANIFEST.json (crashed before commit) must be
    invisible to probes and safely overwritten by the next ingest."""
    import os

    import pyarrow.parquet as pq

    from monocator_ray.sources.fpstore import ingest, store_size

    store = str(tmp_path / "fp")
    ingest(_docs_tbl([(0, "committed doc")]), store)
    # simulate a crashed second ingest: shard written, manifest missing
    crashed = os.path.join(store, "run=1")
    os.makedirs(crashed)
    pq.write_table(
        pa.table({"fp": pa.array([123456789], pa.int64())}),
        os.path.join(crashed, "fp-deadbeef.parquet"),
    )
    assert store_size(store) == 1  # uncommitted run not counted
    out = ingest(_docs_tbl([(5, "after the crash"), (6, "committed doc")]),
                 store).to_pandas()
    # 6 dups the committed doc; 5 is novel even though a stale shard existed
    assert sorted(out["doc_id"]) == [5]
    assert store_size(store) == 2
    assert os.path.exists(os.path.join(crashed, "_MANIFEST.json"))


@pytest.mark.usefixtures("ray_session")
def test_fpstore_gap_in_runs_never_clobbers_committed_generation(tmp_path):
    """run=0 removed out-of-band (compaction/cleanup): the next ingest must
    number PAST the surviving committed run, not renumber into the gap and
    destroy it (review finding r2g)."""
    import os
    import shutil

    from monocator_ray.sources.fpstore import ingest, store_size

    store = str(tmp_path / "fp")
    ingest(_docs_tbl([(0, "gen zero doc")]), store)
    ingest(_docs_tbl([(1, "gen one doc")]), store)
    shutil.rmtree(os.path.join(store, "run=0"))
    out = ingest(_docs_tbl([(2, "gen one doc"), (3, "fresh doc")]),
                 store).to_pandas()
    # doc 2 must still be recognized as a dup of the SURVIVING run=1
    assert sorted(out["doc_id"]) == [3]
    assert sorted(d for d in os.listdir(store) if d.startswith("run=")) == [
        "run=1", "run=2"
    ]
    assert store_size(store) == 2


@pytest.mark.usefixtures("ray_session")
def test_fpstore_compaction_preserves_membership(tmp_path):
    import os

    from monocator_ray.sources.fpstore import compact, ingest, store_size

    store = str(tmp_path / "fp")
    for g in range(3):
        ingest(_docs_tbl([(g * 10 + i, f"doc {g} {i}") for i in range(8)]), store)
    assert store_size(store) == 24
    n = compact(store)
    assert n == 24 and store_size(store) == 24
    runs = [d for d in os.listdir(store) if d.startswith("run=")]
    assert runs == ["run=3"]
    # membership identical after compaction: re-ingest of anything seen -> 0
    out = ingest(_docs_tbl([(99, "doc 1 3"), (100, "brand new")]), store).to_pandas()
    assert sorted(out["doc_id"]) == [100]


@pytest.mark.usefixtures("ray_session")
def test_aggstore_incremental_equals_one_shot(tmp_path):
    """Fold(ingest A, ingest B) == one-shot aggregate over A ∪ B, and a
    crashed (temp-file) generation is invisible."""
    import os

    from monocator_ray.sources.aggstore import ingest_partials, read_merged

    rows_a = [(i, f"word {'x ' * (i % 5)}", "en" if i % 2 else "fr")
              for i in range(20)]
    rows_b = [(100 + i, f"more {'y ' * (i % 7)}", "nl" if i % 3 else "en")
              for i in range(30)]

    def tbl(rows):
        return rd.from_arrow(pa.table(
            {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
             "text": pa.array([r[1] for r in rows], pa.string()),
             "lang": pa.array([r[2] for r in rows], pa.string())}
        ))

    from monocator_ray.stages.grouped import cached_stage, driver_grouped_agg
    from monocator_ray.stages.textstats import TokenCounter

    aggs = [("n_tokens", "count"), ("n_tokens", "sum"),
            ("n_tokens", "max"), ("n_tokens", "min")]
    names = ["lang", "n_docs", "total_tokens", "max_tokens", "min_tokens"]

    def counted(ds):
        return ds.map_batches(cached_stage(TokenCounter), batch_format="pyarrow")

    store = str(tmp_path / "agg")
    ingest_partials(counted(tbl(rows_a)), store, ["lang"], aggs, names)
    # plant a crashed generation: temp file never renamed
    open(os.path.join(store, "garbage.tmp"), "w").write("x")
    ingest_partials(counted(tbl(rows_b)), store, ["lang"], aggs, names)
    got = read_merged(store, ["lang"])

    want = (
        driver_grouped_agg(counted(tbl(rows_a + rows_b)), ["lang"], aggs, names)
        .sort_values("lang").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in names[1:]}),
        want.astype({c: "int64" for c in names[1:]}),
    )


@pytest.mark.usefixtures("ray_session")
def test_fpstore_random_splits_match_one_shot(tmp_path):
    """Any id-ordered increment partition of any corpus folds to the same
    survivor set as one-shot first-wins dedup (seeded random trials)."""
    import numpy as np

    from monocator_ray.sources.fpstore import ingest
    from monocator_ray.stages.textstats import Fingerprinter
    import pandas as pd

    rng = np.random.RandomState(11)
    for trial in range(3):
        n = int(rng.randint(20, 60))
        # small text alphabet => plenty of exact duplicates
        texts = [" ".join(rng.choice(["aa", "bb", "cc", "dd"], size=3))
                 for _ in range(n)]
        rows = list(enumerate(texts))
        cuts = sorted(rng.choice(range(1, n), size=2, replace=False).tolist())
        parts = [rows[: cuts[0]], rows[cuts[0]: cuts[1]], rows[cuts[1]:]]
        store = str(tmp_path / f"fp{trial}")
        got = []
        for p in parts:
            if p:
                got.extend(ingest(_docs_tbl(p), store).to_pandas()["doc_id"])
        fp = Fingerprinter()(
            pa.table({"doc_id": pa.array(range(n), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        ).to_pandas()
        want = sorted(
            fp.groupby(fp["fingerprint"].to_numpy())["doc_id"].min().tolist()
        )
        assert sorted(got) == want, f"trial {trial}"


@pytest.mark.usefixtures("ray_session")
def test_training_shards_reassemble_the_shuffled_corpus(tmp_path):
    """Shards sorted by pos reassemble the whole corpus in the exact
    (mix32, doc_id) permutation; sizes are shard_rows except the tail;
    manifest fences match file contents."""
    import json
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.docs import _mix32
    from monocator_ray.sources.jsonl import write_training_shards

    n, S = 103, 16
    docs = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(n), pa.int64()),
         "text": pa.array([f"doc {i}" for i in range(n)], pa.string())}
    ))
    out = str(tmp_path / "shards")
    manifest = write_training_shards(docs, out, shard_rows=S).to_pandas()
    assert len(manifest) == (n + S - 1) // S
    assert manifest["rows"].sum() == n
    assert set(manifest["rows"][:-1]) == {S} and manifest["rows"].iloc[-1] == n % S

    # reassemble and compare to the direct permutation
    got_ids, got_pos = [], []
    for rec in json.load(open(os.path.join(out, "_MANIFEST.json"))):
        t = pq.read_table(os.path.join(out, rec["file"]))
        p = t["pos"].to_numpy()
        assert p[0] == rec["pos_lo"] and p[-1] == rec["pos_hi"]
        assert (np.diff(p) == 1).all()  # dense, sorted within the shard
        got_ids.extend(t["doc_id"].to_pylist())
        got_pos.extend(p.tolist())
    assert sorted(got_pos) == list(range(n))
    ids = np.arange(n, dtype=np.int64)
    order = np.lexsort((ids, _mix32(ids)))
    want = ids[order].tolist()  # doc at rank k
    by_pos = [i for _, i in sorted(zip(got_pos, got_ids))]
    assert by_pos == want


@pytest.mark.usefixtures("ray_session")
def test_aggstore_compact_preserves_view(tmp_path):
    """compact() folds live generations into one base: the view is
    unchanged, later ingests keep folding, a superseded run left behind
    by a crashed cleanup stays DEAD (gen <= base), and n_docs-style
    count partials never double-count."""
    import os

    import pandas as pd

    from monocator_ray.sources.aggstore import (
        compact, ingest_partials, read_merged,
    )
    from monocator_ray.stages.grouped import cached_stage
    from monocator_ray.stages.textstats import TokenCounter

    def tbl(lo, n, lang):
        return rd.from_arrow(pa.table(
            {"doc_id": pa.array(list(range(lo, lo + n)), pa.int64()),
             "text": pa.array([f"t {'w ' * (i % 4)}" for i in range(n)], pa.string()),
             "lang": pa.array([lang] * n, pa.string())}
        )).map_batches(cached_stage(TokenCounter), batch_format="pyarrow")

    aggs = [("n_tokens", "count"), ("n_tokens", "sum")]
    names = ["lang", "n_docs", "total_tokens"]
    store = str(tmp_path / "agg")
    ingest_partials(tbl(0, 10, "en"), store, ["lang"], aggs, names)
    ingest_partials(tbl(10, 5, "fr"), store, ["lang"], aggs, names)
    ingest_partials(tbl(15, 7, "en"), store, ["lang"], aggs, names)
    before = read_merged(store, ["lang"])
    n_groups = compact(store, ["lang"])
    assert n_groups == len(before)
    after = read_merged(store, ["lang"])
    pd.testing.assert_frame_equal(before, after)
    # exactly one live parquet remains
    live = [f for f in os.listdir(store) if f.endswith(".parquet")]
    assert live == ["base=2.parquet"]

    # crashed cleanup: a stale superseded run reappears -> still dead
    import pyarrow.parquet as pq_

    pq_.write_table(pa.Table.from_pandas(before, preserve_index=False),
                    os.path.join(store, "run=1.parquet"))
    pd.testing.assert_frame_equal(read_merged(store, ["lang"]), after)

    # ingest after compaction folds on top (gen 3 > base 2)
    ingest_partials(tbl(50, 4, "fr"), store, ["lang"], aggs, names)
    got = read_merged(store, ["lang"])
    assert int(got[got.lang == "fr"]["n_docs"].iloc[0]) == 9
    assert int(got[got.lang == "en"]["n_docs"].iloc[0]) == 17


@pytest.mark.usefixtures("ray_session")
def test_prober_survives_concurrent_compaction_sweep(tmp_path):
    """A reader that snapshotted fences BEFORE a compact() must not crash
    when the compaction sweeps the superseded runs, and must still report
    exact membership (storelock.py's reader-concurrent-with-writer promise;
    compaction preserves membership, so refresh-and-reprobe is exact)."""
    import json

    from monocator_ray.sources.fpstore import (
        _fences, _ShardProber, compact, ingest,
    )
    from monocator_ray.stages.textstats import fingerprint_arrow

    store = str(tmp_path / "fp")
    ingest(_docs_tbl([(0, "old doc a"), (1, "old doc b")]), store)
    ingest(_docs_tbl([(2, "old doc c")]), store)

    stale = _fences(store)  # reader snapshot taken pre-compact
    assert len(stale) >= 2
    compact(store)  # sweeps run=0 / run=1: every stale fence path is gone

    prober = _ShardProber(fences_json=json.dumps(stale), store_dir=store)
    texts = ["old doc a", "brand new", "old doc c"]
    fp = fingerprint_arrow(pa.chunked_array([pa.array(texts)])).view(np.int64)
    batch = pa.table({"doc_id": pa.array([7, 8, 9], pa.int64()),
                      "fp": pa.array(fp, pa.int64())})
    out = prober(batch)  # stale paths -> FileNotFoundError -> refresh
    assert out["doc_id"].to_pylist() == [8]

    # without a store_dir the prober has nothing to refresh from: re-raise
    bare = _ShardProber(fences_json=json.dumps(stale))
    with pytest.raises(FileNotFoundError):
        bare(batch)


def test_hll_view_two_increments_register_identical(ray_session, tmp_path):
    """Sketch-valued aggstore columns: (ingest A; ingest B; read) must be
    REGISTER-IDENTICAL to one-shot over A∪B (HLL merge is associative,
    commutative, idempotent), the estimate within 5% of exact, and
    compact() must preserve the bytes."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from monocator_ray.sources.aggstore import (
        compact, ingest_hll_partials, read_merged,
    )
    from monocator_ray.state.hll import HLL

    rng = np.random.default_rng(7)
    n = 20000
    keys = rng.choice(["a", "b"], n)
    users = rng.integers(0, 3000, n)
    from monocator_ray.hashing import hash_str64

    h = hash_str64([str(u) for u in users.tolist()]).view(np.int64)
    tbl = pa.table({"k": pa.array(keys), "uh": pa.array(h, pa.int64()),
                    "i": pa.array(np.arange(n), pa.int64())})

    inc_store = str(tmp_path / "inc")
    one_store = str(tmp_path / "one")
    ds = rd.from_arrow(tbl)
    def _par(par):
        def fn(t):
            import numpy as _np
            i = t["i"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(i % 2 == par))
        return fn

    ingest_hll_partials(ds.map_batches(_par(0), batch_format="pyarrow"),
                        inc_store, ["k"], "uh", "hll_u")
    ingest_hll_partials(ds.map_batches(_par(1), batch_format="pyarrow"),
                        inc_store, ["k"], "uh", "hll_u")
    ingest_hll_partials(ds, one_store, ["k"], "uh", "hll_u")

    v_inc = read_merged(inc_store, ["k"])
    v_one = read_merged(one_store, ["k"])
    assert list(v_inc["k"]) == list(v_one["k"])
    for a, b in zip(v_inc["hll_u"], v_one["hll_u"]):
        assert a == b  # bytes equal, not just estimates

    # accuracy: within 5% of the exact distinct count per key
    import pandas as pd

    exact = pd.DataFrame({"k": keys, "u": users}).groupby("k")["u"].nunique()
    for krow, blob in zip(v_inc["k"], v_inc["hll_u"]):
        est = HLL.loads(blob).estimate()
        assert abs(est - exact[krow]) / exact[krow] < 0.05

    # compaction preserves the registers
    compact(inc_store, ["k"])
    v_c = read_merged(inc_store, ["k"])
    for a, b in zip(v_c["hll_u"], v_one["hll_u"]):
        assert a == b
