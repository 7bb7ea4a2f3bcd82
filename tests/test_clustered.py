"""Clustered parquet sink (sources/clustered.py): exact roundtrip, sorted
files, range pruning actually prunes, success-marker semantics."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_write_read_clustered_roundtrip_and_prune(tmp_path):
    import ray.data as rd

    from monocator_ray.sources.clustered import (
        pruned_files,
        read_clustered,
        write_clustered,
    )

    out = str(tmp_path / "clustered")
    ds = rd.read_parquet("/root/testdata/sf0.01/orders.parquet")
    manifest = write_clustered(ds, "o_custkey", out, num_ranges=8)
    assert manifest["n_rows"] == 15000
    assert os.path.exists(os.path.join(out, "_manifest.json"))

    # spans are disjoint and ordered; every file sorted by key
    files = manifest["files"]
    assert len(files) >= 4
    for a, b in zip(files, files[1:]):
        assert a["key_max"] <= b["key_min"]
    f0 = pq.read_table(os.path.join(out, files[0]["file"]))
    k0 = f0["o_custkey"].to_numpy()
    assert (np.diff(k0) >= 0).all()

    # full read roundtrips exactly
    full = read_clustered(out).to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    want = pq.read_table("/root/testdata/sf0.01/orders.parquet").to_pandas().sort_values(
        "o_orderkey").reset_index(drop=True)
    assert full[["o_orderkey", "o_custkey"]].equals(want[["o_orderkey", "o_custkey"]])

    # range read: correct rows, and touches a strict file subset
    lo, hi = 100, 300
    got = read_clustered(out, lo, hi).to_pandas()
    exp = want[(want["o_custkey"] >= lo) & (want["o_custkey"] <= hi)]
    assert len(got) == len(exp)
    assert sorted(got["o_orderkey"]) == sorted(exp["o_orderkey"])
    touched = pruned_files(out, lo, hi)
    assert 0 < len(touched) < len(files)


@pytest.mark.usefixtures("ray_session")
def test_clustered_missing_manifest_is_failure(tmp_path):
    from monocator_ray.sources.clustered import read_clustered

    with pytest.raises(FileNotFoundError):
        read_clustered(str(tmp_path / "nope"))


def test_ivf_store_build_search_and_prune(tmp_path, ray_session):
    """Persistent IVF store: full-probe search equals brute force exactly;
    partial probe reads only the probed lists' files; a store without its
    centroids marker refuses to load."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import pytest as _pytest

    import ray.data as rd

    from monocator_ray.sources.annstore import (
        build_ivf_store,
        load_ivf_store,
        search_ivf_store,
    )
    from monocator_ray.stages.ann import _normalize, table_to_matrix

    sf = "/root/testdata/sf0.001"
    emb = rd.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    store = str(tmp_path / "ivf")
    nlist = 8
    build_ivf_store(emb, store, nlist=nlist)
    index, sizes = load_ivf_store(store)
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    assert sizes.sum() == t.num_rows

    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = table_to_matrix(t)
    queries = m[:6]
    got = search_ivf_store(store, queries, k=5, nprobe=nlist).to_pandas()
    mn = _normalize(m)
    qn = _normalize(queries)
    sims = qn @ mn.T
    for qi in range(len(queries)):
        order = np.lexsort((ids, -sims[qi]))[:5]
        want = ids[order].tolist()
        have = got[got.query_id == qi].sort_values("rank")["vec_id"].tolist()
        assert have == want, f"query {qi}"

    # partial probe: store files for unprobed lists are never read (one
    # query probing 2 of 8 lists can touch at most 2)
    one = queries[:1]
    probes = index.probe_lists(one, 2)
    wanted = {int(x) for x in probes.reshape(-1)}
    assert len(wanted) <= 2 < nlist
    got2 = search_ivf_store(store, one, k=5, nprobe=2).to_pandas()
    assert set(got2.query_id) == {0} and len(got2) == 5

    os.remove(os.path.join(store, "centroids.npz"))
    with _pytest.raises(FileNotFoundError):
        load_ivf_store(store)


def test_ivf_store_incremental_ingest(tmp_path, ray_session):
    """Two-increment build+ingest == one-shot full-probe results; a crashed
    ingest's orphan generation files are invisible to search."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data as rd

    from monocator_ray.sources.annstore import (
        build_ivf_store, ingest_ivf_store, load_ivf_store, search_ivf_store,
    )
    from monocator_ray.stages.ann import _normalize, table_to_matrix

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    n = t.num_rows
    first, rest = t.slice(0, n // 2), t.slice(n // 2)

    store = str(tmp_path / "ivf2")
    build_ivf_store(rd.from_arrow(first), store, nlist=8)
    added = ingest_ivf_store(rd.from_arrow(rest), store)
    assert added == rest.num_rows
    _index, sizes = load_ivf_store(store)
    assert sizes.sum() == n

    # full-probe search over the two-increment store == brute force over
    # the WHOLE table (the same exactness contract as the one-shot store)
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = table_to_matrix(t)
    queries = m[:4]
    got = search_ivf_store(store, queries, k=5, nprobe=8).to_pandas()
    sims = _normalize(queries) @ _normalize(m).T
    for qi in range(len(queries)):
        want = ids[np.lexsort((ids, -sims[qi]))[:5]].tolist()
        have = got[got.query_id == qi].sort_values("rank")["vec_id"].tolist()
        assert have == want, f"query {qi}"

    # crashed ingest: an orphan generation file (no npz commit) is ignored
    orphan = pa.table({
        "vec_id": pa.array([10 ** 9], pa.int64()),
        "embedding": pa.array([m[0].tolist()], pa.list_(pa.float32())),
    })
    pq.write_table(orphan, os.path.join(store, "list=0-g99-999.parquet"))
    got2 = search_ivf_store(store, queries, k=5, nprobe=8).to_pandas()
    assert 10 ** 9 not in set(got2["vec_id"])
    # a follow-up ingest never reuses the orphan's generation number
    added2 = ingest_ivf_store(rd.from_arrow(first.slice(0, 3)), store)
    assert added2 == 3
    gens = {f for f in os.listdir(store) if "-g100-" in f}
    assert gens, "next gen should be 100 (max present 99 + 1)"


def test_read_parquet_union_schema_evolution(ray_session, tmp_path):
    """Snapshots whose schema gained a column read as ONE dataset over the
    union schema: missing columns null-filled, present ones value-exact,
    column pruning still honored."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray.sources.tables import read_parquet_union

    old = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "v": pa.array([10.0, 20.0], pa.float64())})
    new = pa.table({"id": pa.array([3, 4], pa.int64()),
                    "v": pa.array([30.0, 40.0], pa.float64()),
                    "lang": pa.array(["en", "nl"], pa.string())})
    pq.write_table(old, tmp_path / "a_old.parquet")
    pq.write_table(new, tmp_path / "b_new.parquet")

    ds = read_parquet_union([str(tmp_path / "a_old.parquet"),
                             str(tmp_path / "b_new.parquet")])
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "v", "lang"]
    assert df["id"].tolist() == [1, 2, 3, 4]
    assert df["lang"].tolist()[:2] == [None, None]
    assert df["lang"].tolist()[2:] == ["en", "nl"]

    # column pruning over the union schema
    ds2 = read_parquet_union([str(tmp_path / "a_old.parquet"),
                              str(tmp_path / "b_new.parquet")],
                             columns=["id", "lang"])
    df2 = ds2.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df2.columns) == ["id", "lang"]
    assert df2["lang"].tolist() == [None, None, "en", "nl"]
