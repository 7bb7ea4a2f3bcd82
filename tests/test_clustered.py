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
