"""Iceberg table source/sink (sources/iceberg.py): append/overwrite
snapshots, time travel, identity-partition pruning, manifest-list
carry-forward, and the metadata file shapes."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

import ray.data as rd

from monocator_ray.sources.iceberg import (
    iceberg_history,
    read_iceberg,
    write_iceberg,
)
from monocator_ray.stages.grouped import collect_arrow


def _t(ids, labels, vals):
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "label": pa.array(labels, pa.string()),
        "val": pa.array(vals, pa.float64()),
    })


def _sorted_pd(ds):
    t = collect_arrow(ds) if isinstance(ds, rd.Dataset) else ds
    return t.to_pandas().sort_values("id").reset_index(drop=True)


def test_append_time_travel_history(tmp_path, ray_session):
    import pandas as pd

    tbl = str(tmp_path / "t")
    t0 = _t([1, 2, 3], ["a", "b", "a"], [1.0, 2.0, 3.0])
    s1 = write_iceberg(rd.from_arrow(t0).repartition(2), tbl)
    t1 = _t([4], ["c"], [4.0])
    s2 = write_iceberg(rd.from_arrow(t1), tbl)
    assert s2 > s1

    got = _sorted_pd(read_iceberg(tbl))
    pd.testing.assert_frame_equal(got, _sorted_pd(pa.concat_tables([t0, t1])))
    # time travel to the first snapshot
    pd.testing.assert_frame_equal(
        _sorted_pd(read_iceberg(tbl, snapshot_id=s1)), _sorted_pd(t0))
    hist = iceberg_history(tbl)
    assert [h["operation"] for h in hist] == ["append", "append"]


def test_overwrite_snapshot(tmp_path, ray_session):
    import pandas as pd

    tbl = str(tmp_path / "t")
    s1 = write_iceberg(rd.from_arrow(_t([1], ["a"], [1.0])), tbl)
    s2 = write_iceberg(rd.from_arrow(_t([9], ["z"], [9.0])), tbl,
                       mode="overwrite")
    pd.testing.assert_frame_equal(_sorted_pd(read_iceberg(tbl)),
                                  _sorted_pd(_t([9], ["z"], [9.0])))
    # prior snapshot still reachable
    assert _sorted_pd(read_iceberg(tbl, snapshot_id=s1))["id"].tolist() == [1]


def test_partition_layout_and_pruning(tmp_path, ray_session):
    tbl = str(tmp_path / "t")
    t = _t([1, 2, 3, 4], ["a", "b", "a", "c"], [1.0, 2.0, 3.0, 4.0])
    write_iceberg(rd.from_arrow(t), tbl, partition_by=["label"])
    # hive layout; partition column NOT in the data files
    files = []
    for root, _, names in os.walk(os.path.join(tbl, "data")):
        files += [os.path.join(root, n) for n in names
                  if n.endswith(".parquet")]
    assert files and all("label=" in f for f in files)
    import pyarrow.parquet as pq

    assert "label" not in pq.read_schema(files[0]).names

    out = _sorted_pd(read_iceberg(tbl, filters={"label": "a"}))
    assert out["id"].tolist() == [1, 3]
    assert collect_arrow(
        read_iceberg(tbl, filters={"label": ["b", "c"]})).num_rows == 2
    with pytest.raises(ValueError, match="non-partition"):
        read_iceberg(tbl, filters={"val": 1.0})


def test_column_projection(tmp_path, ray_session):
    tbl = str(tmp_path / "t")
    write_iceberg(rd.from_arrow(_t([1, 2], ["a", "b"], [1.0, 2.0])), tbl,
                  partition_by=["label"])
    got = collect_arrow(read_iceberg(tbl, columns=["id", "label"]))
    assert got.column_names == ["id", "label"]


def test_metadata_shapes_on_disk(tmp_path, ray_session):
    """The spec-shaped artifacts exist: versioned metadata JSON with a
    field-id'd schema and identity partition spec, a version hint, Avro
    manifest list + manifest with a nested data_file record."""
    from monocator_ray.sources.avro import parse_avro_file

    tbl = str(tmp_path / "t")
    write_iceberg(rd.from_arrow(_t([1], ["a"], [1.0])), tbl,
                  partition_by=["label"])
    meta = json.load(open(os.path.join(tbl, "metadata/v1.metadata.json")))
    assert meta["format-version"] == 1
    assert meta["partition-spec"][0]["transform"] == "identity"
    assert {f["name"] for f in meta["schema"]["fields"]} == \
        {"id", "label", "val"}
    assert all("id" in f for f in meta["schema"]["fields"])
    hint = open(os.path.join(tbl, "metadata/version-hint.text")).read()
    assert hint.strip() == "1"
    snap = meta["snapshots"][-1]
    ml = parse_avro_file(
        open(os.path.join(tbl, snap["manifest-list"]), "rb").read()
    ).to_pylist()
    assert ml[0]["added_files_count"] == 1
    mf = parse_avro_file(
        open(os.path.join(tbl, ml[0]["manifest_path"]), "rb").read()
    ).to_pylist()
    df = mf[0]["data_file"]
    assert df["file_format"] == "PARQUET" and df["record_count"] == 1
    pv = df["partition"]
    assert dict(pv if isinstance(pv, list) else pv)["label"] == "a"


def test_append_carries_prior_manifests(tmp_path, ray_session):
    from monocator_ray.sources.avro import parse_avro_file

    tbl = str(tmp_path / "t")
    write_iceberg(rd.from_arrow(_t([1], ["a"], [1.0])), tbl)
    write_iceberg(rd.from_arrow(_t([2], ["b"], [2.0])), tbl)
    meta = json.load(open(os.path.join(tbl, "metadata/v2.metadata.json")))
    cur = {s["snapshot-id"]: s for s in meta["snapshots"]}[
        meta["current-snapshot-id"]]
    ml = parse_avro_file(
        open(os.path.join(tbl, cur["manifest-list"]), "rb").read()
    ).to_pylist()
    assert len(ml) == 2  # prior manifest carried forward + the new one


def test_unsupported_rejected(tmp_path, ray_session):
    bad = pa.table({"l": pa.array([[1]], pa.list_(pa.int64()))})
    with pytest.raises(TypeError, match="Iceberg-unsupported"):
        write_iceberg(rd.from_arrow(bad), str(tmp_path / "t"))
    ok = _t([1], ["a"], [1.0])
    with pytest.raises(TypeError, match="identity-partition"):
        write_iceberg(rd.from_arrow(ok), str(tmp_path / "t2"),
                      partition_by=["val"])


def test_schema_evolution_append(tmp_path, ray_session):
    tbl = str(tmp_path / "t")
    write_iceberg(rd.from_arrow(pa.table({"id": pa.array([1], pa.int64())})),
                  tbl)
    write_iceberg(rd.from_arrow(pa.table({
        "id": pa.array([2], pa.int64()),
        "extra": pa.array(["x"], pa.string())})), tbl)
    got = _sorted_pd(read_iceberg(tbl))
    assert got["id"].tolist() == [1, 2]
    assert got["extra"].tolist() == [None, "x"]
    # the evolved schema is in the NEW metadata, old columns preserved
    meta = json.load(open(os.path.join(tbl, "metadata/v2.metadata.json")))
    assert {f["name"] for f in meta["schema"]["fields"]} == {"id", "extra"}
    with pytest.raises(TypeError, match="conflicts"):
        write_iceberg(rd.from_arrow(pa.table(
            {"id": pa.array([1.0], pa.float64())})), tbl)
