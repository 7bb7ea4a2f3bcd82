"""Delta Lake source/sink (sources/delta.py): log replay, append /
overwrite semantics, time travel, hive partition pruning, checkpoint
equivalence, and the O_EXCL optimistic-commit race."""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pytest

import ray.data as rd

from monocator_ray.sources.delta import (
    DeltaConcurrentCommit,
    _commit,
    checkpoint_delta_table,
    delta_history,
    read_delta,
    write_delta,
)
from monocator_ray.stages.grouped import collect_arrow


def _t(ids, labels, vals):
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "label": pa.array(labels, pa.string()),
        "val": pa.array(vals, pa.float64()),
    })


def _sorted_pd(ds_or_table):
    t = collect_arrow(ds_or_table) if isinstance(ds_or_table, rd.Dataset) \
        else ds_or_table
    return t.to_pandas().sort_values("id").reset_index(drop=True)


def test_roundtrip_append_and_time_travel(tmp_path, ray_session):
    import pandas as pd

    tbl = str(tmp_path / "t")
    t0 = _t([1, 2, 3], ["a", "b", "a"], [1.0, 2.0, 3.0])
    v0 = write_delta(rd.from_arrow(t0).repartition(2), tbl)
    assert v0 == 0
    t1 = _t([4, 5], ["b", "c"], [4.0, 5.0])
    v1 = write_delta(rd.from_arrow(t1), tbl)
    assert v1 == 1

    got = _sorted_pd(read_delta(tbl))
    want = _sorted_pd(pa.concat_tables([t0, t1]))
    pd.testing.assert_frame_equal(got, want)

    # time travel: version 0 sees only the first commit
    got0 = _sorted_pd(read_delta(tbl, version=0))
    pd.testing.assert_frame_equal(got0, _sorted_pd(t0))

    hist = delta_history(tbl)
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[0]["operation"] == "WRITE"


def test_overwrite_removes_prior_files(tmp_path, ray_session):
    import pandas as pd

    tbl = str(tmp_path / "t")
    write_delta(rd.from_arrow(_t([1, 2], ["a", "b"], [1.0, 2.0])), tbl)
    t2 = _t([9], ["z"], [9.0])
    v = write_delta(rd.from_arrow(t2), tbl, mode="overwrite")
    assert v == 1
    pd.testing.assert_frame_equal(_sorted_pd(read_delta(tbl)), _sorted_pd(t2))
    # the old data is still reachable by time travel
    assert len(_sorted_pd(read_delta(tbl, version=0))) == 2
    # log carries explicit remove actions
    log = open(os.path.join(tbl, "_delta_log",
                            f"{1:020d}.json")).read()
    assert '"remove"' in log


def test_partitioned_write_layout_and_pruning(tmp_path, ray_session):
    tbl = str(tmp_path / "t")
    t = _t([1, 2, 3, 4], ["a", "b", "a", "c"], [1.0, 2.0, 3.0, 4.0])
    write_delta(rd.from_arrow(t), tbl, partition_by=["label"])
    # hive layout on disk; partition column NOT inside the data files
    files = []
    for root, _, names in os.walk(tbl):
        files += [os.path.join(root, n) for n in names
                  if n.endswith(".parquet") and "_delta_log" not in root]
    assert all("label=" in f for f in files)
    import pyarrow.parquet as pq

    assert "label" not in pq.read_schema(files[0]).names

    got = _sorted_pd(read_delta(tbl))
    assert got["label"].tolist() == ["a", "b", "a", "c"]

    # pruning: filters={'label': 'a'} must plan ONLY the a-partition files
    pruned = read_delta(tbl, filters={"label": "a"})
    out = _sorted_pd(pruned)
    assert out["id"].tolist() == [1, 3]
    assert collect_arrow(read_delta(tbl, filters={"label": ["b", "c"]})) \
        .num_rows == 2


def test_column_projection(tmp_path, ray_session):
    tbl = str(tmp_path / "t")
    write_delta(rd.from_arrow(_t([1, 2], ["a", "b"], [1.0, 2.0])), tbl,
                partition_by=["label"])
    got = collect_arrow(read_delta(tbl, columns=["id", "label"]))
    assert got.column_names == ["id", "label"]
    got2 = collect_arrow(read_delta(tbl, columns=["id", "val"]))
    assert got2.column_names == ["id", "val"]


def test_checkpoint_equivalence(tmp_path, ray_session):
    import pandas as pd

    tbl = str(tmp_path / "t")
    for i in range(4):
        write_delta(rd.from_arrow(_t([i], [f"l{i % 2}"], [float(i)])), tbl)
    before = _sorted_pd(read_delta(tbl))
    v = checkpoint_delta_table(tbl)
    assert v == 3
    assert os.path.exists(os.path.join(tbl, "_delta_log",
                                       f"{3:020d}.checkpoint.parquet"))
    # same snapshot through the checkpoint path
    pd.testing.assert_frame_equal(_sorted_pd(read_delta(tbl)), before)
    # a post-checkpoint commit replays as checkpoint + tail
    write_delta(rd.from_arrow(_t([99], ["z"], [99.0])), tbl)
    after = _sorted_pd(read_delta(tbl))
    assert len(after) == len(before) + 1
    # time travel BELOW the checkpoint still works (pure JSON replay)
    assert len(_sorted_pd(read_delta(tbl, version=1))) == 2


def test_concurrent_commit_race(tmp_path, ray_session):
    tbl = str(tmp_path / "t")
    write_delta(rd.from_arrow(_t([1], ["a"], [1.0])), tbl)
    # another writer claims version 1 out from under us
    _commit(tbl, 1, [{"commitInfo": {"operation": "WRITE"}}])
    with pytest.raises(DeltaConcurrentCommit):
        _commit(tbl, 1, [{"commitInfo": {"operation": "WRITE"}}])
    # write_delta sees version 1 taken and commits 2
    v = write_delta(rd.from_arrow(_t([2], ["b"], [2.0])), tbl)
    assert v == 2


def test_unsupported_types_rejected(tmp_path, ray_session):
    bad = pa.table({"l": pa.array([[1]], pa.list_(pa.int64()))})
    with pytest.raises(TypeError, match="Delta-unsupported"):
        write_delta(rd.from_arrow(bad), str(tmp_path / "t"))
    ok = _t([1], ["a"], [1.0])
    with pytest.raises(TypeError, match="partition column"):
        write_delta(rd.from_arrow(ok), str(tmp_path / "t2"),
                    partition_by=["val"])


def test_idempotent_data_files(tmp_path, ray_session):
    """Content-hashed names: re-writing identical data adds no new data
    files (the second commit's adds point at the same paths)."""
    tbl = str(tmp_path / "t")
    t = _t([1, 2], ["a", "b"], [1.0, 2.0])
    write_delta(rd.from_arrow(t), tbl)
    log0 = open(os.path.join(tbl, "_delta_log", f"{0:020d}.json")).read()
    write_delta(rd.from_arrow(t), tbl)
    log1 = open(os.path.join(tbl, "_delta_log", f"{1:020d}.json")).read()
    p0 = {json.loads(x)["add"]["path"] for x in log0.splitlines()
          if '"add"' in x}
    p1 = {json.loads(x)["add"]["path"] for x in log1.splitlines()
          if '"add"' in x}
    assert p0 == p1  # same content -> same shard names -> no duplicates


def test_partitioned_checkpoint_and_pruning(tmp_path, ray_session):
    tbl = str(tmp_path / "t")
    for i in range(3):
        write_delta(rd.from_arrow(_t([i], [f"l{i % 2}"], [float(i)])), tbl,
                    partition_by=["label"])
    checkpoint_delta_table(tbl)
    write_delta(rd.from_arrow(_t([7], ["l1"], [7.0])), tbl,
                partition_by=["label"])
    got = _sorted_pd(read_delta(tbl, filters={"label": "l1"}))
    assert got["id"].tolist() == [1, 7]


def test_vacuum_orphans_and_retention(tmp_path, ray_session):
    import pandas as pd

    tbl = str(tmp_path / "t")
    write_delta(rd.from_arrow(_t([1], ["a"], [1.0])), tbl)
    write_delta(rd.from_arrow(_t([2], ["b"], [2.0])), tbl, mode="overwrite")
    write_delta(rd.from_arrow(_t([3], ["c"], [3.0])), tbl)
    # plant a crashed writer's OLD orphan tmp (backdated past the grace
    # period) and a FRESH tmp simulating a concurrent writer's in-flight file
    open(os.path.join(tbl, "orphan-deadbeef-1.parquet"), "wb").write(b"x")
    old_tmp = os.path.join(tbl, ".part-x.tmp-123")
    open(old_tmp, "wb").write(b"x")
    os.utime(old_tmp, (time.time() - 3600, time.time() - 3600))
    fresh_tmp = os.path.join(tbl, ".part-y.tmp-456")
    open(fresh_tmp, "wb").write(b"x")

    from monocator_ray.sources.delta import vacuum_delta_table

    before = _sorted_pd(read_delta(tbl))
    v0_data = _sorted_pd(read_delta(tbl, version=0))
    deleted = vacuum_delta_table(tbl)  # keep all versions
    # orphan + stale tmp gone; in-flight tmp survives; every version readable
    assert any("orphan-" in d for d in deleted)
    assert old_tmp in deleted
    assert os.path.exists(fresh_tmp)  # grace period protects live writers
    os.remove(fresh_tmp)
    pd.testing.assert_frame_equal(_sorted_pd(read_delta(tbl)), before)
    pd.testing.assert_frame_equal(_sorted_pd(read_delta(tbl, version=0)),
                                  v0_data)

    # retention: keep newest 2 versions -> version-0's overwritten file dies
    deleted = vacuum_delta_table(tbl, keep_versions=2)
    assert any(d.endswith(".json") for d in deleted)  # old commit dropped
    assert any(d.endswith(".parquet") and "_delta_log" not in d
               for d in deleted)  # id=1's file only lived in dropped history
    pd.testing.assert_frame_equal(_sorted_pd(read_delta(tbl)), before)
    with pytest.raises(ValueError):
        read_delta(tbl, version=0)  # below the horizon: gone
    # the retained tail still replays through the horizon checkpoint
    assert _sorted_pd(read_delta(tbl, version=1))["id"].tolist() == [2]


def test_concurrent_writers_threaded(tmp_path, ray_session):
    """Eight threads race append commits through write_delta_retrying:
    every append must land (distinct versions, no lost rows)."""
    import threading

    from monocator_ray.sources.delta import write_delta_retrying

    tbl = str(tmp_path / "t")
    write_delta(rd.from_arrow(_t([0], ["seed"], [0.0])), tbl)
    versions, errs = [], []

    def writer(i):
        try:
            t = _t([100 + i], [f"w{i}"], [float(i)])
            versions.append(write_delta_retrying(rd.from_arrow(t), tbl))
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert sorted(versions) == list(range(1, 9))  # distinct, dense
    got = _sorted_pd(read_delta(tbl))
    assert got["id"].tolist() == [0] + [100 + i for i in range(8)]


def test_schema_evolution_append(tmp_path, ray_session):
    """Appending new columns evolves the table schema (metaData action in
    the commit); older files read back null-filled.  An increment MISSING
    a column is also fine (its files just omit it).  Type conflicts and
    partition-spec changes error."""
    tbl = str(tmp_path / "t")
    write_delta(rd.from_arrow(pa.table({"id": pa.array([1], pa.int64())})),
                tbl)
    # evolve: add a column
    write_delta(rd.from_arrow(pa.table({
        "id": pa.array([2], pa.int64()),
        "extra": pa.array(["x"], pa.string())})), tbl)
    got = _sorted_pd(read_delta(tbl))
    assert got["id"].tolist() == [1, 2]
    assert got["extra"].tolist()[0] is None and got["extra"].tolist()[1] == "x"
    # increment missing a column: nulls for its rows
    write_delta(rd.from_arrow(pa.table({"id": pa.array([3], pa.int64())})),
                tbl)
    got = _sorted_pd(read_delta(tbl))
    assert got["extra"].tolist() == [None, "x", None]
    # type conflict errors
    with pytest.raises(TypeError, match="conflicts"):
        write_delta(rd.from_arrow(pa.table(
            {"id": pa.array(["s"], pa.string())})), tbl)
    # projection of only the evolved column still null-fills
    from monocator_ray.stages.grouped import collect_arrow

    only = collect_arrow(read_delta(tbl, columns=["extra"]))
    assert sorted(x is None for x in only["extra"].to_pylist()) == \
        [False, True, True]


def test_bool_partition_roundtrip_and_pruning(tmp_path, ray_session):
    """Booleans serialize lowercase per the Delta PROTOCOL; reads must
    round-trip the value and partition filters must prune correctly
    (regression: str(True) -> "True" read every row back as False)."""
    tbl = str(tmp_path / "t")
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "flag": pa.array([True, False, True, False], pa.bool_()),
    })
    write_delta(rd.from_arrow(t), tbl, partition_by=["flag"])

    got = collect_arrow(read_delta(tbl)).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert got["flag"].tolist() == [True, False, True, False]

    hot = collect_arrow(read_delta(tbl, filters={"flag": True})).to_pandas()
    assert sorted(hot["id"].tolist()) == [1, 3]
    # on-disk directory names are lowercase per spec
    assert os.path.isdir(os.path.join(tbl, "flag=true"))
    assert os.path.isdir(os.path.join(tbl, "flag=false"))

    # legacy tables written with "True" directories still read as True
    from monocator_ray.sources.delta import _typed_partition_scalar
    assert _typed_partition_scalar("True", pa.bool_()) is True
    assert _typed_partition_scalar("false", pa.bool_()) is False


def test_checkpoint_carries_protocol_action(tmp_path, ray_session):
    """The PROTOCOL requires checkpoints to contain the table's protocol
    so foreign readers starting replay from _last_checkpoint see it."""
    import pyarrow.parquet as pq

    tbl = str(tmp_path / "t")
    write_delta(rd.from_arrow(_t([1], ["a"], [1.0])), tbl)
    write_delta(rd.from_arrow(_t([2], ["b"], [2.0])), tbl)
    v = checkpoint_delta_table(tbl)

    cpt = pq.read_table(os.path.join(
        tbl, "_delta_log", f"{v:020d}.checkpoint.parquet"))
    assert "protocol" in cpt.schema.names
    protos = [r["protocol"] for r in cpt.to_pylist() if r.get("protocol")
              and r["protocol"].get("minReaderVersion") is not None]
    assert protos == [{"minReaderVersion": 1, "minWriterVersion": 2}]
    # and the engine's own replay still works through this checkpoint
    got = collect_arrow(read_delta(tbl)).to_pandas() \
        .sort_values("id")["id"].tolist()
    assert got == [1, 2]
