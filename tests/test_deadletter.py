"""DeadLetter poison-row isolation (stages/deadletter.py): exact
quarantine, unharmed good rows, O(k log n) bisection cost, Ray-level
streaming behavior."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from monocator_ray.stages.deadletter import DeadLetter, read_quarantine

POISON = {13, 77}


def make_fn(calls: list):
    def fn(t: pa.Table) -> pa.Table:
        calls.append(t.num_rows)
        v = t["v"].to_numpy(zero_copy_only=False)
        if np.isin(v, list(POISON)).any():
            raise ValueError(f"poison in {sorted(set(v) & POISON)}")
        return pa.table({"v2": pa.array(v * 2, pa.int64())})

    return fn


def test_poison_rows_quarantined_exactly(tmp_path):
    calls: list[int] = []
    stage = DeadLetter(make_fn(calls), str(tmp_path / "q"), "double")
    t = pa.table({"v": pa.array(list(range(100)), pa.int64())})
    out = stage(t)
    assert sorted(out["v2"].to_pylist()) == sorted(
        v * 2 for v in range(100) if v not in POISON)
    q = read_quarantine(str(tmp_path / "q"))
    assert sorted(q["v"].to_pylist()) == sorted(POISON)
    assert all("poison" in e for e in q["_dl_error"].to_pylist())
    assert set(q["_dl_stage"].to_pylist()) == {"double"}


def test_bisection_cost_is_logarithmic(tmp_path):
    calls: list[int] = []
    stage = DeadLetter(make_fn(calls), str(tmp_path / "q"))
    n = 1024
    stage(pa.table({"v": pa.array(list(range(n)), pa.int64())}))
    # 2 poison rows in 1024: k*2*log2(n) bound with slack, NOT O(n)
    assert len(calls) <= 2 * 2 * 11 + 4, len(calls)


def test_clean_batch_costs_one_call(tmp_path):
    calls: list[int] = []
    stage = DeadLetter(make_fn(calls), str(tmp_path / "q"))
    stage(pa.table({"v": pa.array([1, 2, 3], pa.int64())}))
    assert calls == [3]
    assert read_quarantine(str(tmp_path / "q")).num_rows == 0


def test_all_poison_batch(tmp_path):
    calls: list[int] = []
    stage = DeadLetter(make_fn(calls), str(tmp_path / "q"))
    out = stage(pa.table({"v": pa.array([13, 77], pa.int64())}))
    assert out.num_rows == 0
    assert read_quarantine(str(tmp_path / "q")).num_rows == 2


def test_ray_pipeline_keeps_streaming(tmp_path, ray_session):
    import ray.data as rd

    from monocator_ray.shipping import ensure_shipped
    from monocator_ray.stages.grouped import collect_arrow

    ensure_shipped()
    qdir = str(tmp_path / "q")
    ds = rd.from_arrow(
        pa.table({"v": pa.array(list(range(200)), pa.int64())})
    ).repartition(4)
    calls: list[int] = []
    out = collect_arrow(ds.map_batches(
        DeadLetter(make_fn(calls), qdir), batch_format="pyarrow"))
    assert out.num_rows == 198
    q = read_quarantine(qdir)
    assert sorted(q["v"].to_pylist()) == sorted(POISON)


def test_zero_row_batch_with_raising_fn(tmp_path):
    """A fn that raises on an EMPTY batch must not crash the wrapper
    (regression: 0-row dead table paired with 1 error string made
    _quarantine's append_column raise an Arrow length mismatch)."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            raise ValueError("cannot handle empty")
        return pa.table({"v2": pa.array(
            t["v"].to_numpy(zero_copy_only=False) * 2, pa.int64())})

    stage = DeadLetter(fn, str(tmp_path / "q"))
    out = stage(pa.table({"v": pa.array([], pa.int64())}))
    assert out.num_rows == 0
    assert read_quarantine(str(tmp_path / "q")).num_rows == 0
