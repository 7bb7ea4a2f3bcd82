"""Kernel tests for stages/joins.py (as-of + range join) against
brute-force Python oracles on adversarial data: duplicate timestamps
(tiebreak path), keys present on only one side, empty right side, and
several partition counts (a key's rows must land wholly in one partition
for either kernel to be exact)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from monocator_ray.stages.joins import asof_join, range_join_count


def _mk_sides(seed: int, n_left: int = 400, n_right: int = 300, n_keys: int = 12):
    """Timestamps drawn from a COARSE grid so ties are common."""
    rng = np.random.RandomState(seed)
    base = np.datetime64("2024-01-01", "us")
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_left, dtype=np.int64),
            "user_id": rng.randint(0, n_keys, n_left).astype(np.int64),
            "ts": base + rng.randint(0, 50, n_left).astype("timedelta64[m]").astype("timedelta64[us]"),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": rng.randint(0, n_keys + 4, n_right).astype(np.int64),  # some keys only on right
            "ts": base + rng.randint(0, 50, n_right).astype("timedelta64[m]").astype("timedelta64[us]"),
            "event_id": np.arange(1000, 1000 + n_right, dtype=np.int64),
            "val": rng.randint(0, 10_000, n_right).astype(np.int64),
        }
    )
    # a key with NO right rows at all
    left.loc[left.index[:20], "user_id"] = n_keys + 100
    return left, right


def _asof_oracle(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    out = []
    for _, e in left.iterrows():
        cand = right[(right.user_id == e.user_id) & (right.ts <= e.ts)]
        if len(cand):
            best = cand.sort_values(["ts", "event_id"]).iloc[-1]
            out.append((e.event_id, best.val))
        else:
            out.append((e.event_id, None))
    return pd.DataFrame(out, columns=["event_id", "val"]).astype({"event_id": np.int64})


def _range_oracle(left: pd.DataFrame, right: pd.DataFrame, lo, hi) -> pd.DataFrame:
    out = []
    for _, e in left.iterrows():
        cand = right[(right.user_id == e.user_id) & (right.ts > e.ts + lo) & (right.ts <= e.ts + hi)]
        out.append((e.event_id, len(cand)))
    return pd.DataFrame(out, columns=["event_id", "n"]).astype(np.int64)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed,num_parts", [(1, 1), (2, 7), (3, 64)])
def test_asof_join_matches_bruteforce(seed, num_parts):
    left, right = _mk_sides(seed)
    got = (
        asof_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            key="user_id",
            on="ts",
            left_cols={"event_id": pa.int64()},
            value_cols={"val": pa.int64()},
            tiebreak="event_id",
            num_parts=num_parts,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = _asof_oracle(left, right)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["val"].astype("float64"), want["val"].astype("float64"), check_names=False
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed,num_parts", [(4, 1), (5, 64)])
def test_range_join_count_matches_bruteforce(seed, num_parts):
    left, right = _mk_sides(seed)
    lo, hi = np.timedelta64(0, "m"), np.timedelta64(10, "m")
    got = (
        range_join_count(
            rd.from_pandas(left),
            rd.from_pandas(right.drop(columns=["event_id", "val"])),
            key="user_id",
            on="ts",
            lo=lo,
            hi=hi,
            left_cols={"event_id": pa.int64()},
            count_name="n",
            num_parts=num_parts,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = _range_oracle(left, right, lo, hi)
    assert got["n"].tolist() == want["n"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_joins_with_empty_right_side():
    left, right = _mk_sides(9)
    empty = right.iloc[:0]
    a = asof_join(
        rd.from_pandas(left), rd.from_pandas(empty),
        key="user_id", on="ts",
        left_cols={"event_id": pa.int64()}, value_cols={"val": pa.int64()},
        tiebreak="event_id",
    ).to_pandas()
    assert len(a) == len(left) and a["val"].isna().all()
    r = range_join_count(
        rd.from_pandas(left), rd.from_pandas(empty.drop(columns=["event_id", "val"])),
        key="user_id", on="ts", lo=0, hi=10**9,
        left_cols={"event_id": pa.int64()}, count_name="n",
    ).to_pandas()
    assert len(r) == len(left) and (r["n"] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_full_outer_coverage_empty_side(tmp_path):
    """An empty side (no qualifying purchases) must not crash the full
    outer join; all users come from the click side with 0 purchases."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.relational import q_click_purchase_coverage

    n = 50
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                np.arange(n).astype("datetime64[s]").astype("datetime64[us]")
            ),
            "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([300.0] * n, pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    df = q_click_purchase_coverage(str(tmp_path)).to_pandas()
    assert len(df) == 5
    assert (df["n_purchases"] == 0).all()
    assert (df["n_clicks"] == 10).all()


# ---- salted equi-join (skew defense) ----
def _salted_ref(fact_pdf, dim_pdf):
    import pandas as pd

    return (fact_pdf.merge(dim_pdf, on="k", how="inner")
            .sort_values(["v", "d"]).reset_index(drop=True))


def test_salted_equi_join_planted_skew_matches_plain(ray_session):
    """90% of fact rows share ONE Zipf-head key; the salted plan must
    produce exactly the plain inner-join multiset, with auto-profiled AND
    explicit hot sets, at several salt factors."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from monocator_ray.stages.joins import salted_equi_join

    rng = np.random.default_rng(7)
    n = 20000
    k = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 100, n)).astype(np.int64)
    v = np.arange(n, dtype=np.int64)
    fact = pd.DataFrame({"k": k, "v": v})
    # dim covers 80 of the 100 keys (some fact rows must drop)
    dk = np.arange(0, 80, dtype=np.int64)
    dim = pd.DataFrame({"k": dk, "d": dk * 10})
    want = _salted_ref(fact, dim)

    fact_ds = rd.from_arrow(pa.Table.from_pandas(fact)).repartition(8)
    dim_ds = rd.from_arrow(pa.Table.from_pandas(dim))
    for hot in (None, [7], []):
        for factor in (1, 4):
            got = (salted_equi_join(
                fact_ds, dim_ds, key="k",
                fact_cols={"v": pa.int64()}, dim_cols={"d": pa.int64()},
                salt_factor=factor, num_parts=16, hot_keys=hot)
                .to_pandas().sort_values(["v", "d"]).reset_index(drop=True))
            pd.testing.assert_frame_equal(got[["v", "d"]], want[["v", "d"]],
                                          check_dtype=False), (hot, factor)


def test_salted_equi_join_spreads_hot_key(ray_session):
    """With an explicit hot key and factor F, the hot key's fact rows
    carry F distinct salt values (placement actually spreads)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from monocator_ray.stages.joins import salted_equi_join

    n = 4096
    fact = pd.DataFrame({"k": np.full(n, 7, np.int64),
                         "v": np.arange(n, dtype=np.int64)})
    dim = pd.DataFrame({"k": np.array([7], np.int64),
                        "d": np.array([70], np.int64)})
    got = salted_equi_join(
        rd.from_arrow(pa.Table.from_pandas(fact)).repartition(4),
        rd.from_arrow(pa.Table.from_pandas(dim)),
        key="k", fact_cols={"v": pa.int64()}, dim_cols={"d": pa.int64()},
        salt_factor=4, num_parts=16, hot_keys=[7]).to_pandas()
    # every fact row joined (dim replicated into every salt partition)
    assert len(got) == n and set(got["d"]) == {70}
