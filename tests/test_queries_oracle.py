"""Driver-style correctness gate (SURVEY.md §5.2 item 5): run every
registered Ray query AND its DuckDB oracle on the same parquet tables,
compare row count + column names + order-insensitive values."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _oracle_cases():
    import sys

    sys.path.insert(0, "/root/repo")
    from monocator_ray.pipelines.registry import REGISTRY

    return [(name, fn, sql) for name, (fn, sql) in REGISTRY.items() if sql is not None]


def _rows_only_cases():
    import sys

    sys.path.insert(0, "/root/repo")
    from monocator_ray.pipelines.registry import REGISTRY

    return [(name, fn) for name, (fn, sql) in REGISTRY.items() if sql is None]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name,fn,sql", _oracle_cases(), ids=[c[0] for c in _oracle_cases()])
def test_query_matches_duckdb_oracle(con, name, fn, sql):
    got = _normalize(_to_pandas(fn(SF_DIR)))
    want = _normalize(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rowcount {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, atol=1e-6)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name,fn", _rows_only_cases(), ids=[c[0] for c in _rows_only_cases()])
def test_rows_only_queries_run(name, fn):
    df = _to_pandas(fn(SF_DIR))
    assert df is not None
    assert len(df.columns) > 0
