"""Driver-style correctness gate (SURVEY.md §5.2 item 5): run every
registered Ray query AND its DuckDB oracle on the same parquet tables,
compare row count + column names + order-insensitive values."""

import duckdb
import pandas as pd
import pytest

# ONE comparison implementation shared with the driver-flow rehearse CLI
# (code-review r3 finding #5: a fix applied to only one copy would let the
# two gates silently diverge)
from monocator_ray.pipelines.rehearse import TABLES, _normalize, _to_pandas

SF_DIR = "/root/testdata/sf0.01"


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
    # rtol=0: the default relative tolerance (1e-5) silently passes
    # 14-digit integer sums that differ by 10^7 — the driver's value-hash
    # gate is exact, so this gate must be too (floats are pre-rounded in
    # _normalize; atol only absorbs that representation noise)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=0, atol=1e-6)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name,fn", _rows_only_cases(), ids=[c[0] for c in _rows_only_cases()])
def test_rows_only_queries_run(name, fn):
    df = _to_pandas(fn(SF_DIR))
    assert df is not None
    assert len(df.columns) > 0


@pytest.mark.usefixtures("ray_session")
def test_tokenizer_oracle_parity_on_non_ascii_whitespace(tmp_path):
    """Python's \\s is Unicode (NBSP etc.); DuckDB's RE2 \\s is ASCII.  The
    engine pins its tokenizer to the RE2 class (ADVICE r1) — this fixture
    has NBSP / thin-space / ideographic-space mid-text and must match the
    oracle exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray.pipelines.registry import REGISTRY

    texts = [
        "the\u00a0cat and dog",  # NBSP joins the first two words
        "thin\u2009space the end",  # thin space
        "ideo\u3000graphic of it",  # ideographic space
        "plain ascii the of and",
        "the\u00a0cat and dog",  # exact dup of row 0
        "padded\tthe\nof and",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    for name in ("token_stats", "quality_stats", "dedup_exact"):
        fn, sql = REGISTRY[name]
        got = _normalize(_to_pandas(fn(str(tmp_path))))
        want = _normalize(c.execute(sql).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, atol=1e-6)
