"""Full driver-flow rehearsal (VERDICT r2 next-steps #9): run EVERY
registered query and compare the oracle-backed ones against DuckDB the way
the graft driver does — sort columns by name, sort rows, exact value
compare (rtol=0; floats pre-rounded to 6 to absorb representation noise
only).  One command reproduces CORRECTNESS_r{N} end to end:

    python -m monocator_ray rehearse [--sf-dir DIR] [--names a,b,...]

The in-repo pytest gate (tests/test_queries_oracle.py) runs the same
comparison per query; this module is the one the pytest gate can't replace
— it runs under the DRIVER's import flow (ray.init first, package shipped
by value), which is the only flow that catches worker-side lazy-import
bugs (hit three times in round 2)."""

from __future__ import annotations

import json
import time

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(obj):
    import pyarrow as pa

    import ray.data as rd

    from monocator_ray.stages.grouped import collect_arrow

    if isinstance(obj, rd.Dataset):
        return collect_arrow(obj).to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df):
    df = df[sorted(df.columns)]
    # round BEFORE sorting: sorting on raw floats can order representation-
    # noise ties differently on the two sides, misaligning rows that are
    # equal under the stated tolerance (code-review r3 finding #6)
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def rehearse(sf_dir: str = "/root/testdata/sf0.01", names: list[str] | None = None,
             quiet: bool = False) -> dict[str, dict]:
    """Run every registry query (optionally a subset) over ``sf_dir``;
    returns {name: {"status": MATCH|ROWS_ONLY|FAIL, "rows": n, "sec": s,
    "detail": str|None}} and prints one line per query unless quiet."""
    import duckdb
    import pandas as pd

    from monocator_ray.pipelines.registry import REGISTRY
    from monocator_ray.shipping import ensure_shipped

    ensure_shipped()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out: dict[str, dict] = {}
    if names:
        # a typo'd --names must not silently pass with zero queries run
        # (code-review r3 finding #2)
        unknown = sorted(set(names) - set(REGISTRY))
        if unknown:
            raise SystemExit(f"unknown query names: {', '.join(unknown)}")
    items = [(n, v) for n, v in REGISTRY.items() if not names or n in names]
    for name, (fn, sql) in items:
        t0 = time.monotonic()
        detail = None
        try:
            got = _normalize(_to_pandas(fn(sf_dir)))
            rows = len(got)
            if sql is None:
                status = "ROWS_ONLY"
            else:
                want = _normalize(con.execute(sql).df())
                if list(got.columns) != list(want.columns):
                    status, detail = "FAIL", f"columns {list(got.columns)} != {list(want.columns)}"
                elif len(got) != len(want):
                    status, detail = "FAIL", f"rowcount {len(got)} != {len(want)}"
                else:
                    try:
                        pd.testing.assert_frame_equal(
                            got, want, check_dtype=False, rtol=0, atol=1e-6
                        )
                        status = "MATCH"
                    except AssertionError as e:
                        status, detail = "FAIL", str(e).replace("\n", " ")[:400]
        except Exception as e:  # noqa: BLE001 — a rehearsal must not abort
            status, rows, detail = "ERROR", 0, f"{type(e).__name__}: {e}"
        sec = time.monotonic() - t0
        out[name] = {"status": status, "rows": rows, "sec": round(sec, 2),
                     "detail": detail}
        if not quiet:
            line = f"{name:36s} {status:9s} rows={rows:<8d} {sec:6.2f}s"
            print(line + (f"  {detail}" if detail else ""), flush=True)
    if not quiet:
        counts: dict[str, int] = {}
        for r in out.values():
            counts[r["status"]] = counts.get(r["status"], 0) + 1
        print(json.dumps({"total": len(out), **counts}))
    return out
