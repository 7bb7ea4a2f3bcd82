"""WARC ingestion (Common-Crawl-native source) and the CLI surface."""

import json
import subprocess
import sys

import pytest


@pytest.mark.usefixtures("ray_session")
def test_warc_to_pages_pipeline(tmp_path):
    from monocator_ray.shipping import ensure_shipped
    from monocator_ray.sources.pages import fill_text
    from monocator_ray.sources.warc import read_warc, write_warc

    ensure_shipped()
    recs = [
        ("http://a.example/p0", "2026-01-02T00:00:00Z",
         b"<html><body><p>hello  warc&nbsp;world</p><script>x=1</script></body></html>"),
        ("http://b.example/p1", "2026-01-02T00:01:00Z", b"<html><body>second page</body></html>"),
    ]
    f1 = tmp_path / "a.warc"
    f2 = tmp_path / "b.warc.gz"
    write_warc(recs[:1], str(f1))
    write_warc(recs[1:], str(f2), compress=True)
    ds = read_warc([str(f1), str(f2)])
    out = fill_text(ds).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(out["url"]) == ["http://a.example/p0", "http://b.example/p1"]
    assert out["text"][0] == "hello warc world"  # extraction contract applied
    assert out["text"][1] == "second page"
    assert str(out["warc_ts"][0]).startswith("2026-01-02")


def test_cli_synth_visit_report(tmp_path):
    """Drive the real CLI in subprocesses (each owns its Ray session)."""
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "monocator_ray", "--num-cpus", "4", *args],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    web = tmp_path / "web"
    out = tmp_path / "out"
    s = run("synth", "--dest", str(web), "--pages", "150", "--hosts", "5", "--buckets", "2")
    assert s["pages"] == 150
    v = run("visit", "--domain", "host0.example", "--pages", str(web),
            "--out", str(out), "--max-pages", "5", "--buckets", "2")
    assert 0 < v["fetched"] <= 5
    rep = run("report", "--out", str(out))
    assert rep["fetched"] == v["fetched"]
    assert rep["seen_except_frontier"] == 0
    # full-crawl subcommand, async frontier mode via the CLI flag
    seeds = tmp_path / "seeds.txt"
    seeds.write_text("http://host0.example/\nhttp://host1.example/\n")
    c = run("crawl", "--seeds", str(seeds), "--pages", str(web),
            "--out", str(tmp_path / "out_async"), "--budget", "64",
            "--shards", "2", "--buckets", "2", "--async-rounds", "2")
    assert c["fetched"] > 0 and c["seen"] >= c["fetched"]

def test_export_warc_roundtrip(tmp_path, ray_session):
    """pages Dataset -> distributed WARC export -> read_warc == identity
    on (url, warc_ts, html); manifest counts cover every row."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from monocator_ray.schemas import PAGES
    from monocator_ray.shipping import ensure_shipped
    from monocator_ray.sources.warc import export_warc, read_warc

    ensure_shipped()
    n = 37
    urls = [f"http://h{i % 5}.example/p{i}" for i in range(n)]
    ts = np.array([np.datetime64("2026-01-02T03:04:05.123456") + np.timedelta64(i, "s")
                   for i in range(n)], dtype="datetime64[us]")
    htmls = [f"<html><body>page {i} &amp; more</body></html>".encode() for i in range(n)]
    pages = pa.Table.from_arrays(
        [pa.array(urls, pa.string()),
         pa.Array.from_pandas(ts, type=pa.timestamp("us")),
         pa.array(htmls, pa.binary()),
         pa.array([""] * n, pa.string()),
         pa.array([""] * n, pa.string())],
        schema=PAGES,
    )
    out_dir = str(tmp_path / "warc_out")
    manifest = export_warc(rd.from_arrow(pages).repartition(4), out_dir).to_pandas()
    assert manifest["n_records"].sum() == n
    assert len(manifest) == len(set(manifest["path"]))  # distinct member files

    back = read_warc([str(tmp_path / "warc_out" / p) for p in manifest["path"]])
    got = back.to_pandas().sort_values("url").reset_index(drop=True)
    want = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["warc_ts"]) == list(want["warc_ts"])  # exact us roundtrip
    assert [bytes(b) for b in got["html"]] == [bytes(b) for b in want["html"]]



def test_cli_warc_import_export(tmp_path, ray_session):
    """CLI: warc-import -> parquet -> warc-export -> re-import preserves
    every (url, html) pair."""
    import json

    from monocator_ray.__main__ import main
    from monocator_ray.sources.warc import parse_warc_bytes, write_warc

    recs = [(f"http://cli{i}.example/p", "2026-02-03T00:00:00Z",
             f"<html><body>cli page {i}</body></html>".encode()) for i in range(6)]
    src = tmp_path / "in.warc.gz"
    write_warc(recs, str(src), compress=True)

    pq_dir = str(tmp_path / "pages_pq")
    assert main(["warc-import", "--warc", str(src), "--out", pq_dir]) == 0
    out_dir = str(tmp_path / "warc_out")
    assert main(["warc-export", "--pages", pq_dir, "--out", out_dir]) == 0

    import os

    back = []
    for name in os.listdir(out_dir):
        with open(os.path.join(out_dir, name), "rb") as f:
            back.extend(parse_warc_bytes(f.read()))
    got = sorted((u, bytes(b)) for u, _ts, b in back)
    want = sorted((u, b) for u, _d, b in recs)
    assert got == want


def test_cli_query(tmp_path):
    """`query` subcommand: list mode needs no Ray; run mode executes a
    registry pipeline and can write parquet."""
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}

    r = subprocess.run(
        [sys.executable, "-m", "monocator_ray", "query"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = dict(l.split("\t") for l in r.stdout.strip().splitlines())
    assert lines["pricing_summary"] == "sql-oracle"
    assert lines["ann_topk"] == "rows-only"

    out = str(tmp_path / "split.parquet")
    r = subprocess.run(
        [sys.executable, "-m", "monocator_ray", "--num-cpus", "4", "query",
         "dataset_split", "--sf-dir", "/root/testdata/sf0.001", "--out", out],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] > 0
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert set(t.column_names) == {"split", "lang", "n_docs"}

    r = subprocess.run(
        [sys.executable, "-m", "monocator_ray", "query", "nope"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert r.returncode == 2

    # --explain prints the LAZY operator plan without executing
    r = subprocess.run(
        [sys.executable, "-m", "monocator_ray", "--num-cpus", "4", "query",
         "event_unpivot", "--sf-dir", "/root/testdata/sf0.001", "--explain"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MapBatches" in r.stdout and "Sort" in r.stdout
    assert json.loads(r.stdout.strip().splitlines()[-1])["plan"] == "lazy-dataset"


@pytest.mark.usefixtures("ray_session")
def test_export_jsonl_roundtrip(tmp_path):
    """documents -> sharded .jsonl.gz -> read back: same rows/values; the
    binary/timestamp guard raises instead of mangling."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from monocator_ray.sources.jsonl import export_jsonl, read_jsonl

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    out = str(tmp_path / "corpus")
    manifest = export_jsonl(ds, out).to_pandas()
    assert manifest["n_records"].sum() == ds.count()
    back = read_jsonl(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[sorted(back.columns)], want[sorted(want.columns)])

    bad = rd.from_arrow(pa.table({"b": pa.array([b"x"], pa.binary())}))
    with pytest.raises(Exception) as ei:
        export_jsonl(bad, str(tmp_path / "bad")).materialize()
    assert "JSON-unfriendly" in str(ei.value)


def test_cli_corpus_end_to_end(tmp_path):
    """One command: crawl -> curate -> JSONL shards; the shards read back
    as curated docs (exact dedup + token gate applied)."""
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}

    def run(*args):
        r = subprocess.run(
            [sys.executable, "-m", "monocator_ray", "--num-cpus", "4", *args],
            capture_output=True, text=True, env=env, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    web = tmp_path / "web"
    run("synth", "--dest", str(web), "--pages", "200", "--hosts", "5",
        "--buckets", "2")
    seeds = tmp_path / "seeds.txt"
    # URL seeds: the synth store serves /p0.. pages, not host roots
    seeds.write_text("".join(f"http://host{i}.example/p0\n" for i in range(5)))
    out = run("corpus", "--seeds", str(seeds), "--pages", str(web),
              "--out", str(tmp_path / "crawl"), "--corpus", str(tmp_path / "jsonl"),
              "--shards", "2", "--buckets", "2", "--budget", "64")
    assert out["fetched"] > 50
    assert out["corpus_docs"] > 0 and out["shards"] >= 1

    import ray.data as rd

    from monocator_ray.sources.jsonl import read_jsonl

    back = read_jsonl(str(tmp_path / "jsonl")).to_pandas()
    assert len(back) == out["corpus_docs"]
    assert {"doc_id", "text"} <= set(back.columns)
    assert back["doc_id"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_export_csv_roundtrip(tmp_path):
    """documents -> sharded CSV -> read back with a pinned schema: same
    rows/values incl. multi-line quoted text; the binary guard raises."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from monocator_ray.sources.csvio import export_csv, read_csv_dir

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    out = str(tmp_path / "csv")
    manifest = export_csv(ds, out).to_pandas()
    assert manifest["n_records"].sum() == ds.count()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string())])
    back = read_csv_dir(out, schema=schema).to_pandas()
    back = back.sort_values("doc_id").reset_index(drop=True)
    want = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    # CSV null-lossiness contract: nulls come back as empty strings
    want["text"] = want["text"].fillna("")
    pd.testing.assert_frame_equal(back[sorted(back.columns)], want[sorted(want.columns)])

    # planted fixture: embedded newlines / quotes / delimiters must survive
    tricky = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(['line one\nline "two", with comma',
                          "trailing space \t tab"], pa.string()),
    })
    tdir = str(tmp_path / "tricky")
    export_csv(rd.from_arrow(tricky), tdir).materialize()
    tback = read_csv_dir(
        tdir, schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(tback, tricky.to_pandas())

    bad = rd.from_arrow(pa.table({"b": pa.array([b"x"], pa.binary())}))
    with pytest.raises(Exception) as ei:
        export_csv(bad, str(tmp_path / "bad")).materialize()
    assert "CSV-unfriendly" in str(ei.value)


@pytest.mark.usefixtures("ray_session")
def test_export_ipc_roundtrip(tmp_path):
    """Arrow IPC shards round-trip EXACTLY, including binary and timestamp
    columns CSV/JSONL reject."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from monocator_ray.sources.csvio import export_ipc, read_ipc

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([b"\x00\xff", b"", b"abc"], pa.binary()),
        "ts": pa.array(
            pd.to_datetime(["2026-01-01", "2026-01-02", "2026-01-03"]),
            pa.timestamp("us")),
    })
    out = str(tmp_path / "ipc")
    manifest = export_ipc(rd.from_arrow(t), out).to_pandas()
    assert manifest["n_records"].sum() == 3
    back = read_ipc(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, want)


@pytest.mark.usefixtures("ray_session")
def test_export_orc_roundtrip(tmp_path):
    """ORC shards round-trip values exactly (ints, strings, binary, lists,
    nulls); timestamps widen to ns and the pinned read schema casts back."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from monocator_ray.sources.csvio import export_orc, read_orc_dir

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "payload": pa.array([b"\x00\xff", None, b"abc"], pa.binary()),
        "text": pa.array(["a\nb", "c,d", None], pa.string()),
        "emb": pa.array([[1.0, 2.0], [], None], pa.list_(pa.float32())),
        "ts": pa.array(
            pd.to_datetime(["2026-01-01", "2026-01-02", "2026-01-03"]),
            pa.timestamp("us")),
    })
    out = str(tmp_path / "orc")
    manifest = export_orc(rd.from_arrow(t), out).to_pandas()
    assert manifest["n_records"].sum() == 3
    assert all(p.endswith(".orc") for p in manifest["path"])
    # without a schema, ts comes back ns (the documented widening)
    raw = read_orc_dir(out)
    assert dict(zip(raw.schema().names, raw.schema().types))["ts"] == pa.timestamp("ns")
    # with the original schema, the roundtrip is exact (collect as Arrow:
    # Ray's to_pandas would try a tensor-extension cast on the ragged list)
    from monocator_ray.stages.grouped import collect_arrow

    back_t = collect_arrow(read_orc_dir(out, schema=t.schema))
    order = pa.compute.sort_indices(back_t["doc_id"])
    back_t = back_t.take(order).select(t.column_names).combine_chunks()
    assert back_t.equals(t), f"\n{back_t.to_pylist()}\n!=\n{t.to_pylist()}"


@pytest.mark.usefixtures("ray_session")
def test_duckdb_export_per_entity_tables(tmp_path):
    """Crawl artifacts -> the reference's DuckDB persistence layout
    (/root/reference/.gitignore:40): one table per entity, row counts
    match the crawl, and the file is queryable by plain DuckDB."""
    import duckdb

    from monocator_ray.crawl.driver import CrawlConfig, crawl
    from monocator_ray.sources.duck import (
        export_crawl_duckdb, export_duckdb, read_duckdb,
    )
    from monocator_ray.sources.synth import SynthSpec, write_synth_pages

    web, out = str(tmp_path / "web"), str(tmp_path / "out")
    write_synth_pages(web, 120, 6, 4, use_ray=False)
    cfg = CrawlConfig(num_shards=2, budget_per_epoch=48, max_depth=3, num_buckets=4)
    res = crawl(SynthSpec(120, 6).seeds(4), web, out, cfg)
    db = str(tmp_path / "m.duckdb")
    counts = export_crawl_duckdb(out, db)
    assert counts == {"visit_log": res.fetched, "pages": res.fetched,
                      "features": res.fetched}
    con = duckdb.connect(db, read_only=True)
    assert con.sql("SELECT COUNT(DISTINCT url) FROM pages").fetchone()[0] == res.fetched
    assert set(r[0] for r in con.sql("SHOW TABLES").fetchall()) == {
        "visit_log", "pages", "features"}
    con.close()
    assert read_duckdb(db, "features").count() == res.fetched
    # append mode stacks (same projection); replace resets
    from monocator_ray.crawl.driver import artifact_files
    from monocator_ray.report import _ARTIFACT_COLS

    files = artifact_files(out)
    cols = _ARTIFACT_COLS["visit_log"]
    assert export_duckdb(files, db, "visit_log", mode="append",
                         columns=cols) == 2 * res.fetched
    assert export_duckdb(files, db, "visit_log", columns=cols) == res.fetched
