"""DuckDB persistence (S3 companion) — the reference's own result store:
monocator persists visit results to DuckDB (evidenced at
/root/reference/.gitignore:40 ``*.duckdb`` + ``data/``; SURVEY.md §0), one
table per entity.  Here DuckDB is the SERVING/catalog layer on top of the
distributed parquet artifacts, which is the only shape that scales:

* the crawl's combined parquet shards stay the distributed artifact (workers
  wrote them; they shard across a cluster);
* ``export_duckdb`` ingests them into a ``.duckdb`` file with ONE driver-side
  ``CREATE TABLE ... AS SELECT ... FROM read_parquet([...])`` — DuckDB's own
  parallel C++ reader does the scan, no Python row movement;
* a ``.duckdb`` file is a single-machine artifact by nature — the export is
  for the analyst/serving hand-off, never a mid-pipeline store.

``export_crawl_duckdb`` mirrors the reference's per-entity layout: tables
``pages``, ``features``, ``visit_log`` from one crawl out dir.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data as rd


def export_duckdb(parquet_files: list[str], db_path: str, table: str,
                  columns: list[str] | None = None, mode: str = "replace") -> int:
    """Ingest parquet shards into ``db_path`` as ``table``; returns the row
    count.  ``mode``: replace (default) or append."""
    import duckdb

    if not parquet_files:
        raise ValueError("no parquet files to export")

    def ident(name: str) -> str:
        # double-quote escaping for identifiers; paths go through parameter
        # binding below, never string interpolation (a quote in a path or
        # table name must not splice the statement — code-review
        # r3-closing-2 finding #10)
        return '"' + name.replace('"', '""') + '"'

    con = duckdb.connect(db_path)
    try:
        proj = ", ".join(ident(c) for c in columns) if columns else "*"
        src = "read_parquet(?)"
        if mode == "replace":
            con.execute(
                f"CREATE OR REPLACE TABLE {ident(table)} AS SELECT {proj} FROM {src}",
                [list(parquet_files)],
            )
        elif mode == "append":
            con.execute(f"INSERT INTO {ident(table)} SELECT {proj} FROM {src}",
                        [list(parquet_files)])
        else:
            raise ValueError(f"unknown mode {mode!r}")
        (n,) = con.execute(f"SELECT COUNT(*) FROM {ident(table)}").fetchone()
        return int(n)
    finally:
        con.close()


def export_dataset_duckdb(ds: rd.Dataset, db_path: str, table: str,
                          tmp_dir: str | None = None) -> int:
    """Dataset -> DuckDB table, via a worker-written parquet staging dir
    (the distributed half) + one driver-side ingest (the serving half)."""
    import shutil
    import tempfile

    staging = tmp_dir or tempfile.mkdtemp(prefix="monocator_duck_")
    try:
        ds.write_parquet(staging)
        files = [os.path.join(staging, f) for f in sorted(os.listdir(staging))
                 if f.endswith(".parquet")]
        return export_duckdb(files, db_path, table)
    finally:
        if tmp_dir is None:
            shutil.rmtree(staging, ignore_errors=True)


def export_crawl_duckdb(out_dir: str, db_path: str) -> dict[str, int]:
    """Crawl artifacts -> the reference's per-entity DuckDB tables
    (pages / features / visit_log as column projections of the combined
    epoch shards).  Returns table -> row count."""
    from monocator_ray.crawl.driver import artifact_files
    from monocator_ray.report import _ARTIFACT_COLS

    files = artifact_files(out_dir)
    out = {}
    for table, cols in _ARTIFACT_COLS.items():
        out[table] = export_duckdb(files, db_path, table, columns=cols)
    return out


def read_duckdb(db_path: str, table: str) -> rd.Dataset:
    """DuckDB table -> Dataset.  The read is driver-side by design (a
    .duckdb file lives on one machine); the resulting Dataset distributes
    the downstream pipeline.  For big data keep parquet as the source of
    truth and read that instead."""
    import duckdb

    con = duckdb.connect(db_path, read_only=True)
    try:
        safe = '"' + table.replace('"', '""') + '"'
        tbl = con.execute(f"SELECT * FROM {safe}").arrow()
    finally:
        con.close()
    if isinstance(tbl, pa.RecordBatchReader):  # duckdb>=1.0 returns a reader
        tbl = tbl.read_all()
    return rd.from_arrow(tbl)
