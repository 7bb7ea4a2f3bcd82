"""Poison-row isolation (dead-letter quarantine) for batch stages — the
scale-ops layer a 100 TB pipeline needs so ONE undecodable record cannot
kill a week-long run: wrap any ``map_batches`` callable and failing
batches bisect recursively until the individually-poisoned rows are
isolated; good rows still produce their normal output, poison rows land
in a quarantine parquet directory WITH the error that killed them
(written on the worker, content-hashed shard names — the standard sink
discipline), and the pipeline keeps streaming.

Cost shape: a clean batch costs exactly one ``fn`` call (the wrapper is
free on the happy path).  A batch with k poison rows costs O(k·log2 n)
``fn`` calls (binary splitting), not O(n) — pinned by the call-count
test.  ``fn`` must be safe to re-invoke on row subsets (idempotent or
side-effect-free w.r.t. retried rows), which every pure transform in
this engine satisfies; stateful sinks should quarantine BEFORE the sink
stage instead.

Usage::

    stage = DeadLetter(decode_fn, quarantine_dir="/out/quarantine")
    ds.map_batches(stage, batch_format="pyarrow")
    # later: read_quarantine(quarantine_dir) -> (rows + error + stage) table

The quarantine table carries the ORIGINAL input row (its columns as-is)
plus ``_dl_error`` (repr of the exception) and ``_dl_stage`` — enough to
re-drive the rows through a fixed stage later, the replay path dead
letter queues exist for."""

from __future__ import annotations

import io
import os

import pyarrow as pa
import pyarrow.parquet as pq

# top-level import, NOT lazy inside the worker-side _quarantine call — a
# `from monocator_ray...` executed on a worker dies under a real foreign
# driver (tests/test_worker_imports.py rationale)
from monocator_ray.sources.csvio import _payload_key


class DeadLetter:
    """Wrap ``fn`` (Table -> Table) with bisecting poison-row isolation."""

    def __init__(self, fn, quarantine_dir: str, stage_name: str | None = None):
        self.fn = fn
        self.quarantine_dir = quarantine_dir
        self.stage_name = stage_name or getattr(
            fn, "__name__", type(fn).__name__)
        os.makedirs(quarantine_dir, exist_ok=True)

    # ---- quarantine sink (worker-side, idempotent shard names) ----
    def _quarantine(self, rows: pa.Table, errors: list[str]) -> None:
        t = rows.append_column(
            "_dl_error", pa.array(errors, pa.string())
        ).append_column(
            "_dl_stage", pa.array([self.stage_name] * rows.num_rows,
                                  pa.string())
        )
        buf = io.BytesIO()
        pq.write_table(t, buf)
        data = buf.getvalue()
        name = f"dead-{_payload_key(data):016x}-{t.num_rows}.parquet"
        tmp = os.path.join(self.quarantine_dir,
                           f".{name}.tmp-{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(self.quarantine_dir, name))

    def _run(self, batch: pa.Table, out: list, dead: list, derr: list) -> None:
        if batch.num_rows == 0:
            # a fn that raises on an EMPTY batch has no poison row to
            # quarantine — and appending one error string for zero rows
            # would crash _quarantine with an Arrow length mismatch
            return
        try:
            out.append(self.fn(batch))
        except Exception as e:  # noqa: BLE001 — the whole point
            if batch.num_rows <= 1:
                dead.append(batch)
                derr.append(repr(e))
                return
            mid = batch.num_rows // 2
            self._run(batch.slice(0, mid), out, dead, derr)
            self._run(batch.slice(mid), out, dead, derr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[pa.Table] = []
        dead: list[pa.Table] = []
        derr: list[str] = []
        self._run(batch, out, dead, derr)
        if dead:
            self._quarantine(pa.concat_tables(dead), derr)
        good = [t for t in out if t.num_rows]
        if good:
            return pa.concat_tables(good)
        if out:
            return out[0]  # keep the fn's output schema for empty results
        # every row was poison: emit an empty table with the input schema
        # only if fn never succeeded anywhere this batch — callers get the
        # fn schema from other batches; zero-column empties are dropped by
        # collect_arrow
        return pa.table({})


def read_quarantine(quarantine_dir: str) -> pa.Table:
    """All quarantined rows (original columns + _dl_error + _dl_stage)."""
    parts = sorted(
        os.path.join(quarantine_dir, n)
        for n in os.listdir(quarantine_dir)
        if n.endswith(".parquet") and not n.startswith(".")
    )
    if not parts:
        return pa.table({})
    return pa.concat_tables([pq.read_table(p) for p in parts],
                            promote_options="default")
