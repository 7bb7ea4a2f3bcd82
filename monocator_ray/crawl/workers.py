"""Persistent epoch-worker pool (SURVEY.md §4.2 "batch-internal async
fan-out" / actor-pool reuse).

``map_batches`` actor pools are torn down after every Dataset execution, so a
per-epoch pipeline pays actor spawn + cold bucket caches every epoch — the
dominant cost once extraction is vectorized (~0.3 ms/page).  ``EpochWorker``
is the same fetch->extract->write->explode chain as the Dataset path
(_process_distributed), held in actors created ONCE per crawl: bucket caches
stay warm across epochs (the virtual-thread/connection-pool analog of the
reference, /root/reference/pom.xml:22-23).

Determinism: workers receive contiguous host-sorted chunks and write
deterministic part file names; link tables are concatenated in chunk order —
physical placement never affects the visit order (keys decide everything).
"""

from __future__ import annotations

import os
import queue
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq

from monocator_ray.stages.extract import ExtractStage, explode_links
from monocator_ray.stages.fetch import SyntheticFetcher
from monocator_ray.stages.filters import LinkFilter, first_wins_dedup


class EpochWorker:
    """One long-lived worker: fused fetch+extract+write+links per chunk.

    Artifact parquet writes run on a background thread (bounded queue, so a
    slow disk backpressures extraction rather than buffering unboundedly):
    the epoch barrier only needs the LINK path (offers to the frontier
    shards), so writes overlap the next epoch's fetch/extract.  Durability
    discipline: the driver awaits :meth:`flush_writes` on every worker
    BEFORE committing a checkpoint ``_SUCCESS`` marker — a crash loses only
    writes of epochs whose checkpoint never committed, which resume purges
    anyway.  Phase wall-times accumulate per worker; the driver drains them
    via :meth:`take_phase_stats` into the per-epoch lineage artifact."""

    def __init__(
        self,
        pages_dir: str,
        num_buckets: int,
        link_cap: int,
        with_vat: bool,
        max_depth: int,
        blacklist: frozenset,
        robots_rules: dict | None,
        max_cached_buckets: int = 16,
        shards: list | None = None,
        async_writes: bool = True,
        rg_cache_mb: int = 1536,
    ):
        self.fetch = SyntheticFetcher(pages_dir, num_buckets, max_cached_buckets,
                                      rg_cache_bytes=rg_cache_mb << 20)
        self.extract = ExtractStage(link_cap, with_vat)
        self.link_filter = LinkFilter(max_depth, blacklist, robots_rules)
        self.shards = shards or []
        self._phase = {"fetch_s": 0.0, "extract_s": 0.0, "write_s": 0.0,
                       "link_s": 0.0}
        self._wq: queue.Queue | None = None
        self._werr: list[BaseException] = []
        if async_writes:
            self._wq = queue.Queue(maxsize=4)
            t = threading.Thread(target=self._write_loop, daemon=True)
            t.start()

    # ---- background writer ----
    def _write_loop(self) -> None:
        while True:
            item = self._wq.get()
            try:
                if item is not None:
                    full, out_file = item
                    t0 = time.monotonic()
                    self._write_part(full, out_file)
                    self._phase["write_s"] += time.monotonic() - t0
            except BaseException as e:  # noqa: BLE001 — surfaced at flush
                self._werr.append(e)
            finally:
                self._wq.task_done()

    @staticmethod
    def _write_part(full: pa.Table, out_file: str) -> None:
        os.makedirs(os.path.dirname(out_file), exist_ok=True)
        tmp = os.path.join(os.path.dirname(out_file),
                           f".{os.path.basename(out_file)}.tmp-{os.getpid()}")
        pq.write_table(full, tmp)
        os.replace(tmp, out_file)

    def flush_writes(self) -> None:
        """Block until every enqueued artifact write is durable; re-raise
        the first writer-thread error (the checkpoint must not commit over
        a failed write)."""
        if self._wq is not None:
            self._wq.join()
        if self._werr:
            raise self._werr[0]

    def take_phase_stats(self) -> dict:
        """Accumulated per-phase wall seconds since the last call (drained)."""
        out = dict(self._phase)
        for k in self._phase:
            self._phase[k] = 0.0
        return out

    def fetch_chunk(self, chunk: pa.Table) -> pa.Table:
        """IO phase only — called on the chunk's bucket OWNER so each store
        row group is decoded once per crawl (cached).  The result rides the
        object store to whichever worker extracts it."""
        import os as _os

        t0 = time.monotonic()
        out = self.fetch(chunk)
        self._phase["fetch_s"] += time.monotonic() - t0
        if _os.environ.get("MONOCATOR_TRACE_WORKER"):
            print(f"[wf] n={chunk.num_rows} fetch={time.monotonic() - t0:.2f}")
        return out

    def process_chunk(self, chunk: pa.Table, out_file: str) -> tuple[pa.Table, int]:
        """Fused fetch+extract+write+offer in ONE task — the async-frontier
        mode's unit of work (crawl/driver.py _run_async): no fetch->extract
        handoff, so a round's chunks are independent tasks the driver can
        leave in flight across rounds."""
        return self.extract_write(self.fetch_chunk(chunk), out_file)

    def extract_write(self, fetched: pa.Table, out_file: str) -> tuple[pa.Table, int]:
        """CPU phase — round-robin across the pool (balanced regardless of
        which owner fetched)."""
        import os as _os

        t0 = time.monotonic()
        full = self.extract(fetched)
        t1 = time.monotonic()
        self._phase["extract_s"] += t1 - t0
        if self._wq is not None:
            self._wq.put((full, out_file))  # bounded: blocks when disk lags
        else:
            self._write_part(full, out_file)
            self._phase["write_s"] += time.monotonic() - t1
        t2 = time.monotonic()
        import numpy as np
        import pyarrow.compute as pc

        errors = int(pc.sum(pc.not_equal(full["fetch_status"], 200)).as_py() or 0)
        links = self.link_filter(explode_links(full.select(["links", "seq", "depth", "url_hash"])))
        offer_refs = []
        if links.num_rows and self.shards:
            # offer straight to the frontier shards (fire-and-forget; the
            # driver awaits the acks at the epoch barrier) — the shards'
            # pending buffers make concurrent, unordered offers deterministic
            links = first_wins_dedup(links)  # local dedup: less RPC traffic
            hh = links["host_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            sid = (hh % np.uint64(len(self.shards))).astype(np.int64)
            for s in np.unique(sid):
                offer_refs.append(self.shards[int(s)].offer.remote(links.filter(pa.array(sid == s))))
            links = None
        self._phase["link_s"] += time.monotonic() - t2
        if _os.environ.get("MONOCATOR_TRACE_WORKER"):
            print(f"[we] n={fetched.num_rows} extract={t1 - t0:.2f} rest={time.monotonic() - t1:.2f}")
        return (links, errors) if not offer_refs else (offer_refs, errors)

