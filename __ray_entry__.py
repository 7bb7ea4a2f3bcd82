"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline (SURVEY.md §3.1) over a small
deterministic synthetic web (the SPEC input shape — no external data) and
smoke-reads the sf0.001 driver tables.  ``queries()``/``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 plus the training-data ops; the
driver compares each against DuckDB at sf=0.01.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: deterministic synthetic web -> epoch crawl -> visit_log
    joined artifact.  Also touches /root/testdata/sf0.001 as a read smoke."""
    import pyarrow.parquet as pq  # noqa: F401

    from monocator_ray.crawl.driver import CrawlConfig, crawl, read_visit_log
    from monocator_ray.shipping import ensure_shipped
    from monocator_ray.sources.synth import SynthSpec, write_synth_pages
    from monocator_ray.state.robots import synth_robots

    ensure_shipped()
    web_dir = "/tmp/monocator_entry_web"
    out_dir = "/tmp/monocator_entry_out"
    total, hosts, buckets = 800, 24, 8
    if not os.path.isdir(web_dir):
        write_synth_pages(web_dir, total, hosts, buckets, use_ray=False)
    spec = SynthSpec(total, hosts)
    cfg = CrawlConfig(
        num_shards=4,
        budget_per_epoch=256,
        max_depth=4,
        link_cap=16,
        num_buckets=buckets,
        fetch_concurrency=2,
        extract_concurrency=2,
    )
    crawl(spec.seeds(12), web_dir, out_dir, cfg, robots=synth_robots(hosts))
    # smoke-read a driver table too (proves testdata path works)
    _ = pq.read_table("/root/testdata/sf0.001/region.parquet").num_rows
    return read_visit_log(out_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from monocator_ray.pipelines.registry import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from monocator_ray.pipelines.registry import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
