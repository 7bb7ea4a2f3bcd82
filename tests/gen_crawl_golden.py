"""Generate the committed crawl-order golden (FIXTURES.md F5).

Runs the sequential spec-oracle simulator over the deterministic F5 graph
(seed=42 synth web: 400 pages, 12 hosts, politeness + robots) and writes
``tests/fixtures/golden/visit_log.parquet``.  Run manually, review the diff,
commit — the engine test then checks against the FILE, so engine and
simulator cannot silently drift together.
"""

import pathlib
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from monocator_ray.sources.synth import SynthSpec  # noqa: E402
from monocator_ray.state.robots import synth_robots  # noqa: E402
from tests.oracle.crawl_sim import SimConfig, simulate  # noqa: E402

TOTAL, HOSTS = 400, 12


def main() -> None:
    spec = SynthSpec(TOTAL, HOSTS)
    tbl = spec.batch(np.arange(TOTAL))
    web = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    cfg = SimConfig(budget_per_epoch=64, max_depth=4, link_cap=16)
    res = simulate(spec.seeds(6), web, cfg, robots=synth_robots(HOSTS))
    out = pa.table(
        {
            "seq": pa.array([r[0] for r in res.visit_log], pa.int64()),
            "url": pa.array([r[1] for r in res.visit_log], pa.string()),
            "url_hash": pa.array([r[2] for r in res.visit_log], pa.uint64()),
            "depth": pa.array([r[3] for r in res.visit_log], pa.int32()),
            "host_hash": pa.array([r[4] for r in res.visit_log], pa.uint64()),
            "discovery_time": pa.array([r[5] for r in res.visit_log], pa.int64()),
            "fetch_status": pa.array([r[6] for r in res.visit_log], pa.int32()),
            "epoch": pa.array([r[7] for r in res.visit_log], pa.int32()),
        }
    )
    dest = pathlib.Path(__file__).parent / "fixtures" / "golden" / "visit_log.parquet"
    pq.write_table(out, dest)
    seen = pa.table({"url_hash": pa.array(sorted(res.seen), pa.uint64())})
    pq.write_table(seen, dest.parent / "seen_set.parquet")
    print(f"visits={out.num_rows} seen={seen.num_rows} -> {dest}")


if __name__ == "__main__":
    main()
