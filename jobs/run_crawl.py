"""Job ENTRYPOINT for the flagship crawl — the script `ray job submit`
runs inside the cluster (north_rule: "run via ray job submit on a
fixed-size multi-node Ray cluster").

The package arrives via the job's runtime_env (``py_modules`` — see
jobs/submit.py), NOT via the repo checkout: this script must work from an
empty working directory with only ``monocator_ray`` importable.  It
therefore never touches repo-relative paths and calls
``shipping.ensure_shipped()`` like every other public entry so worker
processes see the package regardless of how the job server staged it.

Inside a submitted job RAY_ADDRESS points at the running cluster, so the
guarded ``ray.init`` attaches rather than starting a local instance; run
standalone (no job server) it falls back to local mode — the SAME artifact
bytes either way, which jobs/submit.py and tests/test_job_packaging.py
verify by hash.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="monocator_ray crawl job")
    p.add_argument("--pages", required=True, help="page-store dir (Parquet web)")
    p.add_argument("--out", required=True, help="artifact output dir")
    p.add_argument("--seeds", default=None,
                   help="seed file (urls or domain VisitRequests); default: "
                        "synth-spec seeds (requires --synth-total/--synth-hosts)")
    p.add_argument("--synth-total", type=int, default=0,
                   help="synthetic web size (enables deterministic synth seeds)")
    p.add_argument("--synth-hosts", type=int, default=0)
    p.add_argument("--num-seeds", type=int, default=12)
    p.add_argument("--shards", type=int, default=4)
    p.add_argument("--budget", type=int, default=256)
    p.add_argument("--max-depth", type=int, default=4)
    p.add_argument("--link-cap", type=int, default=16)
    p.add_argument("--buckets", type=int, default=8)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS is the cluster; standalone it
        # is unset/local — both attach correctly through the default
        ray.init(include_dashboard=False)

    from monocator_ray.crawl.driver import CrawlConfig, crawl
    from monocator_ray.shipping import ensure_shipped

    ensure_shipped()
    robots = None
    if args.seeds:
        from monocator_ray.sources.seeds import seed_urls_from_file

        # auto-detects full-URL vs domain seed files (code-review r3 #1:
        # treating a URL line as a domain silently mangles the seed)
        seed_urls = seed_urls_from_file(args.seeds)
    elif args.synth_total and args.synth_hosts:
        from monocator_ray.sources.synth import SynthSpec
        from monocator_ray.state.robots import synth_robots

        seed_urls = SynthSpec(args.synth_total, args.synth_hosts).seeds(args.num_seeds)
        robots = synth_robots(args.synth_hosts)
    else:
        print("need --seeds or --synth-total/--synth-hosts", file=sys.stderr)
        return 2

    cfg = CrawlConfig(
        num_shards=args.shards,
        budget_per_epoch=args.budget,
        max_depth=args.max_depth,
        link_cap=args.link_cap,
        num_buckets=args.buckets,
    )
    res = crawl(seed_urls, args.pages, args.out, cfg, robots=robots,
                resume=args.resume)
    print(json.dumps({
        "fetched": res.fetched, "epochs": res.epochs, "seen": res.seen,
        "wall_s": round(res.wall_s, 2), "out": args.out,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
