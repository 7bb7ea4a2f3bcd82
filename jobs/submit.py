"""Submit the flagship crawl as a Ray JOB (north_rule run mode: `ray job
submit` on a fixed-size multi-node cluster).

Packages ``monocator_ray`` with the job via ``runtime_env.py_modules`` —
the cluster needs no repo checkout; the job server ships the package to
every node — and runs jobs/run_crawl.py as the entrypoint.  Usage:

    python jobs/submit.py --address http://<head>:8265 \
        --pages /data/web --out /data/crawl_out --seeds seeds.txt [--wait]

This sandbox runs Ray dashboard-less (no job server), so the submission
path here is exercised two ways instead (tests/test_job_packaging.py):
the entrypoint runs from an EMPTY working directory with only a staged
copy of the package importable — exactly what the job server's
runtime_env staging produces — and its artifacts are hash-compared
against an in-process crawl of the same web.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_runtime_env() -> dict:
    """runtime_env shipping the package by path (py_modules uploads the
    directory to GCS and prepends it to every worker's sys.path)."""
    import monocator_ray

    pkg_dir = os.path.dirname(os.path.abspath(monocator_ray.__file__))
    return {"py_modules": [pkg_dir]}


def entrypoint_for(args: argparse.Namespace) -> str:
    ep = (
        f"python run_crawl.py --pages {args.pages} --out {args.out} "
        f"--shards {args.shards} --budget {args.budget}"
    )
    if args.seeds:
        ep += f" --seeds {args.seeds}"
    if args.synth_total:
        ep += f" --synth-total {args.synth_total} --synth-hosts {args.synth_hosts}"
    if args.resume:
        ep += " --resume"
    return ep


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="submit the crawl as a Ray job")
    p.add_argument("--address", default="http://127.0.0.1:8265",
                   help="job server address (head node dashboard)")
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--seeds", default=None)
    p.add_argument("--synth-total", type=int, default=0)
    p.add_argument("--synth-hosts", type=int, default=0)
    p.add_argument("--shards", type=int, default=4)
    p.add_argument("--budget", type=int, default=256)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--wait", action="store_true", help="block until terminal state")
    args = p.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ray.job_submission import JobStatus, JobSubmissionClient

    client = JobSubmissionClient(args.address)
    job_id = client.submit_job(
        entrypoint=entrypoint_for(args),
        runtime_env={
            **build_runtime_env(),
            # the entrypoint script itself ships as the job's working dir
            "working_dir": os.path.dirname(os.path.abspath(__file__)),
        },
    )
    print(f"submitted {job_id}")
    if args.wait:
        while True:
            status = client.get_job_status(job_id)
            if status in (JobStatus.SUCCEEDED, JobStatus.FAILED, JobStatus.STOPPED):
                print(client.get_job_logs(job_id))
                print(f"job {job_id}: {status}")
                return 0 if status == JobStatus.SUCCEEDED else 1
            time.sleep(2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
