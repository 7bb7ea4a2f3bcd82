"""`ray job submit` packaging (north_rule run mode; VERDICT r2 #5).

The sandbox has no job server (dashboard off), so the test exercises what
submission actually relies on: the entrypoint (jobs/run_crawl.py) runs in
a subprocess from an EMPTY working directory where the ONLY importable
copy of ``monocator_ray`` is a staged snapshot — the exact filesystem
shape runtime_env ``py_modules`` staging produces on a worker node — and
its artifacts must be byte-identical to an in-process crawl of the same
web (determinism contract: physical execution never affects artifacts)."""

import json
import os
import shutil
import subprocess
import sys

import pytest


@pytest.mark.usefixtures("ray_session")
def test_job_entrypoint_matches_in_process(tmp_path):
    import monocator_ray
    from monocator_ray.crawl.driver import CrawlConfig, crawl, read_visit_log
    from monocator_ray.sources.synth import SynthSpec, write_synth_pages
    from monocator_ray.state.robots import synth_robots

    total, hosts, buckets = 300, 10, 4
    web = tmp_path / "web"
    write_synth_pages(str(web), total, hosts, buckets, use_ray=False)

    # in-process reference run
    out_ref = tmp_path / "out_ref"
    cfg = CrawlConfig(num_shards=4, budget_per_epoch=256, max_depth=4,
                      link_cap=16, num_buckets=buckets,
                      fetch_concurrency=2, extract_concurrency=2)
    crawl(SynthSpec(total, hosts).seeds(12), str(web), str(out_ref), cfg,
          robots=synth_robots(hosts))

    # staged runtime_env shape: package snapshot importable, nothing else
    staging = tmp_path / "staging"
    pkg_src = os.path.dirname(os.path.abspath(monocator_ray.__file__))
    shutil.copytree(pkg_src, staging / "monocator_ray",
                    ignore=shutil.ignore_patterns("__pycache__"))
    workdir = tmp_path / "jobwd"  # the job's working_dir: entrypoint only
    workdir.mkdir()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.copy(os.path.join(repo, "jobs", "run_crawl.py"), workdir)

    out_job = tmp_path / "out_job"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = str(staging)
    proc = subprocess.run(
        [sys.executable, "run_crawl.py", "--pages", str(web),
         "--out", str(out_job), "--synth-total", str(total),
         "--synth-hosts", str(hosts), "--shards", "4", "--budget", "256",
         "--buckets", str(buckets)],
        cwd=str(workdir), env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["fetched"] > 0

    vref, vjob = read_visit_log(str(out_ref)), read_visit_log(str(out_job))
    assert vref.equals(vjob), "job-run visit_log differs from in-process run"
