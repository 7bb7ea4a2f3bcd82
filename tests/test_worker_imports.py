"""Driver-equivalent worker-import guard.

The graft driver calls ``ray.init`` BEFORE importing this package, from a
script that does not live in the repo — so Ray workers have neither the
repo on ``sys.path`` nor the driver script's directory to fall back on.
``ensure_shipped`` (pickle-by-value) covers every module object referenced
by a closure/stage, but an ``import monocator_ray...`` statement EXECUTED
on a worker bypasses pickling entirely and dies with ModuleNotFoundError.
Two such latent imports shipped in round 4 (ScreenshotRenderer.__call__'s
encode_png, the event-peaks hash_partitioned key closure) and were only
caught by rehearsing from a /tmp driver script — this test makes that
rehearsal a permanent fixture for a representative query set.

Runs in a SUBPROCESS with its own Ray session (the in-process pytest
session was started from the repo cwd, which masks the bug).
"""

import os
import subprocess
import sys
import textwrap


def test_queries_run_from_foreign_driver_script(tmp_path):
    script = tmp_path / "foreign_driver.py"
    script.write_text(textwrap.dedent("""
        import sys, ray
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
        sys.path.insert(0, "/root/repo")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        import __ray_entry__ as e
        q = e.queries()
        # one representative per worker-execution shape: an actor-pool
        # binary stage (media), a cached-task stage + semi-join over crawl
        # artifacts (screenshot), a hash_partitioned key closure
        # (watermark_windows), and a groupby/aggregate relational query
        # incremental_hll_users: a sketch-ingest stage whose batch fn once
        # carried a nested `from monocator_ray...` (the third instance of
        # this bug class, caught by foreign rehearsal in round-4 session 4)
        for name in ("media_metadata", "screenshot_digests",
                     "watermark_windows", "event_stats",
                     "incremental_hll_users"):
            r = q[name]("/root/testdata/sf0.001")
            t = r.to_pandas() if hasattr(r, "to_pandas") else r
            assert len(t) > 0, name
            print("RAN", name)
        ray.shutdown()
        print("ALL-OK")
    """))
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),  # NOT the repo: workers must not inherit it
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert "ALL-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-4000:]
