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
