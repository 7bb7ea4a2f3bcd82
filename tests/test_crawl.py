"""Crawl-order + seen-set exact-match tests (SURVEY.md §5.2 item 2) and
kill/resume (item 4): the parallel engine must reproduce the sequential
spec-oracle simulator exactly, at multiple shard counts."""

import numpy as np
import pytest

from monocator_ray.crawl.driver import (
    CrawlConfig,
    crawl,
    read_seen_set,
    read_visit_log,
)
from monocator_ray.sources.synth import SynthSpec, write_synth_pages
from monocator_ray.state.robots import synth_robots
from tests.oracle.crawl_sim import SimConfig, simulate

TOTAL, HOSTS, BUCKETS = 400, 12, 4


@pytest.fixture(scope="module")
def web(tmp_path_factory):
    d = tmp_path_factory.mktemp("web")
    write_synth_pages(str(d), TOTAL, HOSTS, BUCKETS, use_ray=False)
    spec = SynthSpec(TOTAL, HOSTS)
    tbl = spec.batch(np.arange(TOTAL))
    web_dict = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    return {"dir": str(d), "dict": web_dict, "spec": spec}


def _sim(web, **kw):
    cfg = SimConfig(budget_per_epoch=64, max_depth=4, link_cap=16, **kw)
    return simulate(web["spec"].seeds(6), web["dict"], cfg, robots=synth_robots(HOSTS))


def _engine(web, out, num_shards, budget_per_epoch=64, **kw):
    cfg = CrawlConfig(
        num_shards=num_shards,
        budget_per_epoch=budget_per_epoch,
        max_depth=4,
        link_cap=16,
        num_buckets=BUCKETS,
        fetch_concurrency=2,
        extract_concurrency=2,
        **kw,
    )
    crawl(web["spec"].seeds(6), web["dir"], str(out), cfg, robots=synth_robots(HOSTS))
    return read_visit_log(str(out)), read_seen_set(str(out))


def _assert_matches(vlog, seen, sim):
    got = list(
        zip(
            vlog["seq"].to_pylist(),
            vlog["url"].to_pylist(),
            vlog["url_hash"].to_pylist(),
            vlog["depth"].to_pylist(),
            vlog["host_hash"].to_pylist(),
            vlog["discovery_time"].to_pylist(),
            vlog["fetch_status"].to_pylist(),
            vlog["epoch"].to_pylist(),
        )
    )
    want = [tuple(int(x) if not isinstance(x, str) else x for x in r) for r in sim.visit_log]
    got = [tuple(int(x) if not isinstance(x, str) else x for x in r) for r in got]
    assert len(got) == len(want), f"visit counts differ: {len(got)} vs {len(want)}"
    for g, w in zip(got, want):
        assert g == w, f"visit order diverged at seq {w[0]}:\n engine {g}\n oracle {w}"
    assert set(int(x) for x in seen) == set(sim.seen), "seen-set mismatch"


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_committed_golden(web, tmp_path):
    """Engine vs the COMMITTED golden visit log (tests/gen_crawl_golden.py)
    — catches engine+simulator drifting together."""
    import pathlib

    import pyarrow.parquet as pq

    gold_dir = pathlib.Path(__file__).parent / "fixtures" / "golden"
    golden = pq.read_table(gold_dir / "visit_log.parquet")
    vlog, seen = _engine(web, tmp_path / "golden_out", num_shards=4)
    got = vlog.select(golden.schema.names)
    assert got.equals(golden), "engine visit_log != committed golden"
    golden_seen = pq.read_table(gold_dir / "seen_set.parquet")["url_hash"].to_pylist()
    assert sorted(int(x) for x in seen) == golden_seen


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_4_shards(web, tmp_path):
    sim = _sim(web)
    vlog, seen = _engine(web, tmp_path / "out4", num_shards=4)
    _assert_matches(vlog, seen, sim)


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_1_shard_and_invariance(web, tmp_path):
    sim = _sim(web)
    vlog, seen = _engine(web, tmp_path / "out1", num_shards=1)
    _assert_matches(vlog, seen, sim)


@pytest.mark.usefixtures("ray_session")
def test_total_page_budget_exact(web, tmp_path):
    """Global fetch budget truncates the crawl identically to the oracle."""
    sim = _sim(web, total_page_budget=150)
    vlog, seen = _engine(web, tmp_path / "budget", num_shards=4, total_page_budget=150)
    _assert_matches(vlog, seen, sim)
    assert vlog.num_rows <= 150


@pytest.mark.usefixtures("ray_session")
def test_politeness_and_page_caps(web, tmp_path):
    sim = _sim(web, max_pages_per_host=3)
    vlog, seen = _engine(web, tmp_path / "outcap", num_shards=3, max_pages_per_host=3)
    _assert_matches(vlog, seen, sim)
    # the cap actually bound: no host fetched more than 3 times
    hh = vlog["host_hash"].to_pylist()
    from collections import Counter

    assert max(Counter(hh).values()) <= 3


@pytest.mark.usefixtures("ray_session")
def test_dataset_engine_identical_to_workers(web, tmp_path):
    """Both epoch engines (persistent worker pool vs per-epoch Dataset
    pipeline) must produce identical artifacts — physical execution never
    affects the visit order."""
    kw = dict(num_shards=3, inline_threshold=0, budget_per_epoch=256)
    vlog_w, seen_w = _engine(web, tmp_path / "w", **kw)
    vlog_d, seen_d = _engine(web, tmp_path / "d", epoch_engine="dataset", **kw)
    assert vlog_w.equals(vlog_d)
    assert list(seen_w) == list(seen_d)


@pytest.mark.usefixtures("ray_session")
def test_resume_identical_to_uninterrupted(web, tmp_path):
    """Kill after a few epochs, resume, artifacts identical; no re-fetching."""
    from monocator_ray.crawl.driver import CrawlDriver
    from monocator_ray.state.robots import synth_robots as sr

    cfg = CrawlConfig(
        num_shards=4, budget_per_epoch=64, max_depth=4, link_cap=16,
        num_buckets=BUCKETS, fetch_concurrency=2, extract_concurrency=2,
    )
    full_out = tmp_path / "full"
    crawl(web["spec"].seeds(6), web["dir"], str(full_out), cfg, robots=sr(HOSTS))
    full_log = read_visit_log(str(full_out))

    # interrupted run: stop after 3 epochs (simulates a killed job)
    part_out = tmp_path / "part"
    drv = CrawlDriver(web["dir"], str(part_out), cfg, robots=sr(HOSTS))
    drv.push_seeds(web["spec"].seeds(6))
    for _ in range(3):
        drv.run_epoch()
    fetched_before = drv.seq
    drv.shutdown()
    assert fetched_before < full_log.num_rows

    # resume and finish
    crawl(web["spec"].seeds(6), web["dir"], str(part_out), cfg, robots=sr(HOSTS), resume=True)
    resumed_log = read_visit_log(str(part_out))
    assert resumed_log.num_rows == full_log.num_rows
    assert resumed_log.equals(full_log), "resumed artifacts differ from uninterrupted run"
    # zero re-fetches: seq values are unique
    seqs = resumed_log["seq"].to_pylist()
    assert len(seqs) == len(set(seqs))


@pytest.mark.usefixtures("ray_session")
def test_resume_purges_uncheckpointed_epoch_artifacts(web, tmp_path):
    """Crash MID-epoch (artifacts written, no checkpoint): the crashed
    attempt's stale crawl parts must not survive the resume — they can
    duplicate seq rows because the re-run may use a different part layout
    (ADVICE r1, medium)."""
    import os

    import pyarrow.parquet as pq

    from monocator_ray.crawl.driver import CrawlDriver
    from monocator_ray.state.robots import synth_robots as sr

    cfg = CrawlConfig(
        num_shards=4, budget_per_epoch=64, max_depth=4, link_cap=16,
        num_buckets=BUCKETS, fetch_concurrency=2, extract_concurrency=2,
        checkpoint_every=2,  # bench-like: most epochs have NO checkpoint
    )
    full_out = tmp_path / "full2"
    crawl(web["spec"].seeds(6), web["dir"], str(full_out), cfg, robots=sr(HOSTS))
    full_log = read_visit_log(str(full_out))

    part_out = tmp_path / "part2"
    drv = CrawlDriver(web["dir"], str(part_out), cfg, robots=sr(HOSTS))
    drv.push_seeds(web["spec"].seeds(6))
    for _ in range(4):  # epochs 0..3; checkpoints land at 0 and 2 only
        drv.run_epoch()
    drv.shutdown()
    # epoch=3 has artifacts but no checkpoint (crash before its checkpoint);
    # plant an EXTRA stale part there, as a crashed many-worker attempt would
    edir3 = os.path.join(str(part_out), "epoch=3", "crawl")
    assert os.path.isdir(edir3) and not os.path.exists(
        os.path.join(str(part_out), "epoch=3", "_SUCCESS")
    )
    stale = pq.read_table(os.path.join(edir3, sorted(os.listdir(edir3))[0]))
    pq.write_table(stale, os.path.join(edir3, "part-zz-stale.parquet"))

    crawl(web["spec"].seeds(6), web["dir"], str(part_out), cfg, robots=sr(HOSTS), resume=True)
    resumed_log = read_visit_log(str(part_out))
    seqs = resumed_log["seq"].to_pylist()
    assert len(seqs) == len(set(seqs)), "stale parts duplicated seq rows"
    assert resumed_log.num_rows == full_log.num_rows
    assert resumed_log.equals(full_log)


def test_crawl_tiny_session_does_not_hang(tmp_path):
    """A session whose shards reserve most CPUs (8 shards x 0.25 on the
    4-cpu test session) must still schedule the worker pools instead of
    pending forever: the sizing loop shrinks to (1,1) and scales the
    per-actor CPU request to fit (review finding r2e)."""
    from monocator_ray.crawl.driver import CrawlConfig, crawl
    from monocator_ray.sources.synth import SynthSpec, write_synth_pages

    web = str(tmp_path / "web")
    write_synth_pages(web, 400, 10, 4, use_ray=False)
    spec = SynthSpec(400, 10)
    cfg = CrawlConfig(num_shards=8, budget_per_epoch=256, max_depth=3,
                      link_cap=8, num_buckets=4, inline_threshold=0,
                      fetch_concurrency=2, extract_concurrency=2)
    res = crawl(spec.seeds(6), web, str(tmp_path / "out"), cfg)
    assert res.fetched > 0


@pytest.mark.usefixtures("ray_session")
def test_low_default_host_cap_matches_oracle(web, tmp_path):
    """default_host_cap below the epoch budget leaves the peek fast path
    (ADVICE r2 #1) — engine must still match the sequential walk exactly."""
    sim = _sim(web, default_host_cap=5)
    vlog, seen = _engine(web, tmp_path / "lowcap", num_shards=3, default_host_cap=5)
    _assert_matches(vlog, seen, sim)


@pytest.mark.usefixtures("ray_session")
def test_shard_actor_death_mid_crawl_resumes_identically(web, tmp_path):
    """VERDICT r3 #3: a 100-TB cluster loses ACTORS mid-epoch, not just
    clean driver kills.  ray.kill a frontier/seen shard after epoch 2
    (checkpoints at 0 and 2), let the next epoch fail, then resume from
    the last checkpoint — artifacts must be identical to the
    uninterrupted run with zero re-fetches."""
    import ray
    from ray.exceptions import RayActorError

    from monocator_ray.crawl.driver import CrawlDriver
    from monocator_ray.state.robots import synth_robots as sr

    cfg = CrawlConfig(
        num_shards=4, budget_per_epoch=64, max_depth=4, link_cap=16,
        num_buckets=BUCKETS, fetch_concurrency=2, extract_concurrency=2,
        checkpoint_every=2,
    )
    full_out = tmp_path / "full_ad"
    crawl(web["spec"].seeds(6), web["dir"], str(full_out), cfg, robots=sr(HOSTS))
    full_log = read_visit_log(str(full_out))

    part_out = tmp_path / "part_ad"
    drv = CrawlDriver(web["dir"], str(part_out), cfg, robots=sr(HOSTS))
    drv.push_seeds(web["spec"].seeds(6))
    for _ in range(3):
        drv.run_epoch()  # epochs 0..2; checkpoints at 0 and 2
    fetched_before = drv.seq
    ray.kill(drv.shards[1], no_restart=True)  # actor death, not a clean stop
    with pytest.raises(RayActorError):
        drv.run_epoch()  # the in-flight epoch is lost with the shard
    drv.shutdown()
    assert fetched_before < full_log.num_rows

    # restart from the last checkpoint (epoch 2); the dead-shard epoch's
    # partial artifacts are purged by the resume path
    crawl(web["spec"].seeds(6), web["dir"], str(part_out), cfg,
          robots=sr(HOSTS), resume=True)
    resumed_log = read_visit_log(str(part_out))
    assert resumed_log.num_rows == full_log.num_rows
    assert resumed_log.equals(full_log), "post-actor-death artifacts differ"
    seqs = resumed_log["seq"].to_pylist()
    assert len(seqs) == len(set(seqs)), "re-fetch detected after actor death"


@pytest.mark.usefixtures("ray_session")
def test_incremental_checkpoint_chain(web, tmp_path):
    """Incremental checkpoints (round 4): the first checkpoint of every
    chain is a FULL snapshot, the next full_checkpoint_every-1 are delta
    spans (pushes/pops/dirty hosts only — O(changes), not O(state)); a
    crawl whose checkpoints are all-full and one on the default chain
    schedule produce IDENTICAL artifacts and seen sets, and mid-chain
    delta dirs are smaller on disk than full snapshots."""
    import json
    import os

    from monocator_ray.crawl.driver import checkpoint_chain

    out_chain = tmp_path / "chained"
    # gc_checkpoints=False: this test inspects the WHOLE checkpoint
    # history (mode schedule, per-span row counts); GC has its own test
    vlog_c, seen_c = _engine(web, out_chain, 4, full_checkpoint_every=3,
                             gc_checkpoints=False)
    out_full = tmp_path / "allfull"
    vlog_f, seen_f = _engine(web, out_full, 4, full_checkpoint_every=1,
                             gc_checkpoints=False)
    assert vlog_c.equals(vlog_f)
    assert np.array_equal(seen_c, seen_f)

    def _ckpts(out):
        dirs = sorted(
            (d for d in os.listdir(out) if d.startswith("epoch=")
             and os.path.isdir(os.path.join(out, d, "checkpoint"))),
            key=lambda n: int(n.split("=")[1]),
        )
        return [os.path.join(out, d, "checkpoint") for d in dirs]

    import pyarrow.parquet as pq

    def _rows(ckpt, prefix):
        return sum(
            pq.read_metadata(os.path.join(ckpt, f2)).num_rows
            for f2 in os.listdir(ckpt)
            if f2.startswith(prefix) and f2.endswith(".parquet")
        )

    ckpts = _ckpts(out_chain)
    modes = []
    for c in ckpts:
        with open(os.path.join(c, "manifest.json")) as f:
            m = json.load(f)
        modes.append(m["mode"])
        files = set(os.listdir(c))
        if m["mode"] == "full":
            assert m["base_epoch"] is None
            assert "frontier-0.parquet" in files and "seen-0.parquet" in files
            assert not any(f2.startswith(("fpush-", "fpop-")) for f2 in files)
        else:
            assert isinstance(m["base_epoch"], int)
            assert {"fpush-0.parquet", "fpop-0.parquet",
                    "seen-delta-0.parquet", "hosts-delta-0.parquet"} <= files
            assert "frontier-0.parquet" not in files
    # the schedule: full, delta, delta, full, delta, delta, ...
    assert modes[0] == "full"
    for i, m in enumerate(modes):
        assert m == ("full" if i % 3 == 0 else "delta"), (i, modes)
    assert "delta" in modes  # the crawl ran long enough to chain
    # each delta span writes strictly less seen data than the cumulative
    # set it avoids re-dumping — the row-level statement of "delta
    # checkpoints cost O(changes), not O(state)"; the conservation
    # equality at the end doubles as the disjointness proof (overlapping
    # files would make the file-row sum exceed the unique count)
    from monocator_ray.crawl.driver import checkpoint_chain as _cc

    final_chain = [os.path.join(d, "checkpoint") for d in _cc(str(out_chain))]
    cumulative = _rows(final_chain[0], "seen-")
    for c in final_chain[1:]:
        d_rows = _rows(c, "seen-delta-")
        # a full dump at this point would have written `cumulative + d_rows`
        # rows; the delta wrote d_rows
        assert d_rows < len(seen_c)
        cumulative += d_rows
    # conservation: the chain reconstructs the final seen set exactly
    assert cumulative == len(seen_c)

    # chain walk: the LAST checkpoint's restore set starts at its most
    # recent full snapshot and ends at itself
    chain = checkpoint_chain(str(out_chain))
    epochs = [int(os.path.basename(d).split("=")[1]) for d in chain]
    assert epochs == sorted(epochs)
    with open(os.path.join(chain[0], "checkpoint", "manifest.json")) as f:
        assert json.load(f)["mode"] == "full"
    with open(os.path.join(chain[-1], "checkpoint", "manifest.json")) as f:
        last_m = json.load(f)
    assert len(chain) == 1 + (0 if last_m["mode"] == "full" else epochs[-1] - epochs[0])


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_gc_keeps_only_live_chain(web, tmp_path):
    """gc_checkpoints (default on): once a new FULL snapshot commits,
    every earlier epoch's checkpoint payload + _SUCCESS marker is dropped
    (crawl artifacts stay), the surviving chain restores, and the
    artifacts equal an un-GC'd run's."""
    import os

    from monocator_ray.crawl.driver import checkpoint_chain, latest_checkpoint

    out = tmp_path / "gc"
    vlog, seen = _engine(web, out, 4, full_checkpoint_every=3)
    out_ref = tmp_path / "nogc"
    vlog_r, seen_r = _engine(web, out_ref, 4, full_checkpoint_every=3,
                             gc_checkpoints=False)
    assert vlog.equals(vlog_r) and np.array_equal(seen, seen_r)

    epochs_with_ckpt = sorted(
        int(n.split("=")[1]) for n in os.listdir(out)
        if n.startswith("epoch=") and os.path.isdir(os.path.join(out, n, "checkpoint"))
    )
    chain = checkpoint_chain(str(out))
    chain_epochs = sorted(int(os.path.basename(d).split("=")[1]) for d in chain)
    # everything surviving IS the live chain — nothing older kept
    assert epochs_with_ckpt == chain_epochs
    ref_epochs = sorted(
        int(n.split("=")[1]) for n in os.listdir(out_ref)
        if n.startswith("epoch=") and os.path.isdir(os.path.join(out_ref, n, "checkpoint"))
    )
    assert len(ref_epochs) > len(chain_epochs)  # GC actually dropped history
    # crawl ARTIFACTS of GC'd epochs survive
    for e in set(ref_epochs) - set(chain_epochs):
        d = os.path.join(out, f"epoch={e}")
        if os.path.isdir(d):
            assert not os.path.exists(os.path.join(d, "_SUCCESS"))
            assert not os.path.isdir(os.path.join(d, "checkpoint"))
    # the survivor chain is the restore set: resume from it reproduces
    # the uninterrupted artifacts (crash everything after the last ckpt)
    last = latest_checkpoint(str(out))
    last_epoch = int(os.path.basename(last).split("=")[1])
    for n in list(os.listdir(out)):
        if n.startswith("epoch=") and int(n.split("=")[1]) > last_epoch:
            import shutil as _sh

            _sh.rmtree(os.path.join(out, n))
    cfg = CrawlConfig(num_shards=4, budget_per_epoch=64, max_depth=4,
                      link_cap=16, num_buckets=BUCKETS, fetch_concurrency=2,
                      extract_concurrency=2, full_checkpoint_every=3)
    from monocator_ray.state.robots import synth_robots as sr

    crawl(web["spec"].seeds(6), web["dir"], str(out), cfg, robots=sr(HOSTS),
          resume=True)
    assert read_visit_log(str(out)).equals(vlog_r)


@pytest.mark.usefixtures("ray_session")
def test_resume_resharded_4x_and_down(web, tmp_path):
    """Reshard on resume (the north rule's N -> 4N move): a crawl
    checkpointed at 2 shards resumes at 8 (4x upscale), and one
    checkpointed at 8 resumes at 2 (4x downscale) — both finish with
    artifacts IDENTICAL to an uninterrupted run and zero re-fetches
    (the visit order is shard-count-invariant by construction, so the
    mid-crawl switch must be invisible)."""
    import os

    from monocator_ray.crawl.driver import CrawlDriver
    from monocator_ray.state.robots import synth_robots as sr

    def cfg(n):
        return CrawlConfig(
            num_shards=n, budget_per_epoch=64, max_depth=4, link_cap=16,
            num_buckets=BUCKETS, fetch_concurrency=2, extract_concurrency=2,
        )

    full_out = tmp_path / "ref"
    crawl(web["spec"].seeds(6), web["dir"], str(full_out), cfg(4), robots=sr(HOSTS))
    full_log = read_visit_log(str(full_out))
    full_seen = read_seen_set(str(full_out))

    for old_n, new_n, tag in ((2, 8, "up"), (8, 2, "down")):
        out = tmp_path / f"reshard_{tag}"
        drv = CrawlDriver(web["dir"], str(out), cfg(old_n), robots=sr(HOSTS))
        drv.push_seeds(web["spec"].seeds(6))
        for _ in range(3):
            drv.run_epoch()
        assert drv.seq < full_log.num_rows
        drv.shutdown()
        crawl(web["spec"].seeds(6), web["dir"], str(out), cfg(new_n),
              robots=sr(HOSTS), resume=True)
        log = read_visit_log(str(out))
        # shard_id is h % num_shards AT FETCH TIME — it legitimately
        # changes across the reshard; everything observable (order, urls,
        # depths, epochs, statuses) must not
        cols = [c for c in full_log.column_names if c != "shard_id"]
        assert log.select(cols).equals(full_log.select(cols)), \
            f"reshard {old_n}->{new_n} diverged"
        assert np.array_equal(read_seen_set(str(out)), full_seen)
        seqs = log["seq"].to_pylist()
        assert len(seqs) == len(set(seqs)), "re-fetch after reshard"
        # the post-reshard chain restarted FULL at the new count
        import json as _json

        from monocator_ray.crawl.driver import checkpoint_chain

        chain = checkpoint_chain(str(out))
        with open(os.path.join(chain[0], "checkpoint", "manifest.json")) as f:
            m = _json.load(f)
        assert m["num_shards"] == new_n


@pytest.mark.usefixtures("ray_session")
def test_fetcher_actor_death_mid_crawl_resumes_identically(web, tmp_path):
    """VERDICT r4 #7: kill a FETCH EpochWorker mid-crawl (shard death is
    already covered).  The in-flight epoch fails, resume from the last
    checkpoint must reproduce the uninterrupted artifacts exactly."""
    import ray
    from ray.exceptions import RayActorError

    from monocator_ray.crawl.driver import CrawlDriver
    from monocator_ray.state.robots import synth_robots as sr

    cfg = CrawlConfig(
        num_shards=4, budget_per_epoch=64, max_depth=4, link_cap=16,
        num_buckets=BUCKETS, fetch_concurrency=2, extract_concurrency=2,
        checkpoint_every=2, inline_threshold=0,
    )
    full_out = tmp_path / "full_fw"
    crawl(web["spec"].seeds(6), web["dir"], str(full_out), cfg, robots=sr(HOSTS))
    full_log = read_visit_log(str(full_out))

    part_out = tmp_path / "part_fw"
    drv = CrawlDriver(web["dir"], str(part_out), cfg, robots=sr(HOSTS))
    drv.push_seeds(web["spec"].seeds(6))
    for _ in range(3):
        drv.run_epoch()  # epochs 0..2; checkpoints at 0 and 2
    assert drv._fetchers, "worker pool must exist for this test"
    ray.kill(drv._fetchers[0], no_restart=True)
    with pytest.raises(RayActorError):
        drv.run_epoch()
    drv.shutdown()

    crawl(web["spec"].seeds(6), web["dir"], str(part_out), cfg,
          robots=sr(HOSTS), resume=True)
    resumed_log = read_visit_log(str(part_out))
    assert resumed_log.num_rows == full_log.num_rows
    assert resumed_log.equals(full_log), "post-fetcher-death artifacts differ"
    seqs = resumed_log["seq"].to_pylist()
    assert len(seqs) == len(set(seqs))


@pytest.mark.usefixtures("ray_session")
def test_extractor_death_with_unflushed_writes_resumes_identically(web, tmp_path):
    """VERDICT r4 #7 (writer case): extractors write artifact parts on a
    background thread, flushed only before a checkpoint's _SUCCESS.  Kill
    an extractor right after an UN-checkpointed epoch — its queued writes
    may be lost — and prove the _SUCCESS/manifest discipline recovers:
    resume purges the un-checkpointed epoch and reproduces the
    uninterrupted run bit-for-bit."""
    import ray
    from ray.exceptions import RayActorError

    from monocator_ray.crawl.driver import CrawlDriver
    from monocator_ray.state.robots import synth_robots as sr

    cfg = CrawlConfig(
        num_shards=4, budget_per_epoch=64, max_depth=4, link_cap=16,
        num_buckets=BUCKETS, fetch_concurrency=2, extract_concurrency=2,
        checkpoint_every=2, inline_threshold=0,
    )
    full_out = tmp_path / "full_ew"
    crawl(web["spec"].seeds(6), web["dir"], str(full_out), cfg, robots=sr(HOSTS))
    full_log = read_visit_log(str(full_out))

    part_out = tmp_path / "part_ew"
    drv = CrawlDriver(web["dir"], str(part_out), cfg, robots=sr(HOSTS))
    drv.push_seeds(web["spec"].seeds(6))
    for _ in range(4):
        drv.run_epoch()  # epochs 0..3; checkpoints at 0 and 2; 3 is NOT
    assert drv._workers, "extract pool must exist for this test"
    # epoch 3's parts may still sit in the dead actor's write queue
    ray.kill(drv._workers[0], no_restart=True)
    with pytest.raises(RayActorError):
        drv.run_epoch()
    drv.shutdown()

    crawl(web["spec"].seeds(6), web["dir"], str(part_out), cfg,
          robots=sr(HOSTS), resume=True)
    resumed_log = read_visit_log(str(part_out))
    assert resumed_log.num_rows == full_log.num_rows
    assert resumed_log.equals(full_log), "post-extractor-death artifacts differ"
    seqs = resumed_log["seq"].to_pylist()
    assert len(seqs) == len(set(seqs))


@pytest.mark.usefixtures("ray_session")
def test_async_frontier_same_fetched_set_as_bsp(web, tmp_path):
    """VERDICT r4 #2: bounded-staleness frontier mode.  Visit ORDER is
    relaxed (epoch/seq differ), but with no page caps and a non-binding
    max_depth the fetched-page SET and the seen set must equal BSP's —
    reachability is order-independent then.  Politeness delays stay on
    (synth_robots) and are enforced at pop time in both modes."""
    cfg_kw = dict(
        num_shards=3, budget_per_epoch=64, max_depth=8, link_cap=16,
        num_buckets=BUCKETS, fetch_concurrency=2, extract_concurrency=2,
        checkpoint_every=2, inline_threshold=0,
    )
    bsp_out = tmp_path / "bsp"
    cfg = CrawlConfig(**cfg_kw)
    res_bsp = crawl(web["spec"].seeds(6), web["dir"], str(bsp_out), cfg,
                    robots=synth_robots(HOSTS))
    bsp_log = read_visit_log(str(bsp_out))
    bsp_seen = set(int(x) for x in read_seen_set(str(bsp_out)))

    async_out = tmp_path / "async"
    cfg_a = CrawlConfig(**cfg_kw, async_rounds=3)
    res_a = crawl(web["spec"].seeds(6), web["dir"], str(async_out), cfg_a,
                  robots=synth_robots(HOSTS))
    a_log = read_visit_log(str(async_out))

    assert res_a.fetched == res_bsp.fetched
    assert set(a_log["url"].to_pylist()) == set(bsp_log["url"].to_pylist())
    assert set(int(x) for x in read_seen_set(str(async_out))) == bsp_seen
    # every URL fetched exactly once (seen-set discipline holds async too)
    seqs = a_log["seq"].to_pylist()
    assert len(seqs) == len(set(seqs)) == a_log.num_rows
    urls = a_log["url"].to_pylist()
    assert len(urls) == len(set(urls))


@pytest.mark.usefixtures("ray_session")
def test_async_crawl_kill_resume_preserves_set(web, tmp_path):
    """Async-mode crash consistency: checkpoints quiesce (drain all
    in-flight rounds) before committing, so killing a shard mid-async-run
    and resuming must still produce the full BSP fetched SET with no URL
    fetched twice."""
    import ray
    from ray.exceptions import RayActorError

    from monocator_ray.crawl.driver import CrawlDriver
    from monocator_ray.state.robots import synth_robots as sr

    cfg_kw = dict(
        num_shards=4, budget_per_epoch=64, max_depth=8, link_cap=16,
        num_buckets=BUCKETS, fetch_concurrency=2, extract_concurrency=2,
        checkpoint_every=2, inline_threshold=0,
    )
    full = tmp_path / "bsp_ref"
    crawl(web["spec"].seeds(6), web["dir"], str(full), CrawlConfig(**cfg_kw),
          robots=sr(HOSTS))
    want_urls = set(read_visit_log(str(full))["url"].to_pylist())

    cfg_a = CrawlConfig(**cfg_kw, async_rounds=2)
    part = tmp_path / "async_part"
    drv = CrawlDriver(web["dir"], str(part), cfg_a, robots=sr(HOSTS))
    drv.push_seeds(web["spec"].seeds(6))
    # drive the async loop a few rounds via a budget-bounded run
    drv.cfg.max_epochs = 4
    try:
        drv.run()
    finally:
        drv.cfg.max_epochs = 10_000
    assert drv.seq < len(want_urls)
    ray.kill(drv.shards[2], no_restart=True)
    with pytest.raises(RayActorError):
        drv.run()
    drv.shutdown()

    crawl(web["spec"].seeds(6), web["dir"], str(part), cfg_a,
          robots=sr(HOSTS), resume=True)
    log = read_visit_log(str(part))
    urls = log["url"].to_pylist()
    assert set(urls) == want_urls
    assert len(urls) == len(set(urls)), "URL fetched twice across resume"
    seqs = log["seq"].to_pylist()
    assert len(seqs) == len(set(seqs))
