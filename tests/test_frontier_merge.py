"""FrontierShard's sorted-run flush merge (state/shards.py:_pack_keys +
the searchsorted placement) must order rows EXACTLY like the old stable
lexsort of [existing; fresh-in-arrival-order] — the crawl exact-order
contract depends on it.  Property-tested with adversarial ties."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _rand_cols(rng, n, tie_heavy):
    # tiny value ranges force massive key collisions when tie_heavy
    hi_d = 2 if tie_heavy else 6
    hi_h = 3 if tie_heavy else 50
    hi_t = 3 if tie_heavy else 1000
    hi_u = 4 if tie_heavy else 10**6
    return {
        "depth": rng.integers(0, hi_d, n).astype(np.int32),
        "host_hash": rng.integers(0, hi_h, n).astype(np.uint64),
        "discovery_time": rng.integers(0, hi_t, n).astype(np.int64),
        "url_hash": rng.integers(0, hi_u, n).astype(np.uint64),
        "parent_url_hash": rng.integers(0, 10, n).astype(np.uint64),
        "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
    }


def test_pack_keys_order_equals_lexsort_order():
    from monocator_ray.state.shards import _key_order, _pack_keys

    rng = np.random.default_rng(7)
    for tie_heavy in (False, True):
        c = _rand_cols(rng, 5000, tie_heavy)
        # include sign-edge values for the signed fields
        c["depth"][0] = np.int32(0)
        c["discovery_time"][1] = np.int64(2**62)
        keys = _pack_keys(c)
        # stable argsort of packed keys == stable lexsort of the tuple key
        assert np.array_equal(np.argsort(keys, kind="stable"), _key_order(c))


@settings(max_examples=30, deadline=None)
@given(
    n_old=st.integers(0, 200),
    n_new=st.integers(0, 200),
    seed=st.integers(0, 2**31),
    tie_heavy=st.booleans(),
)
def test_flush_merge_matches_full_lexsort(n_old, n_new, seed, tie_heavy):
    from monocator_ray.state.shards import FrontierShard, _key_order, _pack_keys, _take

    rng = np.random.default_rng(seed)
    shard = FrontierShard(0, 1)
    old = _rand_cols(rng, n_old, tie_heavy)
    shard._f = _take(old, _key_order(old))
    shard._fkey = _pack_keys(shard._f)

    fresh = _rand_cols(rng, n_new, tie_heavy)
    # drive the real flush path via offer() (urls must be unseen: randomize
    # url_hash widely enough that seen-dedup keeps everything)
    fresh["url_hash"] = rng.permutation(np.arange(10**6, 10**6 + n_new)).astype(np.uint64)
    t = pa.table(
        {
            "url": fresh["url"],
            "url_hash": pa.array(fresh["url_hash"], pa.uint64()),
            "host": pa.array(["h"] * n_new, pa.string()),
            "host_hash": pa.array(fresh["host_hash"], pa.uint64()),
            "depth": pa.array(fresh["depth"], pa.int32()),
            "discovery_time": pa.array(fresh["discovery_time"], pa.int64()),
            "parent_url_hash": pa.array(fresh["parent_url_hash"], pa.uint64()),
        }
    )
    shard.offer(t)
    shard.flush_pending()

    # oracle: stable lexsort over [old-sorted; fresh-in-arrival-order]
    ref = {
        k: (
            pa.concat_arrays([_take(old, _key_order(old))[k], fresh[k]])
            if k == "url"
            else np.concatenate([_take(old, _key_order(old))[k], fresh[k]])
        )
        for k in old
    }
    want = _take(ref, _key_order(ref))
    got = shard._f
    for k in ("depth", "host_hash", "discovery_time", "url_hash", "parent_url_hash"):
        assert np.array_equal(got[k], want[k]), k
    # cached key column stays aligned with the merged rows
    assert np.array_equal(shard._fkey, _pack_keys(got))


def _offer_rows(shard, n, host_hashes=None):
    import pyarrow as pa

    hh = host_hashes if host_hashes is not None else np.arange(n, dtype=np.uint64)
    t = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
            "url_hash": pa.array(np.arange(1, n + 1, dtype=np.uint64), pa.uint64()),
            "host": pa.array(["h"] * n, pa.string()),
            "host_hash": pa.array(np.asarray(hh, dtype=np.uint64), pa.uint64()),
            "depth": pa.array(np.zeros(n, np.int32), pa.int32()),
            "discovery_time": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "parent_url_hash": pa.array(np.zeros(n, np.uint64), pa.uint64()),
        }
    )
    shard.offer(t)
    shard.flush_pending()


def test_peek_budget_zero_stages_nothing():
    """ADVICE r2 #2: budget == 0 must examine nothing — no staged rows, no
    capped-drop accounting (the old truncation branch indexed
    staged_pos[-1] and queued permanent drops the sequential walk never
    saw)."""
    from monocator_ray.state.shards import FrontierShard

    shard = FrontierShard(0, 1, max_pages_per_host=2)
    _offer_rows(shard, 8)
    staged = shard.peek(epoch=0, budget=0)
    assert staged.num_rows == 0
    assert shard.counters["capped_dropped"] == 0
    assert not shard._drop_idx
    shard.pop_upto(None)
    assert len(shard._f["depth"]) == 8  # nothing consumed or dropped


def test_peek_low_default_host_cap_matches_general_walk():
    """ADVICE r2 #1: default_host_cap below the epoch budget must leave the
    unconstrained fast path — one host offers 8 URLs, cap 3, budget 6:
    exactly 3 of that host may stage."""
    from monocator_ray.state.shards import FrontierShard

    shard = FrontierShard(0, 1, default_host_cap=3)
    _offer_rows(shard, 8, host_hashes=np.full(8, 7, dtype=np.uint64))
    staged = shard.peek(epoch=0, budget=6)
    assert staged.num_rows == 3


def test_next_ready_epoch_matches_stepping():
    """The politeness-tail jump (state/shards.py:next_ready_epoch) must
    return EXACTLY the first epoch at which stepping peek() one epoch at
    a time would stage a URL — the driver substitutes the jump for the
    steps, so an off-by-one here silently changes visit-log epoch
    values."""
    from monocator_ray.state.shards import FrontierShard

    s = FrontierShard(shard_id=0, num_shards=1, epoch_ms=1000,
                      host_delays={"slow.example": 3000})
    tbl = pa.table({
        "url": pa.array(["http://slow.example/a", "http://slow.example/b"],
                        pa.string()),
        "url_hash": pa.array([11, 12], pa.uint64()),
        "host": pa.array(["slow.example"] * 2, pa.string()),
        "host_hash": pa.array([7, 7], pa.uint64()),
        "depth": pa.array([0, 0], pa.int32()),
        "discovery_time": pa.array([0, 1], pa.int64()),
        "parent_url_hash": pa.array([0, 0], pa.uint64()),
    })
    s.offer(tbl)
    # epoch 0: fresh host starts at burst tokens -> one URL stages
    assert s.peek(0, 10).num_rows == 1
    s.pop_upto(None)  # consumes delay worth of tokens
    # epoch 1: tokens = 1000 < 3000 -> nothing stages
    assert s.peek(1, 10).num_rows == 0
    s.pop_upto(None)
    jump = s.next_ready_epoch(1)
    # stepping oracle: walk epochs until peek stages something
    e = 1
    while True:
        e += 1
        staged = s.peek(e, 10).num_rows
        s.pop_upto(None) if staged == 0 else None
        if staged:
            break
    assert jump == e, (jump, e)
    # empty frontier -> None
    s2 = FrontierShard(shard_id=0, num_shards=1)
    assert s2.next_ready_epoch(0) is None
