"""Property pins for the round-4 session-4 query kernels: the closed-form
reset-at-zero ledger, the funnel's masked segmented mins, and the rolling
z-score window — each against a direct per-row reference implementation.
The SQL oracles pin end-to-end equality on the driver tables; these pin
the KERNEL algebra on adversarial random inputs (many tiny runs, ties,
negative bursts) that the generated data may never produce."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _closed_form_balance(keys: np.ndarray, deltas: np.ndarray) -> np.ndarray:
    """The q_part_stock_floor kernel on (sorted-by-key) inputs."""
    from monocator_ray.stages.grouped import run_boundaries

    starts, ends = run_boundaries(keys)
    run_idx = np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)
    cs = np.cumsum(deltas)
    base = np.concatenate([[0], cs[ends[:-1] - 1]]) if len(starts) else cs[:0]
    cum = cs - base[run_idx]
    OFF = np.int64(1) << 40
    off = (np.int64(len(starts)) - run_idx) * OFF
    cmin = np.minimum.accumulate(cum + off) - off
    return cum - np.minimum(cmin, 0)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 4), st.integers(-50, 50)),
                min_size=1, max_size=200))
def test_reset_at_zero_ledger_matches_recurrence(rows):
    rows.sort(key=lambda r: r[0])  # contiguous key runs, like the partition
    keys = np.array([r[0] for r in rows], np.int64)
    deltas = np.array([r[1] for r in rows], np.int64)
    got = _closed_form_balance(keys, deltas)
    # direct recurrence per key run
    bal = {}
    want = []
    for k, d in rows:
        bal[k] = max(0, bal.get(k, 0) + d)
        want.append(bal[k])
    assert got.tolist() == want


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),      # user
                          st.integers(0, 50),     # ts
                          st.sampled_from(["view", "click", "purchase", "x"])),
                min_size=1, max_size=120))
def test_funnel_segmented_mins_match_bruteforce(events):
    uid = np.array([e[0] for e in events], np.int64)
    ts = np.array([e[1] for e in events], np.int64)
    et = np.array([e[2] for e in events], dtype=object)
    SENT = np.iinfo(np.int64).max
    uniq, idx = np.unique(uid, return_inverse=True)
    n = len(uniq)

    def seg_min(mask, after):
        out = np.full(n, SENT, np.int64)
        m = mask if after is None else (mask & (ts > after[idx]))
        np.minimum.at(out, idx[m], ts[m])
        return out

    t1 = seg_min(et == "view", None)
    t2 = seg_min(et == "click", t1)
    t3 = seg_min(et == "purchase", t2)

    # brute force per user
    for ui, u in enumerate(uniq):
        evs = sorted([(t, y) for (x, t, y) in events if x == u])
        bt1 = min((t for t, y in evs if y == "view"), default=None)
        bt2 = min((t for t, y in evs if y == "click"
                   and bt1 is not None and t > bt1), default=None)
        bt3 = min((t for t, y in evs if y == "purchase"
                   and bt2 is not None and t > bt2), default=None)
        assert (None if t1[ui] == SENT else t1[ui]) == bt1
        assert (None if t2[ui] == SENT else t2[ui]) == bt2
        assert (None if t3[ui] == SENT else t3[ui]) == bt3


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=5, max_size=80))
def test_rolling_zscore_inequality_matches_float(vals):
    """The integer inequality (5v-sum)^2 > 3*(5ssq-sum^2) is exactly
    z^2 > 3 for the trailing-5 window (including degenerate zero-variance
    windows, where both sides are 0 and nothing flags)."""
    v = np.array(vals, np.int64)
    for i in range(4, len(v)):
        w = v[i - 4:i + 1]
        s, q = int(w.sum()), int((w * w).sum())
        lhs = (5 * int(v[i]) - s) ** 2
        rhs = 3 * (5 * q - s * s)
        var = q / 5 - (s / 5) ** 2
        if var > 0:
            z2 = (int(v[i]) - s / 5) ** 2 / var
            assert (lhs > rhs) == (z2 > 3 + 1e-12) or abs(z2 - 3) < 1e-9
        else:
            assert lhs == 0 and rhs == 0
