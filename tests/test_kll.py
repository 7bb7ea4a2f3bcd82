"""KLL quantile sketch (state/kll.py): weight conservation, rank-error
bound, merge accuracy, serialization.  Pure numpy — no Ray session."""

import numpy as np

from monocator_ray.state.kll import KLLSketch

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_error(data: np.ndarray, est: np.ndarray, qs) -> float:
    """Distance from q to the estimated value's normalized rank INTERVAL
    [left, right] — a duplicated value legitimately covers a rank range, so
    any estimate inside it has zero rank error."""
    srt = np.sort(data)
    n = len(srt)
    worst = 0.0
    for q, e in zip(qs, est):
        lo = np.searchsorted(srt, e, side="left") / n
        hi = np.searchsorted(srt, e, side="right") / n
        err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
        worst = max(worst, err)
    return worst


def test_weight_conserved_and_exact_when_small():
    v = np.arange(100, dtype=np.float64)
    sk = KLLSketch(k=256)
    sk.add(v)
    assert sk.weight() == 100
    # below capacity nothing compacts: quantiles are exact
    assert sk.quantile(0.5) == 49.0
    assert sk.quantile(1.0) == 99.0


def test_rank_error_bound_uniform_and_skewed():
    rng = np.random.default_rng(7)
    for data in (
        rng.uniform(0, 1, 1_000_000),
        rng.zipf(1.5, 1_000_000).astype(np.float64),
    ):
        sk = KLLSketch(k=256)
        for chunk in np.array_split(data, 61):
            sk.add(chunk)
        assert sk.weight() == len(data)
        err = _rank_error(data, sk.quantiles(QS), QS)
        assert err < 0.015, err


def test_merge_matches_single_pass_accuracy():
    rng = np.random.default_rng(11)
    data = rng.lognormal(0, 2, 500_000)
    parts = np.array_split(data, 32)
    shards = []
    for p in parts:
        s = KLLSketch(k=256)
        s.add(p)
        shards.append(KLLSketch.from_bytes(s.to_bytes()))  # roundtrip too
    merged = shards[0]
    for s in shards[1:]:
        merged.merge(s)
    assert merged.weight() == len(data)
    err = _rank_error(data, merged.quantiles(QS), QS)
    assert err < 0.02, err


def test_empty_and_nan():
    sk = KLLSketch()
    assert np.isnan(sk.quantile(0.5))
    sk.add(np.array([np.nan, 1.0, np.nan]))
    assert sk.weight() == 1
    assert sk.quantile(0.5) == 1.0
