"""Swinging-door compression: error-bound contract, step-simulation
parity, endpoints, duplicate timestamps."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from aisdb_ray.stages import sdt


def _step_sim(t, v, E):
    """Point-by-point replica of the recursive-CTE semantics."""
    n = len(t)
    kept = {int(t[0]), int(t[-1])}
    ta, va = t[0], v[0]
    dh, dl = -np.inf, np.inf
    for i in range(1, n):
        nh = max(dh, (v[i] - va - E) / float(t[i] - ta))
        nl = min(dl, (v[i] - va + E) / float(t[i] - ta))
        if nh > nl:
            ta, va = t[i - 1], v[i - 1]
            kept.add(int(t[i - 1]))
            dh = (v[i] - va - E) / float(t[i] - ta)
            dl = (v[i] - va + E) / float(t[i] - ta)
        else:
            dh, dl = nh, nl
    return sorted(kept)


def test_sdt_mask_matches_step_simulation():
    rng = np.random.default_rng(3)
    for trial in range(20):
        n = int(rng.integers(2, 400))
        t = np.cumsum(rng.integers(1, 100, n)).astype(np.int64)
        v = np.cumsum(rng.integers(-50, 51, n)).astype(np.int64) + 1000
        for E in (8, 64):
            m = sdt.sdt_keep_mask(t, v, E)
            assert sorted(set(t[m].tolist())) == _step_sim(t, v, E), (trial, E)


def test_sdt_error_bound_on_reconstruction():
    rng = np.random.default_rng(7)
    n = 2000
    t = np.cumsum(rng.integers(1, 30, n)).astype(np.int64)
    v = (1000 + 500 * np.sin(np.arange(n) / 40)
         + rng.integers(-20, 21, n)).astype(np.int64)
    E = 64
    m = sdt.sdt_keep_mask(t, v, E)
    kt, kv = t[m], v[m]
    # linear reconstruction of every dropped point stays within ~E
    pos = np.searchsorted(kt, t, side="right") - 1
    pos = np.clip(pos, 0, len(kt) - 2)
    recon = kv[pos] + (kv[pos + 1] - kv[pos]) * (t - kt[pos]) / (
        kt[pos + 1] - kt[pos])
    err = np.abs(recon - v)
    assert err.max() <= 2 * E  # the door guarantee (±E pivots both ends)
    assert m.sum() < n / 4  # and it actually compresses smooth data


def test_sdt_endpoints_and_tiny_segments():
    t = np.array([10], np.int64)
    v = np.array([5], np.int64)
    assert sdt.sdt_keep_mask(t, v, 64).tolist() == [True]
    t2 = np.array([10, 20], np.int64)
    v2 = np.array([5, 9000], np.int64)
    assert sdt.sdt_keep_mask(t2, v2, 64).tolist() == [True, True]


def test_swing_door_dataset_dedups_times():
    df = pd.DataFrame({
        "source": ["s"] * 6,
        "seg": np.zeros(6, np.int64),
        "time": np.array([0, 0, 10, 20, 30, 40], np.int64),  # dup t=0
        "seq": np.arange(6, dtype=np.int64),
        "n_tok": np.array([100, 999, 100, 100, 100, 100], np.int64),
    })
    out = sdt.swing_door(rd.from_pandas(df), E=64).to_pandas()
    out = out.sort_values("time")
    # first row at t=0 wins (n_tok=100); straight line -> only endpoints
    assert out["time"].tolist() == [0, 40]
    assert out["n_tok"].tolist() == [100, 100]


def test_sdt_negative_tolerance_raises_not_hangs():
    import numpy as np
    import pytest

    from aisdb_ray.stages.sdt import sdt_keep_mask

    with pytest.raises(ValueError, match="E must be"):
        sdt_keep_mask(np.arange(5, dtype=np.int64),
                      np.arange(5, dtype=np.int64), -1)
